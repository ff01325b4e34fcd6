"""Quality-filter tests: langid, perplexity, heuristic keep/drop rules.

Fixture content mix per FIXTURES.md §1.5 (quality-drop turns) and the
reference's sparse-page / mojibake analogs (RedactPro.tsx:1102-1118)."""

import numpy as np
import pandas as pd

from sumi_agent_spark.functions.quality import (
    DEFAULT_QUALITY_CONFIG,
    QualityConfig,
    quality_frame,
)

JA = "本日の会議では新しい機能の実装方針について話し合い、来週までに設計書を作成することになりました。"
EN = ("We discussed the implementation plan for the new feature today and "
      "agreed to prepare the design document by next week.")
FR = ("nous avons discute du plan de mise en oeuvre de la nouvelle "
      "fonctionnalite aujourd'hui et avons convenu de preparer le document")


def qf(texts, roles=None, cfg=DEFAULT_QUALITY_CONFIG):
    return quality_frame(pd.Series(texts),
                         pd.Series(roles) if roles is not None else None, cfg)


def test_langid_ja_en_other():
    out = qf([JA, EN, FR])
    assert list(out["lang"]) == ["ja", "en", "other"]


def test_keep_clean_turns():
    out = qf([JA, EN])
    assert out["keep"].all()
    assert list(out["drop_reason"]) == ["", ""]


def test_drop_other_language():
    out = qf([FR])
    assert not out["keep"][0]
    assert out["drop_reason"][0] == "lang"


def test_drop_empty_and_whitespace():
    out = qf(["", "   \n\t  "])
    assert list(out["drop_reason"]) == ["too_short", "too_short"]


def test_drop_short_fragment():
    out = qf(["短い断片です。", "ok then"])
    assert list(out["drop_reason"]) == ["too_short", "too_short"]


def test_drop_mojibake_replacement_char():
    out = qf([JA[:20] + "��" + JA[20:]])
    assert out["drop_reason"][0] == "mojibake"


def test_drop_mojibake_latin1():
    garbled = "ã\x81\x93ã\x82\x93ã\x81«ã\x81¡ã\x81¯ä¸\x96ç\x95\x8cã\x81®çã ã±ã²ã³"
    out = qf([garbled])
    assert out["drop_reason"][0] in ("mojibake", "lang")
    assert not out["keep"][0]


def test_drop_repetition():
    spam = "買って買って買って" * 20
    out = qf([spam])
    assert out["drop_reason"][0] == "repetition"


def test_drop_symbol_heavy():
    out = qf(["!!!###$$$%%%^^^&&&***((()))!!!###$$$%%%^^^ ok"])
    assert out["drop_reason"][0] in ("symbol_ratio", "lang")
    assert not out["keep"][0]


def test_drop_gibberish_perplexity():
    # shuffled English chars: right alphabet, wrong statistics
    rng = np.random.RandomState(7)
    chars = list(EN.replace(" ", ""))
    rng.shuffle(chars)
    gib = "".join(chars[:40]) + " " + "".join(chars[40:80])
    out = qf([gib])
    assert not out["keep"][0]


def test_tool_role_exempt_from_lang_symbol_ppl_gates():
    payload = '{"a": [[1, 2], [3, 4]], "b": {"c": 9}, "d": [[5, 6], [7, 8]], "e": {"f": 0}}'
    out_tool = qf([payload], roles=["tool"])
    out_user = qf([payload], roles=["user"])
    assert out_tool["keep"][0]
    assert not out_user["keep"][0]  # symbol-heavy for a human turn
    json_en = '{"rows_scanned": 31485, "elapsed_ms": 34, "cache_hit": true, "x": 1}'
    out = qf([json_en, json_en], roles=["tool", "assistant"])
    assert out["drop_reason"][0] == ""  # exempt from perplexity gate too


def test_scores_are_deterministic():
    a = qf([JA, EN, FR, "", "xyz"])
    b = qf([JA, EN, FR, "", "xyz"])
    pd.testing.assert_frame_equal(a, b)


def test_empty_batch():
    out = quality_frame(pd.Series([], dtype=str))
    assert len(out) == 0


def test_batch_ending_with_empty_rows():
    # regression: an empty string as the batch's LAST row used to index one
    # past the bigram-NLL array in the segment-sum
    out = qf([JA, "", EN, "", ""])
    assert list(out["drop_reason"]) == ["", "too_short", "", "too_short",
                                        "too_short"]
    # same texts, different order -> same per-text scores
    out2 = qf(["", "", JA, "", EN])
    assert out["nll"][0] == out2["nll"][2]
    assert out["nll"][2] == out2["nll"][4]


def test_config_thresholds_respected():
    cfg = QualityConfig(min_chars=5)
    out = qf(["短い断片ですが十分です", "tiny"], cfg=cfg)
    assert out["keep"][0]
    assert out["drop_reason"][1] == "too_short"


def test_zh_guard():
    zh = ("数据处理系统需要仔细考虑分区和洗牌行为的规模问题这是一个用于测试中文"
          "文本识别的长句子包含很多汉字但是完全没有假名字符所以不是日语文本")
    ja_kanji_fragment = "配送先住所：東京都渋谷区神宮前3-14-5"
    out = qf([zh, ja_kanji_fragment, JA])
    assert out["lang"][0] == "other"   # long kana-less kanji text -> not ja
    assert out["lang"][1] == "ja"      # short kanji-only fragment stays ja
    assert out["lang"][2] == "ja"
    assert not out["keep"][0]


def test_nll_sane_range():
    out = qf([JA, EN])
    assert (out["nll"] > 0.5).all() and (out["nll"] < 6.0).all()


def test_distinct_trigram_ratio_batch_independent():
    """Rows with no trigrams must score ratio 1.0 regardless of what else
    shares the Arrow batch (determinism under repartitioning)."""
    import pandas as pd

    from sumi_agent_spark.functions.quality import quality_frame

    alone = quality_frame(pd.Series(["", "あ", "ab"]))
    mixed = quality_frame(pd.Series(["", "あ", "ab",
                                     "a much longer text with trigrams"]))
    for i in range(3):
        assert alone["distinct_trigram_ratio"].iloc[i] == 1.0
        assert mixed["distinct_trigram_ratio"].iloc[i] == 1.0


def test_nll_batch_independent_under_lowercase_fallback():
    """A sibling row whose .lower() changes length (e.g. U+0130) must not
    change any OTHER row's nll: the lowercase fallback is per row, never
    per batch (partition-invariant output)."""
    import pandas as pd

    from sumi_agent_spark.functions.quality import quality_frame

    row = "The Quick Brown Fox Jumps Over The Lazy Dog And Runs Far Away"
    weird = "İ" * 10 + " the and of to is in that for it was"
    alone = quality_frame(pd.Series([row]))
    w_alone = quality_frame(pd.Series([weird]))
    batched = quality_frame(pd.Series([row, weird]))
    assert alone["nll"].iloc[0] == batched["nll"].iloc[0]
    assert w_alone["nll"].iloc[0] == batched["nll"].iloc[1]
    assert alone["lang"].iloc[0] == batched["lang"].iloc[0] == "en"
