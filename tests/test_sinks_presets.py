"""Export sinks, mask presets, and hypothesis property tests."""

import glob

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sumi_agent_spark.functions.oracle import scrub_text
from sumi_agent_spark.functions.rules import MASK_PRESETS, PLACEHOLDER_RE, REGEX_RULES
from sumi_agent_spark.sources.sinks import (
    pipe_lines_to_cells,
    strip_page_markers,
    write_scrubbed,
)


def test_strip_page_markers(spark):
    text = "--- Page 1 ---\nhello\n---- Sheet: 集計 ----\nworld\n-- notes --\nkeep"
    df = spark.createDataFrame([(text,)], ["masked_text"])
    out = df.select(strip_page_markers(F.col("masked_text")).alias("t")).first()["t"]
    assert out == "hello\nworld\n-- notes --\nkeep"


def test_pipe_lines_to_cells(spark):
    text = "社員番号 | 氏名 | 部署\n001 | [氏名非公開] | 開発部\nfooter note"
    df = spark.createDataFrame([(1, text)], ["doc_id", "masked_text"])
    out = pipe_lines_to_cells(df).toPandas()
    assert out["is_tabular"].all()
    rows = [list(c) for c in out["cells"]]
    assert ["社員番号", "氏名", "部署"] in rows
    assert ["001", "[氏名非公開]", "開発部"] in rows
    # reference pads non-pipe rows to the header width, line in column 0
    assert ["footer note", "", ""] in rows
    # JS-trim semantics: fullwidth-space padding trims away
    df2 = spark.createDataFrame(
        [(2, "a | b\n\u3000note\u3000\nc | d")], ["doc_id", "masked_text"])
    rows2 = [list(c) for c in pipe_lines_to_cells(df2).toPandas()["cells"]]
    assert ["note", ""] in rows2


def test_write_scrubbed_csv_json(spark, tmp_path):
    from sumi_agent_spark.plans.pipeline import scrub_transcripts
    from sumi_agent_spark.sources.transcripts import generate_transcripts

    pdf = generate_transcripts(n_convs=4, avg_turns=5, seed=5)
    scrubbed = scrub_transcripts(spark.createDataFrame(pdf))
    write_scrubbed(scrubbed, str(tmp_path / "csv"), fmt="csv")
    got = pd.concat(map(pd.read_csv, glob.glob(str(tmp_path / "csv" / "*.csv"))))
    assert len(got) == len(pdf)
    assert "text" not in got.columns and "masked_text" in got.columns
    write_scrubbed(scrubbed, str(tmp_path / "json"), fmt="json")
    jf = glob.glob(str(tmp_path / "json" / "*.json"))
    assert jf


def test_mask_presets_semantics():
    text = ("氏名：田中 太郎\nメール：t@example.com\n"
            "住所：東京都渋谷区神宮前3-14-5 メゾンド原宿 402号室\n"
            "URL: https://example.com/profile")
    basic, _ = scrub_text(text, mask_config=MASK_PRESETS["basic"]["mask"],
                          keep_prefecture=MASK_PRESETS["basic"]["keep_prefecture"])
    strict, _ = scrub_text(text, mask_config=MASK_PRESETS["strict"]["mask"],
                           keep_prefecture=MASK_PRESETS["strict"]["keep_prefecture"])
    # basic: names/contact masked, address + url untouched
    assert "[氏名非公開]" in basic and "[メール非公開]" in basic
    assert "渋谷区" in basic and "https://example.com/profile" in basic
    # strict: everything masked, no prefecture kept
    assert "[住所非公開]" in strict and "東京都[" not in strict
    assert "[URL非公開]" in strict


# ─── property-based invariants (hypothesis) ───

pii_snippets = st.sampled_from([
    "連絡先: tanaka@example.com", "電話：090-1234-5678",
    "〒150-0001 東京都渋谷区神宮前3-14-5", "氏名：佐藤 花子",
    "GitHub: octocat-dev", "2020年4月 - 2024年3月", "作成日：2024年12月1日",
    "", "ただのテキストです。", "plain english text",
])
random_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=200)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(pii_snippets, random_text), min_size=0, max_size=6))
def test_scrub_never_leaks_raw_email(parts):
    text = "\n".join(parts)
    masked, dets = scrub_text(text)
    email_rule = REGEX_RULES[0].regex
    for d in dets:
        if d.type == "email" and d.enabled and len(d.value) >= 2:
            assert d.value not in masked


@settings(max_examples=150, deadline=None)
@given(random_text)
def test_scrub_total_and_deterministic(text):
    m1, d1 = scrub_text(text)
    m2, d2 = scrub_text(text)
    assert m1 == m2 and d1 == d2
    # no detections => text unchanged
    if not [d for d in d1 if d.enabled and len(d.value) >= 2]:
        assert m1 == text


@settings(max_examples=100, deadline=None)
@given(st.lists(pii_snippets, min_size=1, max_size=5))
def test_masked_value_never_survives(parts):
    text = "\n".join(parts)
    masked, dets = scrub_text(text)
    for d in dets:
        if d.enabled and len(d.value) >= 2:
            # the detected value itself must be gone unless it is a
            # substring of a longer value that was replaced first, or of a
            # placeholder/replacement artifact
            if d.value in masked:
                assert any(d.value in o.value and o.value != d.value
                           for o in dets if o.enabled) or \
                    PLACEHOLDER_RE.search(masked)
