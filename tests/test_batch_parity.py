"""Batch-screened detection must be byte-identical to the per-row oracle."""

import json
from pathlib import Path

from sumi_agent_spark.functions.batch_detect import detect_all_batch
from sumi_agent_spark.functions.oracle import detect_all
from sumi_agent_spark.sources.transcripts import generate_transcripts

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "reference_golden.json").read_text())


def test_batch_equals_per_row_on_fixture():
    pdf = generate_transcripts(n_convs=40, avg_turns=15, seed=13)
    texts = pdf["text"].tolist()
    batch = detect_all_batch(texts)
    for t, got in zip(texts, batch):
        assert got == detect_all(t)


def test_batch_equals_per_row_on_rich_variants():
    pdf = generate_transcripts(n_convs=40, avg_turns=15, seed=13,
                               variant_level=2)
    texts = pdf["text"].tolist()
    batch = detect_all_batch(texts)
    for t, got in zip(texts, batch):
        assert got == detect_all(t)
    # the rich variants must actually appear
    joined = "\n".join(texts)
    assert "ツイッター：" in joined and "部長" in joined
    assert "０" in joined or "１" in joined  # fullwidth digits present


def test_batch_equals_per_row_on_golden_corpus():
    texts = [c["text"] for c in GOLDEN["cases"]]
    year = GOLDEN["current_year"]
    batch = detect_all_batch(texts, current_year=year)
    for t, got in zip(texts, batch):
        assert got == detect_all(t, current_year=year)


def test_batch_boundary_bridging():
    # adversarial: rows that would merge if the separator were bridgeable
    texts = [
        "氏名：",            # label at row end; next row starts with kanji
        "田中 太郎です",
        "連絡先は 090",      # digits split across rows
        "1234-5678 です",
        "https://example",   # URL split across rows
        ".com/path ページ",
        "〒150",             # postal split
        "-0001 渋谷区",
        "",                  # empties at boundaries
        "Twitter:",
        "@user123",
    ]
    batch = detect_all_batch(texts)
    for t, got in zip(texts, batch):
        assert got == detect_all(t), t


def test_batch_custom_keywords():
    texts = ["ABC社の田中です", "無関係", "ABC社より"]
    batch = detect_all_batch(texts, custom_keywords=["ABC社"])
    for t, got in zip(texts, batch):
        assert got == detect_all(t, custom_keywords=["ABC社"])


def test_batch_windowed_screen_edges():
    """Adversarial spacing around the windowed-scan margins: markers at
    window boundaries, dense digit runs, long prefixes before literals."""
    pad = "あ" * 16  # exactly _WIN_LEFT
    wide = "い" * 96  # exactly _WIN_RIGHT
    texts = [
        pad + "〒123-4567" + wide,                        # postal at margins
        "1" * 30 + " " + "090-1234-5678",                 # adjacent runs merge
        "平成 3 年 4 月 5 日" + wide + "令和2年3月4日",    # two dated spans
        wide + "GitHub: octocat-dev",                     # literal deep in row
        "x" * 200,                                        # screen char, no match
        "東京都千代田区1-2-3 マンション501",               # address + digits
        "digits 1234 5678 9012 then far away " + "あ" * 200 + " 111-2222",
        "",
    ]
    batch = detect_all_batch(texts)
    for t, got in zip(texts, batch):
        assert got == detect_all(t), t[:40]


def test_batch_parity_property_random_texts():
    """Hypothesis: batch screening equals per-row detection on arbitrary
    mixes of PII-ish fragments, digits, markers, and separator shrapnel."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from([
        "〒123-4567", "090-1234-5678", "2020年4月1日", "平成3年4月5日",
        "1234 5678 9012", "taro@example.com", "東京都千代田区1-2-3",
        "田中", "太郎", "ツイッター：@ta_ro", "GitHub: octo-cat",
        "氏名：山田 花子", "フリガナ：ヤマダ ハナコ", "、", "\n", "。",
        "これは普通の日本語の文です", "plain english words here",
        "12345678901234567890", "あ" * 17, "x" * 97, " ", "：", "〒",
        "2020年4月 - 2024年3月",  # year-range FP trap
    ])
    texts_strategy = st.lists(
        st.lists(frag, min_size=0, max_size=8).map("".join),
        min_size=1, max_size=6)

    @settings(max_examples=60, deadline=None)
    @given(texts_strategy)
    def check(texts):
        batch = detect_all_batch(texts)
        for t, got in zip(texts, batch):
            assert got == detect_all(t)

    check()


def test_batch_parity_review_regressions():
    """Cases that broke the (removed) margin-window screening: unbounded
    right extents, \\s* gaps to labels, and lowercase length drift."""
    cases = [
        ["連絡先: user@" + "a" * 120 + ".com です"],     # long email domain
        ["GitHub:" + "\n" * 100 + "@octocat"],            # \s* gap to handle
        ["氏名：" + "\n" * 100 + "山田 太郎"],            # \s* gap to label
        ["İ" * 20 + " plain row",                         # lower() grows 20ch
         "later row taro@example.jp here"],
        ["東京都" + "x" * 30 + "丁目"],                   # address, no digits
    ]
    for texts in cases:
        batch = detect_all_batch(texts)
        for t, got in zip(texts, batch):
            assert got == detect_all(t), t[:40]
