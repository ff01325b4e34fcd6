"""§2.5 coverage: unique-id suffixing, annotation spans, is_pii_value,
day-partitioned writes."""

import glob

from pyspark.sql import functions as F

from sumi_agent_spark.functions.oracle import (
    Detection,
    annotation_spans,
    detect_all,
    ensure_unique_detection_ids,
    is_pii_value,
)
from sumi_agent_spark.sources.sinks import write_scrubbed


def det(id_, value, type_="email", category="contact", enabled=True):
    return Detection(id_, type_, "t", category, value, "regex", 0.9, enabled)


def test_ensure_unique_detection_ids():
    dets = [det("a", "x@y.zz"), det("a", "q@w.ee"), det("b", "r@t.uu"),
            det("a", "s@d.ff")]
    out = ensure_unique_detection_ids(dets)
    assert [d.id for d in out] == ["a", "a__1", "b", "a__2"]


def test_annotation_spans_greedy_non_overlapping():
    text = "連絡先：tanaka@example.com と予備 tanaka@example.com"
    dets = detect_all(text)
    spans = annotation_spans(text, dets)
    assert len(spans) == 2  # both occurrences
    for s, e, t, en in spans:
        assert text[s:e] == "tanaka@example.com" and t == "email" and en
    # overlapping values: longer wins at the same start
    text2 = "東京都渋谷区神宮前3-14-5"
    dets2 = [det("1", "東京都渋谷区神宮前3-14-5", "address", "address"),
             det("2", "東京都渋谷区", "address", "address")]
    spans2 = annotation_spans(text2, dets2)
    assert spans2 == [(0, len(text2), "address", True)]


def test_annotation_spans_full_tie_keeps_detection_order():
    # reference buildAnnotations resolves full ties by stable sort order
    # (first-listed detection wins), with NO enabled-priority
    text = "ABCDEF"
    dets = [det("1", "ABC", enabled=False), det("2", "ABC", enabled=True)]
    spans = annotation_spans(text, dets)
    assert spans == [(0, 3, "email", False)]


def test_annotation_spans_non_overlapping_occurrences():
    # reference steps the search index by the value length (:749), so
    # overlapping self-occurrences are never collected
    dets = [det("1", "aa", enabled=True)]
    assert annotation_spans("aaaa", dets) == [(0, 2, "email", True),
                                              (2, 4, "email", True)]
    dets2 = [det("1", "ba"), det("2", "aa")]
    # 'aa' in "baaa" yields only (1,3) under length stepping, which the
    # greedy pass drops against 'ba'(0,2) -- the old overlapping search
    # wrongly also emitted (2,4)
    assert annotation_spans("baaa", dets2) == [(0, 2, "email", True)]


def test_is_pii_value():
    assert is_pii_value("[氏名非公開]")
    assert is_pii_value("[メール非公開] [電話番号非公開]")
    assert not is_pii_value("田中 [氏名非公開]")
    assert not is_pii_value("")
    assert not is_pii_value("普通のテキスト")
    # exact reference regex semantics (RedactPro.tsx:3076): any bracketed
    # token CONTAINING 非公開 counts; brackets without it do not
    assert is_pii_value("[当日非公開扱い]")
    assert not is_pii_value("[顔写真削除]")
    assert not is_pii_value("[Name Redacted]")


def test_partitioned_write(spark, tmp_path):
    from sumi_agent_spark.plans.pipeline import scrub_transcripts
    from sumi_agent_spark.sources.transcripts import generate_transcripts

    pdf = generate_transcripts(n_convs=6, avg_turns=8, seed=21)
    scrubbed = scrub_transcripts(spark.createDataFrame(pdf))
    write_scrubbed(scrubbed, str(tmp_path / "p"), partition_by_day=True)
    parts = glob.glob(str(tmp_path / "p" / "ts_date=*"))
    assert len(parts) >= 1
    # partition pruning reaches the scan
    back = spark.read.parquet(str(tmp_path / "p"))
    one_day = sorted(p.split("=")[-1] for p in parts)[0]
    plan = (back.filter(F.col("ts_date") == one_day)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [isnotnull(ts_date" in plan
