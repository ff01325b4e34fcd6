"""AI-enrichment stage: reference-parity unit tests + Spark round-trip.

Reference semantics under test: parseAIDetectionJson
(/root/reference/src/app/RedactPro.tsx:492-503), detectWithAI item
validation / existence check / shared-counter ids (:540-580), fallback
(:605-635), and mergeDetections base-wins (:655-663).  The caller is a
deterministic fake -- the default pipeline path stays network-free.
"""

import json

import pytest

from sumi_agent_spark.functions.ai_detect import (
    ai_items_to_detections,
    detect_with_ai,
    parse_ai_detection_json,
)
from sumi_agent_spark.functions.oracle import detect_all, merge_detections


def test_parse_ai_detection_json_shapes():
    assert parse_ai_detection_json(None) == (False, "empty")
    assert parse_ai_detection_json("") == (False, "empty")
    assert parse_ai_detection_json("no array here") == (False, "no_json")
    assert parse_ai_detection_json("x [1, 2,") == (False, "no_json")
    assert parse_ai_detection_json('[{"broken": }]') == (False, "json_parse")
    ok, items = parse_ai_detection_json('noise {"a": [1]} noise')
    assert (ok, items) == (True, [1])  # first [...] span, like the reference
    ok, items = parse_ai_detection_json(
        'preamble\n[{"type":"person_name","value":"佐藤"}]\ntrailer')
    assert ok and items == [{"type": "person_name", "value": "佐藤"}]


def test_ai_items_validation_and_ids():
    text = "担当は佐藤です。SNSは @yama_dev です。田中は欠席。"
    items = [
        "not a dict",
        {"type": "person_name", "value": "佐"},            # len < 2
        {"type": "person_name", "value": 42},              # non-str value
        {"type": 7, "value": "佐藤"},                      # non-str type
        {"type": "person_name", "value": "佐藤"},
        {"type": "person_name", "value": "佐藤"},          # in-response dup
        {"type": "sns_account", "value": "@yama_dev"},
        {"type": "person_name", "value": "存在しない名"},  # fails existence
        {"type": "unknown_kind", "value": "佐藤"},         # unknown type
        {"type": "person_name", "value": "田中"},
    ]
    dets = ai_items_to_detections(items, text)
    assert [(d.id, d.type, d.value) for d in dets] == [
        ("ai_0", "name_ai", "佐藤"),
        ("ai_sns_1", "sns_ai", "@yama_dev"),   # shared counter: 1, not 0
        ("ai_2", "name_ai", "田中"),
    ]
    assert dets[0].confidence == 0.95 and dets[1].confidence == 0.9
    assert all(d.source == "ai" and d.enabled for d in dets)


def test_detect_with_ai_truncation_and_fallback():
    long_text = "x" * 9000 + "佐藤"  # value only exists past the 8k cut
    seen = {}

    def caller(t):
        seen["len"] = len(t)
        return json.dumps([{"type": "person_name", "value": "佐藤"}])

    dets, err = detect_with_ai(long_text, caller)
    assert seen["len"] == 8000           # prompt sees the truncation...
    assert err is None
    assert [d.value for d in dets] == ["佐藤"]  # ...existence uses full text

    def broken(t):
        raise RuntimeError("timeout")

    def fallback(t):
        return '[{"type":"sns_account","value":"@ok"}]'

    dets, err = detect_with_ai("id: @ok", broken, fallback)
    assert err is None and [d.type for d in dets] == ["sns_ai"]
    dets, err = detect_with_ai("id: @ok", broken, broken)
    assert dets == [] and "ai_failed" in err
    dets, err = detect_with_ai("id: @ok", broken)
    assert dets == [] and "ai_failed" in err


def test_merge_base_wins_over_ai():
    text = "氏名：田中 太郎\nメール：taro@example.com"
    base = detect_all(text)
    base_names = [d for d in base if d.category == "name"]
    assert base_names, "fixture text must produce a base name detection"
    ai = ai_items_to_detections(
        [{"type": "person_name", "value": base_names[0].value},
         {"type": "sns_account", "value": "@taro"}],
        text + " @taro")
    merged = merge_detections(base, ai)
    # the duplicate name kept the base detection (id/type unchanged)...
    kept = [d for d in merged if d.value == base_names[0].value]
    assert len(kept) == 1 and kept[0].source != "ai"
    # ...and the genuinely-new AI detection was appended
    assert any(d.type == "sns_ai" for d in merged)


def test_scrub_udf_ai_round_trip(spark):
    from pyspark.sql import functions as F

    from sumi_agent_spark.functions.udfs import make_scrub_udf

    def _fake_ai_caller(t):
        # nested so cloudpickle ships it by value to executors:
        # deterministic fake that "detects" a handle the regex/dict engine
        # does not know, plus a name the base engine already finds
        import json as _json
        out = []
        if "@neko_dev9" in t:
            out.append({"type": "sns_account", "value": "@neko_dev9"})
        if "田中 太郎" in t:
            out.append({"type": "person_name", "value": "田中 太郎"})
        return _json.dumps(out, ensure_ascii=False)

    rows = [("氏名：田中 太郎\n連絡は @neko_dev9 まで",),
            ("PIIなしのプレーンな本文です",)]
    df = spark.createDataFrame(rows, ["text"])

    base = df.select(make_scrub_udf()(F.col("text")).alias("s")).collect()
    ai = df.select(make_scrub_udf(ai_caller=_fake_ai_caller)(F.col("text"))
                   .alias("s")).collect()

    # default path: no AI detections, SNS handle untouched
    assert base[0]["s"]["n_ai"] == 0
    assert "@neko_dev9" in base[0]["s"]["masked_text"]
    # AI path: handle masked with the reference placeholder; the name the
    # base engine already found is NOT double-counted (base-wins dedup)
    assert ai[0]["s"]["n_ai"] == 1
    assert "[SNS非公開]" in ai[0]["s"]["masked_text"]
    assert "@neko_dev9" not in ai[0]["s"]["masked_text"]
    assert ai[0]["s"]["n_detections"] == base[0]["s"]["n_detections"] + 1
    # non-PII row: byte-identical to the deterministic path
    assert ai[1]["s"]["masked_text"] == base[1]["s"]["masked_text"]
    assert ai[1]["s"]["n_ai"] == 0


def test_pipeline_ai_off_is_byte_identical(spark):
    """ai_caller=None must not change a single output byte vs the default."""
    from sumi_agent_spark.plans.pipeline import scrub_transcripts
    from sumi_agent_spark.sources.transcripts import generate_transcripts

    pdf = generate_transcripts(8, 6, seed=7)
    df = spark.createDataFrame(pdf)
    a = scrub_transcripts(df).orderBy("conv_id", "turn_idx").collect()
    b = scrub_transcripts(df, ai_caller=None).orderBy(
        "conv_id", "turn_idx").collect()
    assert a == b
    assert all(r["n_ai"] == 0 for r in a)
