"""Hashed-NB quality classifier: training, scoring, persistence,
determinism, and plan shape."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sumi_agent_spark.operators.quality_classifier import (
    DEFAULT_ALPHA,
    bucket_col,
    feature_col,
    fit_quality_classifier,
    quality_score_expr,
    read_quality_model,
    score_quality_classifier,
    token_col,
    write_quality_model,
)

POS_TEXTS = [
    "the committee published a detailed report on regional water policy",
    "researchers measured the thermal conductivity of the alloy sample",
    "the archive preserves correspondence from the early modern period",
    "a peer reviewed study examined migration patterns of coastal birds",
    "the library catalog records provenance for every acquired manuscript",
    "engineers documented the bridge inspection with annotated diagrams",
]
NEG_TEXTS = [
    "click here buy now best price free shipping limited offer",
    "win win win jackpot casino bonus claim your prize now now",
    "cheap pills cheap pills discount discount subscribe subscribe",
    "follow like share follow like share viral viral trending",
    "download free download free crack keygen serial download",
    "hot singles near you click click click amazing deal wow",
]


def _fit(spark, ngram=1, dim=512, normalize=True):
    pos = spark.createDataFrame([(t,) for t in POS_TEXTS], ["text"])
    neg = spark.createDataFrame([(t,) for t in NEG_TEXTS], ["text"])
    return fit_quality_classifier(pos, neg, dim=dim, ngram=ngram,
                                  normalize=normalize)


def test_tokenizer_semantics(spark):
    # Explicit ws class: \x0b splits, U+3000 does NOT; ASCII-only
    # lowercase; leading/trailing runs drop; NULL -> empty.
    df = spark.createDataFrame(
        [("  A b\x0bC\td ",), ("x　y",), (None,), ("",)], ["text"])
    rows = df.select(token_col(F.col("text")).alias("t")).collect()
    assert rows[0]["t"] == ["a", "b", "c", "d"]
    assert rows[1]["t"] == ["x　y"]
    assert rows[2]["t"] == []
    assert rows[3]["t"] == []


def test_bigram_features(spark):
    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], ["text"])
    rows = df.select(feature_col(F.col("text"), 2).alias("t")).collect()
    assert rows[0]["t"] == ["a", "b", "c", "a b", "b c"]
    assert rows[1]["t"] == ["solo"]
    assert rows[2]["t"] == []
    with pytest.raises(ValueError, match="ngram"):
        feature_col(F.col("text"), 3)


def test_bucket_matches_python_md5(spark):
    import hashlib
    dim = 512
    toks = ["alpha", "beta", "a b", "あ"]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    got = {r["tok"]: r["b"] for r in df.select(
        "tok", bucket_col(F.col("tok"), dim).alias("b")).collect()}
    for t in toks:
        exp = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
        assert got[t] == exp, t


def test_classifier_separates_classes(spark):
    model = _fit(spark)
    held = spark.createDataFrame(
        [(0, "the study reports detailed measurements of the sample"),
         (1, "the manuscript catalog preserves the inspection records"),
         (2, "free bonus click now claim prize best offer"),
         (3, "buy cheap discount pills click subscribe now")],
        ["doc_id", "text"])
    scored = score_quality_classifier(held, model, ["doc_id"])
    s = {r["doc_id"]: r["quality_clf_score"] for r in scored.collect()}
    assert min(s[0], s[1]) > max(s[2], s[3])


def test_training_determinism_across_partitionings(spark):
    m1 = _fit(spark)
    pos = spark.createDataFrame([(t,) for t in POS_TEXTS],
                                ["text"]).repartition(7)
    neg = spark.createDataFrame([(t,) for t in NEG_TEXTS],
                                ["text"]).repartition(3)
    m2 = fit_quality_classifier(pos, neg, dim=512)
    assert m1["meta"] == m2["meta"]
    w1 = {r["b"]: r["weight"] for r in m1["weights"].collect()}
    w2 = {r["b"]: r["weight"] for r in m2["weights"].collect()}
    assert w1 == w2  # integer counts -> identical doubles


def test_scoring_values_match_python_reference(spark):
    # Independent reference: recompute one doc's score in pure Python.
    import hashlib
    dim = 512
    model = _fit(spark, dim=dim)
    meta = model["meta"]
    w = {r["b"]: r["weight"] for r in model["weights"].collect()}
    text = "the detailed report on casino bonus"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = score_quality_classifier(df, model, ["doc_id"]).collect()[0][
        "quality_clf_score"]
    toks = text.split()
    ws = [w.get(int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim,
                meta["w0"]) for t in toks]
    exp = meta["prior"] + sum(ws) / len(ws)
    assert got == pytest.approx(exp, abs=1e-12)


def test_empty_and_null_text_score_prior(spark):
    model = _fit(spark)
    df = spark.createDataFrame([(0, ""), (1, None), (2, "   ")],
                               ["doc_id", "text"])
    scored = score_quality_classifier(df, model, ["doc_id"])
    for r in scored.collect():
        assert r["quality_clf_score"] == pytest.approx(
            model["meta"]["prior"], abs=0.0)


def test_unnormalized_sum_mode(spark):
    model = _fit(spark, normalize=False)
    df = spark.createDataFrame(
        [(0, "casino casino"), (1, "casino casino casino casino")],
        ["doc_id", "text"])
    s = {r["doc_id"]: r["quality_clf_score"]
         for r in score_quality_classifier(df, model, ["doc_id"]).collect()}
    # Sum mode: doubling the tokens doubles the (negative) evidence.
    p = model["meta"]["prior"]
    assert s[1] - p == pytest.approx(2 * (s[0] - p), rel=1e-9)


def test_fit_validation(spark):
    pos = spark.createDataFrame([("x",)], ["text"])
    neg = spark.createDataFrame([("",)], ["text"])
    with pytest.raises(ValueError, match="at least one token"):
        fit_quality_classifier(pos, neg, dim=64)
    with pytest.raises(ValueError, match="dim"):
        fit_quality_classifier(pos, pos, dim=1)
    with pytest.raises(ValueError, match="alpha"):
        fit_quality_classifier(pos, pos, dim=64, alpha=0)


def test_model_roundtrip(spark, tmp_path):
    model = _fit(spark, ngram=2)
    path = str(tmp_path / "qm")
    write_quality_model(spark, model, path)
    loaded = read_quality_model(spark, path)
    assert loaded["meta"] == model["meta"]
    assert sorted(loaded["weights"].collect()) == sorted(
        model["weights"].collect())
    with pytest.raises(Exception):
        write_quality_model(spark, model, path)  # refuses overwrite


def test_model_write_retry_after_crash_between_writes(spark, tmp_path):
    """A crash after weights/ but before meta/ (the commit marker) must
    not wedge the path: the retry overwrites the uncommitted weights and
    commits normally."""
    model = _fit(spark)
    path = str(tmp_path / "qm_crash")
    # simulate the crash: weights landed, meta never did
    model["weights"].write.parquet(f"{path}/weights")
    write_quality_model(spark, model, path)  # retry succeeds
    loaded = read_quality_model(spark, path)
    assert loaded["meta"] == model["meta"]
    with pytest.raises(ValueError, match="committed"):
        write_quality_model(spark, model, path)


def test_scoring_plan_jvm_only_and_broadcast(spark):
    model = _fit(spark)
    df = spark.createDataFrame([(0, "hello world")], ["doc_id", "text"])
    scored = score_quality_classifier(df, model, ["doc_id"])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_expr_path_matches_join_path(spark):
    model = _fit(spark, ngram=2)
    df = spark.createDataFrame(
        [(0, "the detailed report"), (1, "click now free bonus"),
         (2, ""), (3, None), (4, "zzz unseen tokens qqq")],
        ["doc_id", "text"])
    joined = {r["doc_id"]: r["quality_clf_score"]
              for r in score_quality_classifier(df, model,
                                                ["doc_id"]).collect()}
    expr = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", quality_score_expr(model, F.col("text")).alias("s")
    ).collect()}
    for k, v in joined.items():
        assert expr[k] == pytest.approx(v, abs=1e-12), k


GOOD_TURN = "the committee report measured detailed water policy records"
JUNK_TURN = "click now free bonus claim prize best offer subscribe"


def _pipeline_fixtures(spark, tmp_path):
    import datetime

    import pandas as pd
    model = _fit(spark)
    mpath = str(tmp_path / "qmodel")
    write_quality_model(spark, model, mpath)
    cand = spark.createDataFrame(
        [(0, GOOD_TURN), (1, JUNK_TURN)], ["doc_id", "text"])
    s = {r["doc_id"]: r["quality_clf_score"]
         for r in score_quality_classifier(cand, model, ["doc_id"]).collect()}
    thr = (s[0] + s[1]) / 2.0
    assert s[0] > thr > s[1]

    def write_turns(rows, path):
        pdf = pd.DataFrame(
            [{"conv_id": c, "turn_idx": i, "role": "user", "text": t,
              "tool": "", "ts": datetime.datetime(2025, 1, 1)}
             for c, i, t in rows])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(path, index=False)

    return mpath, thr, write_turns


def test_pipeline_quality_gate(spark, tmp_path):
    """The gate drops below-threshold turns pre-scrub, counts them in
    the _lineage_quality sidecar, and refuses a half-configured gate."""
    from sumi_agent_spark.plans.pipeline import run_pipeline

    mpath, thr, write_turns = _pipeline_fixtures(spark, tmp_path)
    inp = str(tmp_path / "in.parquet")
    write_turns([("c1", 0, GOOD_TURN), ("c1", 1, JUNK_TURN),
                 ("c2", 0, JUNK_TURN + " wow"), ("c2", 1, GOOD_TURN)],
                inp)
    out = str(tmp_path / "out")
    stats = run_pipeline(spark, inp, out, quality_model_path=mpath,
                         quality_min_score=thr)
    got = spark.read.parquet(out).toPandas()
    assert set(zip(got["conv_id"], got["turn_idx"])) == {
        ("c1", 0), ("c2", 1)}
    assert stats["rows_in"] == stats["rows_out"] == 2
    lin = spark.read.parquet(f"{out}/_lineage_quality").toPandas()
    assert lin["n_dropped"].tolist() == [2]
    assert lin["min_score"].tolist() == [pytest.approx(thr)]

    with pytest.raises(ValueError, match="together"):
        run_pipeline(spark, inp, str(tmp_path / "out2"),
                     quality_model_path=mpath)
    with pytest.raises(ValueError, match="together"):
        run_pipeline(spark, inp, str(tmp_path / "out2"),
                     quality_min_score=thr)


def test_pipeline_quality_gate_resume(spark, tmp_path):
    """Resume composes: the second run re-drops the same junk (the gate
    is per-row-independent) and appends nothing for written keys."""
    from sumi_agent_spark.plans.pipeline import run_pipeline

    mpath, thr, write_turns = _pipeline_fixtures(spark, tmp_path)
    inp = str(tmp_path / "in.parquet")
    write_turns([("c1", 0, GOOD_TURN), ("c1", 1, JUNK_TURN)], inp)
    out = str(tmp_path / "out")
    run_pipeline(spark, inp, out, quality_model_path=mpath,
                 quality_min_score=thr)
    s2 = run_pipeline(spark, inp, out, resume=True,
                      quality_model_path=mpath, quality_min_score=thr)
    assert s2["rows"] == 0
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 1


def test_quality_upsert_recheck(spark, tmp_path):
    """A changed re-export whose NEW text fails the quality gate comes
    back as a delete; one rewritten into different GOOD text comes back
    as a processed upsert row."""
    from sumi_agent_spark.plans.pipeline import run_pipeline

    mpath, thr, write_turns = _pipeline_fixtures(spark, tmp_path)
    idx = str(tmp_path / "mh_index")
    kw = dict(near_dedup_threshold=0.6, near_dedup_index_path=idx,
              reindex_changed=True, quality_model_path=mpath,
              quality_min_score=thr)
    write_turns([("a", 0, GOOD_TURN),
                 ("b", 0, "researchers preserved manuscript catalog "
                          "records for the archive study")],
                str(tmp_path / "s1.parquet"))
    run_pipeline(spark, str(tmp_path / "s1.parquet"),
                 str(tmp_path / "out1"), **kw)

    write_turns([("a", 0, JUNK_TURN),
                 ("b", 0, "engineers documented the bridge inspection "
                          "study with annotated policy diagrams")],
                str(tmp_path / "s2.parquet"))
    s2 = run_pipeline(spark, str(tmp_path / "s2.parquet"),
                      str(tmp_path / "out2"), **kw)
    assert s2["n_preindexed_changed"] == 2
    up = spark.read.parquet(
        f"{tmp_path}/out2/_changed_upsert").toPandas()
    acts = dict(zip(up["conv_id"], up["_action"]))
    assert acts == {"a": "delete", "b": "upsert"}


def test_expr_path_is_streaming_safe(spark, tmp_path):
    # Stateless column expression -> usable in a streaming query as-is.
    model = _fit(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, "the detailed report"), (1, "click now free bonus")],
        ["doc_id", "text"]).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src)
              .select("doc_id",
                      quality_score_expr(model, F.col("text")).alias("s")))
    out = str(tmp_path / "out")
    q = (stream.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["s"] for r in spark.read.parquet(out).collect()}
    batch = {r["doc_id"]: r["quality_clf_score"]
             for r in score_quality_classifier(
                 spark.read.parquet(src), model, ["doc_id"]).collect()}
    assert got.keys() == batch.keys()
    for k in got:
        assert got[k] == pytest.approx(batch[k], abs=1e-12)
