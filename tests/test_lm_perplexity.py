"""Unigram-LM perplexity scorer (operators/lm_perplexity.py):
hand-computed probabilities, edge cases, persistence discipline, plan
shape, and the pipeline gate."""

import math

import pytest

from sumi_agent_spark.operators.lm_perplexity import (
    fit_unigram_lm,
    read_unigram_lm,
    score_perplexity,
    write_unigram_lm,
)


def _ref(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_fit_hand_computed(spark):
    # tokens: a a b -> N=3; min_count=2 -> V={a}, UNK mass = c(b)=1
    m = fit_unigram_lm(_ref(spark, ["a a", "b"]), min_count=2, alpha=1.0)
    meta = m["meta"]
    assert (meta["n_tokens"], meta["vocab_size"]) == (3, 1)
    denom = 3 + 1.0 * 2
    assert meta["unk_lp"] == pytest.approx(math.log(2 / denom))
    w = {r["token"]: r["lp"] for r in m["weights"].collect()}
    assert set(w) == {"a"}
    assert w["a"] == pytest.approx(math.log(3 / denom))


def test_score_hand_computed_and_null(spark):
    m = fit_unigram_lm(_ref(spark, ["a a", "b"]), min_count=2, alpha=1.0)
    denom = 3 + 1.0 * 2
    lp_a, lp_u = math.log(3 / denom), math.log(2 / denom)
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "A a"), (2, ""), (3, None)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["log_ppl"]
           for r in score_perplexity(df, m, ["doc_id"]).collect()}
    assert got[0] == pytest.approx(
        round(-(lp_a + 2 * lp_u) / 3, 6))
    # ASCII lowercase: "A" tokenizes to "a"
    assert got[1] == pytest.approx(round(-lp_a, 6))
    assert got[2] is None and got[3] is None


def test_reference_like_text_scores_lower(spark):
    ref = _ref(spark, ["the measured report detailed the policy",
                       "the detailed study measured the records"] * 3)
    m = fit_unigram_lm(ref, min_count=2)
    df = spark.createDataFrame(
        [(0, "the measured policy report"),
         (1, "zxq qqqq glorp wubble")], ["doc_id", "text"])
    got = {r["doc_id"]: r["log_ppl"]
           for r in score_perplexity(df, m, ["doc_id"]).collect()}
    assert got[0] < got[1]


def test_fit_validation(spark):
    with pytest.raises(ValueError, match="no tokens"):
        fit_unigram_lm(_ref(spark, ["", "   "]))
    with pytest.raises(ValueError, match="alpha"):
        fit_unigram_lm(_ref(spark, ["a"]), alpha=0.0)
    with pytest.raises(ValueError, match="min_count"):
        fit_unigram_lm(_ref(spark, ["a"]), min_count=0)


def test_partitioning_invariance(spark):
    ref = _ref(spark, [f"tok{i % 7} tok{i % 3} filler" for i in
                       range(50)])
    m1 = fit_unigram_lm(ref, min_count=2)
    m2 = fit_unigram_lm(ref.repartition(11), min_count=2)
    assert m1["meta"] == m2["meta"]
    df = _ref(spark, [f"tok{i % 5} other words here" for i in range(30)])
    a = sorted(score_perplexity(df, m1, ["doc_id"]).collect())
    b = sorted(score_perplexity(
        df.repartition(5), m2, ["doc_id"]).collect())
    assert a == b


def test_scoring_plan_jvm_only_and_broadcast(spark):
    m = fit_unigram_lm(_ref(spark, ["a a b b"]))
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    plan = score_perplexity(df, m, ["doc_id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_broadcast_opt_out_matches(spark):
    # broadcast=False must change the plan, never the values (the
    # corpus-sized-vocabulary escape hatch)
    ref = _ref(spark, [f"tok{i % 7} tok{i % 3} filler" for i in range(50)])
    m = fit_unigram_lm(ref, min_count=2)
    df = _ref(spark, [f"tok{i % 5} other words here" for i in range(30)])
    a = sorted(score_perplexity(df, m, ["doc_id"]).collect())
    b = sorted(score_perplexity(df, m, ["doc_id"],
                                broadcast=False).collect())
    assert a == b


def test_model_roundtrip_and_crash_retry(spark, tmp_path):
    m = fit_unigram_lm(_ref(spark, ["a a b b c"]), min_count=2)
    path = str(tmp_path / "lm")
    write_unigram_lm(spark, m, path)
    loaded = read_unigram_lm(spark, path)
    assert loaded["meta"] == m["meta"]
    assert sorted(loaded["weights"].collect()) == sorted(
        m["weights"].collect())
    with pytest.raises(ValueError, match="committed"):
        write_unigram_lm(spark, m, path)
    # crash between weights and meta: retry must succeed
    path2 = str(tmp_path / "lm2")
    m["weights"].write.parquet(f"{path2}/weights")
    write_unigram_lm(spark, m, path2)
    assert read_unigram_lm(spark, path2)["meta"] == m["meta"]
    # crash DURING the meta write (torn directory, no _SUCCESS marker):
    # the retry must delete the torn marker and commit normally
    import os
    path3 = str(tmp_path / "lm3")
    m["weights"].write.parquet(f"{path3}/weights")
    os.makedirs(f"{path3}/meta/_temporary")
    write_unigram_lm(spark, m, path3)
    assert read_unigram_lm(spark, path3)["meta"] == m["meta"]


REF_TURN = "the committee measured the detailed policy report records"
JUNK_TURN = "zxq glorp wubble qqqq snorfle blargh wibble zonk"


def _pipeline_fixture(spark, tmp_path):
    import datetime

    import pandas as pd
    ref = _ref(spark, [REF_TURN, "the detailed records measured the "
                                 "annual policy report"] * 2)
    m = fit_unigram_lm(ref, min_count=2)
    mpath = str(tmp_path / "lm_model")
    write_unigram_lm(spark, m, mpath)
    cand = spark.createDataFrame(
        [(0, REF_TURN), (1, JUNK_TURN)], ["doc_id", "text"])
    s = {r["doc_id"]: r["log_ppl"]
         for r in score_perplexity(cand, m, ["doc_id"]).collect()}
    thr = (s[0] + s[1]) / 2.0
    assert s[0] < thr < s[1]

    def write_turns(rows, path):
        pdf = pd.DataFrame(
            [{"conv_id": c, "turn_idx": i, "role": "user", "text": t,
              "tool": "", "ts": datetime.datetime(2025, 1, 1)}
             for c, i, t in rows])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(path, index=False)

    return mpath, thr, write_turns


def test_pipeline_perplexity_gate(spark, tmp_path):
    from sumi_agent_spark.plans.pipeline import run_pipeline

    mpath, thr, write_turns = _pipeline_fixture(spark, tmp_path)
    inp = str(tmp_path / "in.parquet")
    write_turns([("c1", 0, REF_TURN), ("c1", 1, JUNK_TURN),
                 ("c2", 0, None)], inp)
    out = str(tmp_path / "out")
    stats = run_pipeline(spark, inp, out, perplexity_model_path=mpath,
                         perplexity_max=thr)
    got = spark.read.parquet(out).toPandas()
    # junk drops; the NULL-text row passes (token-less scores NULL)
    assert set(zip(got["conv_id"], got["turn_idx"])) == {
        ("c1", 0), ("c2", 0)}
    lin = spark.read.parquet(f"{out}/_lineage_perplexity").toPandas()
    assert lin["n_dropped"].tolist() == [1]
    assert lin["max_log_ppl"].tolist() == [pytest.approx(thr)]
    assert stats["rows_in"] == 2

    with pytest.raises(ValueError, match="together"):
        run_pipeline(spark, inp, str(tmp_path / "o2"),
                     perplexity_model_path=mpath)
    with pytest.raises(ValueError, match="together"):
        run_pipeline(spark, inp, str(tmp_path / "o2"),
                     perplexity_max=thr)


def test_pipeline_perplexity_gate_resume(spark, tmp_path):
    from sumi_agent_spark.plans.pipeline import run_pipeline

    mpath, thr, write_turns = _pipeline_fixture(spark, tmp_path)
    inp = str(tmp_path / "in.parquet")
    write_turns([("c1", 0, REF_TURN), ("c1", 1, JUNK_TURN)], inp)
    out = str(tmp_path / "out")
    run_pipeline(spark, inp, out, perplexity_model_path=mpath,
                 perplexity_max=thr)
    s2 = run_pipeline(spark, inp, out, resume=True,
                      perplexity_model_path=mpath, perplexity_max=thr)
    assert s2["rows"] == 0
    assert len(spark.read.parquet(out).toPandas()) == 1
