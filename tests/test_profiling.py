"""Per-group corpus profiling."""

import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.profiling import corpus_profile


def _df(spark, rows, schema="g string, x double"):
    return spark.createDataFrame(rows, schema)


def test_hand_computed_single_group(spark):
    # values 1..5: median 3, mean 3; q at 0.25 of sorted [1..5] = 2
    rows = [("a", float(i)) for i in range(1, 6)]
    r = corpus_profile(_df(spark, rows), "x", ["g"],
                       quantiles=(0.25, 0.5)).collect()[0]
    assert (r["n"], r["n_null"], r["vmin"], r["vmax"]) == (5, 0, 1.0, 5.0)
    assert r["mean"] == 3.0
    assert r["q25"] == 2.0 and r["q5"] == 3.0


def test_interpolation(spark):
    # [0, 10], q=0.75 -> 7.5 (linear interpolation)
    rows = [("a", 0.0), ("a", 10.0)]
    r = corpus_profile(_df(spark, rows), "x", ["g"],
                       quantiles=(0.75,)).collect()[0]
    assert r["q75"] == 7.5


def test_groups_and_nulls(spark):
    rows = [("a", 1.0), ("a", None), ("b", 4.0), ("b", 8.0)]
    got = {r["g"]: r for r in
           corpus_profile(_df(spark, rows), "x", ["g"],
                          quantiles=(0.5,)).collect()}
    assert got["a"]["n"] == 1 and got["a"]["n_null"] == 1
    assert got["b"]["mean"] == 6.0 and got["b"]["q5"] == 6.0


def test_whole_input_group(spark):
    rows = [("a", 2.0), ("b", 4.0)]
    r = corpus_profile(_df(spark, rows), "x",
                       quantiles=(0.5,)).collect()
    assert len(r) == 1 and r[0]["group"] == "_all"
    assert r[0]["mean"] == 3.0


def test_expression_value(spark):
    df = spark.createDataFrame([("a", "hello"), ("a", "hi")],
                               "g string, t string")
    r = corpus_profile(df, F.length("t"), ["g"],
                       quantiles=(0.5,)).collect()[0]
    assert r["vmin"] == 2.0 and r["vmax"] == 5.0 and r["q5"] == 3.5


def test_approx_mode_runs(spark):
    rows = [("a", float(i)) for i in range(100)]
    r = corpus_profile(_df(spark, rows), "x", ["g"],
                       quantiles=(0.5,), exact=False).collect()[0]
    assert 45.0 <= r["q5"] <= 55.0  # accuracy-bounded, not exact


def test_partitioning_invariance_exact(spark):
    rows = [("g%d" % (i % 3), float(i * 7 % 101)) for i in range(300)]
    df = _df(spark, rows)
    a = sorted(map(tuple, corpus_profile(df, "x", ["g"]).collect()))
    b = sorted(map(tuple,
                   corpus_profile(df.repartition(13), "x",
                                  ["g"]).collect()))
    assert a == b


def test_validation(spark):
    df = _df(spark, [("a", 1.0)])
    with pytest.raises(ValueError, match="quantiles"):
        corpus_profile(df, "x", ["g"], quantiles=())
    with pytest.raises(ValueError, match="quantiles"):
        corpus_profile(df, "x", ["g"], quantiles=(1.5,))
    with pytest.raises(ValueError, match="duplicate"):
        corpus_profile(df, "x", ["g"], quantiles=(0.5, 0.50))


def test_tiny_quantile_names_fixed_point(spark):
    # 0.00005 formats to '5e-05' under %g -- the fixed-point namer
    # must not crash and must produce a stable column name
    rows = [("a", float(i)) for i in range(10)]
    r = corpus_profile(_df(spark, rows), "x", ["g"],
                       quantiles=(0.00005,)).collect()[0]
    assert "q00005" in r.asDict()


def test_unnameable_quantile_rejected(spark):
    df = _df(spark, [("a", 1.0)])
    with pytest.raises(ValueError, match="cannot be named"):
        corpus_profile(df, "x", ["g"], quantiles=(0.9999999999999,))


def test_empty_input_whole_group_yields_one_row(spark):
    df = spark.createDataFrame([], "g string, x double")
    r = corpus_profile(df, "x", quantiles=(0.5,)).collect()
    assert len(r) == 1
    assert r[0]["group"] == "_all" and r[0]["n"] == 0
    assert r[0]["q5"] is None
