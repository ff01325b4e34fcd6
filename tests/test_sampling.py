"""Deterministic sampling (operators/sampling.py): membership is a pure
function of key + seed -- stable across partitionings and reruns, nested
across fractions, exact per-stratum counts, and replicable in plain
Python md5 (the same property the DuckDB contract twin relies on)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.sampling import (
    _HEX_DIGITS,
    deterministic_sample,
    fraction_threshold,
    stratified_sample_n,
)


def _keys(df):
    return {r["k"] for r in df.select("k").collect()}


def _brute_member(key, seed, fraction) -> bool:
    ks, ss = str(key), str(seed)
    msg = f"{len(ks)}:{ks}{len(ss)}:{ss}"
    h = hashlib.md5(msg.encode()).hexdigest()
    return h[:_HEX_DIGITS] < fraction_threshold(fraction)


@pytest.fixture(scope="module")
def table(spark):
    return spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("stratum"))


def test_membership_matches_python_md5(spark, table):
    got = _keys(deterministic_sample(table, ["k"], 0.2, seed=7))
    want = {k for k in range(10_000) if _brute_member(k, 7, 0.2)}
    assert got == want


def test_partitioning_invariance(spark, table):
    a = _keys(deterministic_sample(table.repartition(1), ["k"], 0.3))
    b = _keys(deterministic_sample(table.repartition(13), ["k"], 0.3))
    assert a == b
    # the property df.sample() lacks: its per-partition RNG gives
    # different members under different partitionings (not asserted --
    # it could coincide -- but ours is equal by construction)


def test_nested_fractions_and_seed_independence(spark, table):
    s10 = _keys(deterministic_sample(table, ["k"], 0.1, seed=1))
    s30 = _keys(deterministic_sample(table, ["k"], 0.3, seed=1))
    assert s10 <= s30  # nested: the 10% mix is inside the 30% mix
    other = _keys(deterministic_sample(table, ["k"], 0.1, seed=2))
    assert other != s10  # a different seed is a different sample
    # binomial sanity: 10k rows at 0.3 -> ~3000 +- 4 sigma (sigma ~ 46)
    assert abs(len(s30) - 3000) < 200


def test_fraction_edges(spark, table):
    assert deterministic_sample(table, ["k"], 0.0).count() == 0
    assert deterministic_sample(table, ["k"], 1.0).count() == 10_000
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(table, ["k"], 1.5)


def test_no_shuffle_plan(spark, table):
    plan = (deterministic_sample(table, ["k"], 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan  # pure filter: pushes to the scan


def test_null_keys_sample_consistently(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",)], "k string")
    a = _keys(deterministic_sample(df, ["k"], 0.9999))
    b = _keys(deterministic_sample(df.repartition(3), ["k"], 0.9999))
    assert a == b
    assert None in a  # NULL keys coalesce to a sentinel, never vanish


def test_stratified_exact_counts_and_determinism(spark, table):
    out = stratified_sample_n(table, ["stratum"], 5, ["k"])
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts == {str(i): 5 for i in range(7)}
    again = stratified_sample_n(table.repartition(11), ["stratum"], 5, ["k"])
    assert _keys(out) == _keys(again)
    # small stratum: returns min(n, size)
    tiny = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")],
                                 ["k", "stratum"])
    got = stratified_sample_n(tiny, ["stratum"], 5, ["k"])
    assert got.count() == 3


def test_stratified_composes_with_prefilter(spark, table):
    """Hash-prefix pre-thinning (the hot-stratum trick) preserves the
    top-n exactly while the prefix retains >= n rows per stratum: both
    rank by the SAME hash, so the prefix's top-n is the global top-n."""
    direct = stratified_sample_n(table, ["stratum"], 5, ["k"], seed=3)
    thinned = deterministic_sample(table, ["k"], 0.2, seed=3)
    via = stratified_sample_n(thinned, ["stratum"], 5, ["k"], seed=3)
    # 0.2 of ~1430 rows/stratum ~ 286 >> 5, so equality must hold
    assert _keys(direct) == _keys(via)


def test_multicolumn_hash_is_unambiguous(spark):
    """Length-prefixed encoding: keys that would concatenate identically
    under a bare separator (and NULL vs any literal sentinel) hash
    differently."""
    from sumi_agent_spark.operators.sampling import sample_hash_col

    rows = [("x\x1fy", "z"), ("x", "y\x1fz"),     # bare-\x1f ambiguous pair
            ("x:y", "z"), ("1:x", "2:z"),          # colon-injection pair
            (None, "z"), ("n:", "z")]              # NULL vs literal tag
    df = spark.createDataFrame(rows, "a string, b string")
    hashes = [r["h"] for r in
              df.select(sample_hash_col(["a", "b"]).alias("h")).collect()]
    assert len(set(hashes)) == len(rows)


def test_stratified_strict_rejects_duplicate_keys(spark):
    """strict=True (default) converts the documented tie nondeterminism
    into a loud error; strict=False accepts it (caller's choice)."""
    dup = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (3, "y")], ["k", "stratum"])
    with pytest.raises(ValueError, match="uniquely identify"):
        stratified_sample_n(dup, ["stratum"], 2, ["k"])
    got = stratified_sample_n(dup, ["stratum"], 2, ["k"], strict=False)
    assert got.count() == 3  # 2 from x (dup ties), 1 from y
    # NULL keys hash to the 'n:' tag, never NULL: two NULL keys ARE
    # duplicates and must trip the strict check (count_distinct over the
    # raw key tuple would silently skip them)
    nulls = spark.createDataFrame(
        [(None, "x"), (None, "x")], "k int, stratum string")
    with pytest.raises(ValueError, match="uniquely identify"):
        stratified_sample_n(nulls, ["stratum"], 1, ["k"])
