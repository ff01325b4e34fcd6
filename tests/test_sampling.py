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


# ─── token-budget mixture sampling ───

@pytest.fixture(scope="module")
def mix_table(spark):
    """Three sources with very different doc lengths: a row-fraction
    sample would skew the TOKEN mix, which is the point of the op.
    web: 6000 docs x 100 tok; books: 600 x 2000; code: 1200 x 500."""
    web = spark.range(6000).select(
        F.concat(F.lit("w"), F.col("id")).alias("k"),
        F.lit("web").alias("src"), F.lit(100).alias("toks"))
    books = spark.range(600).select(
        F.concat(F.lit("b"), F.col("id")).alias("k"),
        F.lit("books").alias("src"), F.lit(2000).alias("toks"))
    code = spark.range(1200).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"),
        F.lit("code").alias("src"), F.lit(500).alias("toks"))
    return web.unionByName(books).unionByName(code)


def test_token_budget_realized_shares(spark, mix_table):
    """Realized token mass per source lands near T*share, even though
    the per-source ROW fractions differ wildly (that is the operator's
    reason to exist)."""
    from sumi_agent_spark.operators.sampling import token_budget_sample

    shares = {"web": 0.5, "books": 0.3, "code": 0.2}
    out, info = token_budget_sample(
        mix_table, "src", shares, ["k"], "toks",
        total_tokens=600_000, seed=3)
    got = {r["src"]: r["t"] for r in
           out.groupBy("src").agg(F.sum("toks").alias("t")).collect()}
    for src, s in shares.items():
        target = 600_000 * s
        assert abs(got[src] - target) / target < 0.25, (src, got[src])
    # fractions genuinely differ per stratum
    f = {k: v["fraction"] for k, v in info["strata"].items()}
    assert f["web"] == pytest.approx(300_000 / 600_000)
    assert f["books"] == pytest.approx(180_000 / 1_200_000)
    assert f["code"] == pytest.approx(120_000 / 600_000)


def test_token_budget_max_feasible_and_nesting(spark, mix_table):
    """budget=None consumes the scarcest stratum whole; a smaller budget
    at the same seed selects a SUBSET (nested scaling-law mixes)."""
    from sumi_agent_spark.operators.sampling import token_budget_sample

    shares = {"web": 0.5, "books": 0.3, "code": 0.2}
    full, info = token_budget_sample(
        mix_table, "src", shares, ["k"], "toks", seed=3)
    # books is scarcest relative to its share: a=1.2M, a/s = 4M vs
    # web 600k/0.5=1.2M -> web binds: T = 1.2M
    assert info["budget_tokens"] == pytest.approx(1_200_000)
    assert info["strata"]["web"]["fraction"] == 1.0
    small, _ = token_budget_sample(
        mix_table, "src", shares, ["k"], "toks",
        total_tokens=300_000, seed=3)
    assert _keys(small) <= _keys(full)


def test_token_budget_determinism_and_unlisted_strata(spark, mix_table):
    """Membership is partitioning-invariant; rows of a source not in
    shares are not part of the mixture; an unsatisfiable share raises."""
    from sumi_agent_spark.operators.sampling import token_budget_sample

    shares = {"web": 0.7, "books": 0.3}
    a, _ = token_budget_sample(mix_table, "src", shares, ["k"], "toks",
                               total_tokens=400_000, seed=1)
    b, _ = token_budget_sample(mix_table.repartition(13), "src", shares,
                               ["k"], "toks", total_tokens=400_000, seed=1)
    assert _keys(a) == _keys(b)
    assert not [r for r in a.select("src").distinct().collect()
                if r["src"] == "code"]
    with pytest.raises(ValueError, match="unsatisfiable"):
        token_budget_sample(mix_table, "src",
                            {"web": 0.5, "papers": 0.5}, ["k"], "toks")


def test_token_budget_data_path_has_no_shuffle(spark, mix_table):
    """The aggregate pass is a separate job; the returned data path is
    one codegen'd filter -- no Exchange."""
    from sumi_agent_spark.operators.sampling import token_budget_sample

    out, _ = token_budget_sample(mix_table, "src", {"web": 1.0}, ["k"],
                                 "toks", total_tokens=100_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pipeline_token_mix_gate(spark, tmp_path):
    """run_pipeline(sample_token_shares=...): realized per-role token
    mass tracks the requested mix, membership is resume-stable (the
    fractions aggregate the FULL input, before resume_filter), and the
    _lineage_token_mix sidecar records budget + per-stratum fractions."""
    import datetime
    import json

    from sumi_agent_spark.plans.pipeline import run_pipeline

    ts = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(300):   # user turns: short
        rows.append((f"c{i}", 0, "user", "short question " + str(i), "", ts))
    for i in range(300):   # assistant turns: 10x longer
        rows.append((f"c{i}", 1, "assistant",
                     ("a long detailed answer full of text " * 10) + str(i),
                     "", ts))
    inp = str(tmp_path / "tm_in.parquet")
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp").write.parquet(inp)

    out = str(tmp_path / "tm_out")
    shares = {"user": 0.5, "assistant": 0.5}
    stats = run_pipeline(spark, inp, out, sample_token_shares=shares,
                         sample_token_stratum_col="role", sample_seed=11)
    got = spark.read.parquet(out)
    # max-feasible budget: user tokens are scarce relative to the 50%
    # share -> every user turn kept, assistant thinned to user-token mass
    tok = {r["role"]: r["t"] for r in got.groupBy("role").agg(
        F.sum(F.length("text")).alias("t")).collect()}
    assert abs(tok["assistant"] - tok["user"]) / tok["user"] < 0.35
    side = spark.read.parquet(out + "/_lineage_token_mix").toPandas()
    assert side.iloc[0]["stage"] == "sample_token_mix"
    strata = json.loads(side.iloc[0]["strata"])
    assert strata["user"]["fraction"] == 1.0
    assert strata["assistant"]["fraction"] < 0.2
    assert stats["n_token_mix_dropped"] > 0

    # resume writes nothing new: same fractions, same membership
    s2 = run_pipeline(spark, inp, out, resume=True,
                      sample_token_shares=shares,
                      sample_token_stratum_col="role", sample_seed=11)
    assert s2["rows"] == 0

    with pytest.raises(ValueError, match="stratum_col"):
        run_pipeline(spark, inp, str(tmp_path / "tm_bad"),
                     sample_token_shares=shares)


def test_token_budget_infeasible_budget_raises(spark, mix_table):
    """An explicit budget a stratum cannot fill raises instead of
    silently shipping a skewed mix; allow_short=True opts into the cap."""
    from sumi_agent_spark.operators.sampling import token_budget_sample

    shares = {"web": 0.5, "books": 0.5}   # web has only 600k tokens
    with pytest.raises(ValueError, match="infeasible"):
        token_budget_sample(mix_table, "src", shares, ["k"], "toks",
                            total_tokens=2_000_000)
    out, info = token_budget_sample(mix_table, "src", shares, ["k"],
                                    "toks", total_tokens=2_000_000,
                                    allow_short=True)
    assert info["strata"]["web"]["fraction"] == 1.0
    assert _keys(out) >= {f"w{i}" for i in range(5)}  # all web rows kept


def test_pipeline_stratified_resume_refuses_grown_input(spark, tmp_path):
    """Exact-n stratified sampling re-ranks over the full population, so
    a resume over GROWN input would silently exceed n per stratum --
    the gate refuses it; same-input resume still works."""
    import datetime

    from sumi_agent_spark.plans.pipeline import run_pipeline

    ts = datetime.datetime(2025, 1, 1)
    rows = [(f"c{i}", 0, "user", f"turn number {i}", "", ts)
            for i in range(40)]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    inp = str(tmp_path / "sg_in.parquet")
    spark.createDataFrame(rows, schema).write.parquet(inp)
    out = str(tmp_path / "sg_out")
    run_pipeline(spark, inp, out, sample_n_per_stratum=5,
                 sample_strata_cols=["role"])
    # same-input resume: nothing new to write, no complaint
    s2 = run_pipeline(spark, inp, out, resume=True,
                      sample_n_per_stratum=5, sample_strata_cols=["role"])
    assert s2["rows"] == 0
    # grown input under resume: refused
    grown = rows + [(f"d{i}", 0, "user", f"new turn {i}", "", ts)
                    for i in range(10)]
    inp2 = str(tmp_path / "sg_in2.parquet")
    spark.createDataFrame(grown, schema).write.parquet(inp2)
    with pytest.raises(ValueError, match="SAME input"):
        run_pipeline(spark, inp2, out, resume=True,
                     sample_n_per_stratum=5, sample_strata_cols=["role"])


def test_token_budget_membership_matches_python_md5(spark, mix_table):
    """The 60-bit numeric prefix rule is replicable in plain Python --
    the exact property the DuckDB twin relies on."""
    import hashlib
    import math

    from sumi_agent_spark.operators.sampling import (
        _PREFIX_DIGITS, _PREFIX_SPACE, token_budget_sample)

    shares = {"web": 0.5, "books": 0.3, "code": 0.2}
    out, info = token_budget_sample(mix_table, "src", shares, ["k"],
                                    "toks", total_tokens=600_000, seed=3)
    got = _keys(out)
    avail = {"web": 600_000, "books": 1_200_000, "code": 600_000}
    want = set()
    for src, n, prefix_chr in (("web", 6000, "w"), ("books", 600, "b"),
                               ("code", 1200, "c")):
        f = min(1.0, (600_000.0 * (shares[src] / 1.0)) / avail[src])
        thr = int(math.floor(f * _PREFIX_SPACE))
        assert info["strata"][src]["threshold"] == thr
        for i in range(n):
            key = f"{prefix_chr}{i}"
            msg = f"{len(key)}:{key}1:3"
            h = hashlib.md5(msg.encode()).hexdigest()
            if int(h[:_PREFIX_DIGITS], 16) < thr:
                want.add(key)
    assert got == want


def test_pipeline_stratified_resume_refuses_changed_params(spark, tmp_path):
    """The resume guard compares the full rank parameters, not just the
    input size: a changed seed re-ranks and would overflow n."""
    import datetime

    from sumi_agent_spark.plans.pipeline import run_pipeline

    ts = datetime.datetime(2025, 1, 1)
    rows = [(f"c{i}", 0, "user", f"turn number {i}", "", ts)
            for i in range(40)]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    inp = str(tmp_path / "sp_in.parquet")
    spark.createDataFrame(rows, schema).write.parquet(inp)
    out = str(tmp_path / "sp_out")
    run_pipeline(spark, inp, out, sample_n_per_stratum=5,
                 sample_strata_cols=["role"], sample_seed=0)
    with pytest.raises(ValueError, match="rank parameters"):
        run_pipeline(spark, inp, out, resume=True,
                     sample_n_per_stratum=5, sample_strata_cols=["role"],
                     sample_seed=1)
