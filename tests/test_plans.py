"""Physical-plan regression guards: the scale-critical plan properties.

These assert the *shape* of the optimized plans, not results -- a refactor
that silently introduces a shuffle into the hot path or breaks predicate
pushdown should fail CI, not a 100 TB run.
"""

from pyspark.sql import functions as F

from sumi_agent_spark.plans.pipeline import ordered, scrub_transcripts
from sumi_agent_spark.sources.transcripts import generate_transcripts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scrub_hot_path_has_no_shuffle(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(generate_transcripts(5, 5, seed=1)).write.parquet(p)
    plan = _plan(scrub_transcripts(spark.read.parquet(p)))
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1  # both UDFs fused in one stage


def test_ordered_is_single_range_exchange(spark, tmp_path):
    p = str(tmp_path / "t2.parquet")
    spark.createDataFrame(generate_transcripts(5, 5, seed=1)).write.parquet(p)
    plan = _plan(ordered(scrub_transcripts(spark.read.parquet(p)), 4))
    assert plan.count("Exchange") == 1
    assert "rangepartitioning(conv_id" in plan


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "t3.parquet")
    spark.createDataFrame(generate_transcripts(5, 5, seed=1)).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("role") == "user").select("conv_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,user)]" in plan
    # column pruning: the scan must not read the text column
    assert "text" not in plan.split("ReadSchema:")[-1]


def test_quality_filter_predicate_stays_after_udf(spark, tmp_path):
    # filtering on keep cannot push below the UDF (it is derived), but the
    # scan must still prune to only the needed input columns
    p = str(tmp_path / "t4.parquet")
    spark.createDataFrame(generate_transcripts(5, 5, seed=1)).write.parquet(p)
    out = (scrub_transcripts(spark.read.parquet(p))
           .filter(F.col("keep")).select("conv_id", "masked_text"))
    plan = _plan(out)
    read_schema = plan.split("ReadSchema:")[-1]
    assert "tool" not in read_schema  # unused input column pruned


def test_blocked_cosine_plan_shape(spark):
    """cosine_pairs is the block-both-sides matmul: the ONE shuffle is the
    hash exchange on the block-pair key feeding FlatMapGroupsInPandas, the
    tiny pair list joins broadcast (never a shuffled join), and nothing is
    collected driver-side (see test_cosine_pairs_blocked_never_collects)."""
    import __spark_entry__ as e
    plan = _plan(e.queries()["cosine_pairs"](spark, "/root/testdata/sf0.001"))
    assert "FlatMapGroupsInPandas" in plan
    # only the groupBy(pi, pj) exchange shuffles data; the pair list is a
    # BroadcastExchange (which also contains the substring "Exchange")
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1
    assert "hashpartitioning(pi" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "text" not in plan.split("ReadSchema:")[-1]


def test_scrub_docs_plan_prunes_and_fuses(spark):
    import __spark_entry__ as e
    plan = _plan(e.queries()["scrub_docs"](spark, "/root/testdata/sf0.001"))
    # exactly the r7 fan-out repartition -- no aggregation/join shuffles
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning" in plan
    assert plan.count("ArrowEvalPython") == 1
    read = plan.split("ReadSchema:")[-1]
    assert "doc_id" in read and "source" not in read  # unused cols pruned


def test_rtf_strip_filter_stays_below_udf(spark):
    """The backslash/brace prefilter must evaluate at the scan, not after
    the Python stage (a reorder would waste UDF work on filtered rows)."""
    import __spark_entry__ as e
    plan = _plan(e.queries()["rtf_strip"](spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan
    arrow_pos = plan.index("ArrowEvalPython")
    filter_pos = plan.index("Filter ")
    assert filter_pos > arrow_pos  # deeper in the tree = earlier execution


def _partition_filter(plan: str) -> "set[int] | None":
    """Extract the IN-list of the scan's PartitionFilters, if any."""
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*IN \(([0-9,\s]+)\)", plan)
    if not m:
        return None
    return {int(x) for x in m.group(1).split(",")}


def test_ivf_lists_partition_pruning(spark, tmp_path):
    """The IVF deployment story: persist the table partitioned by list_id
    and an n_probe query prunes to exactly the probed partitions -- the
    scan must carry partition filters and touch only those files."""
    import numpy as np

    from sumi_agent_spark.operators.similarity import (
        assign_ivf_lists, ivf_topk, train_ivf_centroids)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cand = emb.filter(F.col("vec_id") > 0)
    cents = train_ivf_centroids(cand, n_lists=8)
    path = str(tmp_path / "ivf")
    assign_ivf_lists(cand, cents).write.partitionBy("list_id").parquet(path)

    indexed = spark.read.parquet(path)
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    topk = ivf_topk(indexed, cents, [float(x) for x in q], k=5, n_probe=2)
    pf = _partition_filter(_plan(topk))
    qn = np.asarray(q, dtype=float)
    qn = qn / np.linalg.norm(qn)
    probe = set(np.argsort(-(cents @ qn))[:2].tolist())
    assert pf is not None and pf == probe  # scan prunes to the probed lists
    assert topk.count() > 0


def test_lsh_bucket_partition_pruning(spark, tmp_path):
    """Same story for the hyperplane-LSH index: bucket is the partition
    key; a top-k probe reads only the query bucket + 1-bit neighbors."""
    from sumi_agent_spark.operators.similarity import build_lsh_index, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    indexed, planes = build_lsh_index(emb.filter("vec_id > 0"),
                                      dim=len(q), n_planes=4)
    path = str(tmp_path / "lsh")
    indexed.write.partitionBy("bucket").parquet(path)

    on_disk = spark.read.parquet(path)
    topk = lsh_topk(on_disk, planes, [float(x) for x in q], k=5)
    pf = _partition_filter(_plan(topk))
    # probed set = base bucket + 4 one-bit flips => exactly 5 buckets,
    # fewer than the 16 on disk (pruning actually pruned)
    assert pf is not None and len(pf) == 5
    all_buckets = {int(f.split("bucket=")[1].split("/")[0])
                   for f in on_disk.inputFiles()}
    assert len(all_buckets) > 5
    assert topk.count() > 0
