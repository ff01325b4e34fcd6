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
