"""Per-stage lineage + resumable restart (north rule requirement).

Each stage write appends per-partition lineage rows
``(stage, partition_id, n_turns, n_keep, n_drop, n_masked, wall_ms)`` under
``<output>/_lineage/``; restarting reads only the output's key columns
(column pruning keeps this cheap) and anti-joins processed
``(conv_id, turn_idx)`` pairs out of the input, so a killed job resumes
idempotently.  These are plain DataFrame ops -- no custom commit protocol.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_with_lineage(df: DataFrame, output_path: str, stage: str) -> int:
    """Write data parquet + lineage parquet; returns row count.

    The lineage aggregation runs on the written output (one extra cheap scan
    over pruned columns) so its counters reflect exactly what landed."""
    t0 = time.time()
    df.write.mode("append").parquet(output_path)
    spark = df.sparkSession
    written = spark.read.parquet(output_path)
    lineage = (
        written
        .select("keep", "n_detections",
                F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.col("keep").cast("long")).alias("n_keep"),
             F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
             F.sum((F.col("n_detections") > 0).cast("long")).alias("n_masked"))
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_ms", F.lit(int((time.time() - t0) * 1000)))
    )
    lineage.write.mode("append").parquet(f"{output_path}/_lineage")
    return written.count()


def resume_filter(df: DataFrame, output_path: str) -> DataFrame:
    """Drop (conv_id, turn_idx) pairs already present in the output."""
    spark = df.sparkSession
    try:
        done = spark.read.parquet(output_path).select("conv_id", "turn_idx")
    except Exception:
        return df  # nothing written yet
    return df.join(done, on=["conv_id", "turn_idx"], how="left_anti")


def read_lineage(spark, output_path: str) -> DataFrame:
    return spark.read.parquet(f"{output_path}/_lineage")
