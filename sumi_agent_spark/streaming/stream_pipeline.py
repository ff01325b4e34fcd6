"""Structured Streaming variant of the scrub pipeline.

The reference is strictly batch (SURVEY.md §2.10), but every transform here
is per-row, so the exact same ``scrub_transcripts`` composition runs
unchanged under ``readStream`` -- batch/streaming unification is the point
of declaring the pipeline as DataFrame transforms.

Adds the streaming-only pieces the batch path has no use for:
* file-source ingestion with schema pinning (``maxFilesPerTrigger`` for
  backpressure on a 100 TB backfill),
* event-time watermarking + tumbling-window per-conversation keep/drop
  counters (late turns beyond the watermark are dropped from the counters,
  never from the scrubbed output -- masking is stateless),
* exactly-once parquet sink with checkpointing; resuming a killed stream
  re-uses the sink commit log, which is the streaming analog of the batch
  anti-join resume (plans/checkpoint.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType, TimestampType,
)

from ..plans.pipeline import scrub_transcripts

TRANSCRIPT_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), False),
    StructField("text", StringType(), True),
    StructField("tool", StringType(), True),
    StructField("ts", TimestampType(), False),
])


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def scrub_stream(stream: DataFrame, **scrub_kwargs) -> DataFrame:
    """Identical transform chain as batch -- same UDFs, same output schema."""
    return scrub_transcripts(stream, **scrub_kwargs)


def windowed_conversation_counts(
    scrubbed: DataFrame,
    watermark: str = "10 minutes",
    window_len: str = "5 minutes",
) -> DataFrame:
    """Event-time keep/drop counters per (window, conv_id) with late-data
    handling; state is bounded by the watermark."""
    return (
        scrubbed
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.col("keep").cast("long")).alias("n_keep"),
             F.sum("n_detections").alias("n_detections"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "conv_id", "n_turns", "n_keep", "n_detections")
    )


def start_scrub_sink(
    scrubbed: DataFrame, output_dir: str, checkpoint_dir: str,
    available_now: bool = True,
):
    """Exactly-once parquet sink.  ``available_now`` drains the current
    backlog then stops -- the pattern for incremental backfills."""
    writer = (scrubbed.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
