"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video assets are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so payload bytes stream through in
columnar batches without ever landing driver-side.

The actual codec work is STUBBED (this container has no image/audio libs):
``decode_mode='strict'`` raises NotImplementedError at the decode step;
``decode_mode='fake'`` derives deterministic pseudo-metadata/features from
the payload bytes so the Spark-side plumbing -- schema, partitioning, UDF
signature, batch shape -- is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("source_doc_id", LongType(), True),
])

DECODED_SCHEMA = StructType(ASSET_SCHEMA.fields + [
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_DIM = 32
FEATURED_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])


def generate_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (payload = seeded bytes).

    Built from a pandas frame so the local fixture ships to the JVM as one
    Arrow batch (plain-row createDataFrame would round-trip every payload
    through pickled-RDD Python workers -- seconds of overhead for a tiny
    table); coalesced so downstream Python stages don't pay worker startup
    for dozens of one-row partitions."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {"asset_id": [], "kind": [], "payload": [], "mime": [],
            "source_doc_id": []}
    for i in range(n):
        kind = kinds[i % 3]
        rows["asset_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(rng.bytes(rng.randint(64, 2048)))
        rows["mime"].append(f"{kind}/fake")
        rows["source_doc_id"].append(i % 16)
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf, ASSET_SCHEMA).coalesce(8)


def _fake_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic pseudo-metadata from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    w = 64 + d[0] * 8
    h = 64 + d[1] * 8
    frames = 1 + d[2] % 64
    dur = 100 + int.from_bytes(d[3:5], "big") % 60000
    return w, h, frames, dur


def decode_assets(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """mapInPandas decode stage: payload -> typed media metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "real image/audio decode requires codec libs not present "
                    "in this container; use decode_mode='fake'")
            metas = [_fake_meta(p if p is not None else b"")
                     for p in pdf["payload"]]
            pdf = pdf.copy()
            pdf["width"] = pd.array([m[0] for m in metas], dtype="int32")
            pdf["height"] = pd.array([m[1] for m in metas], dtype="int32")
            pdf["n_frames"] = pd.array([m[2] for m in metas], dtype="int32")
            pdf["duration_ms"] = pd.array([m[3] for m in metas], dtype="int32")
            yield pdf

    return df.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """mapInPandas feature stage: payload -> FEATURE_DIM float vector.
    Fake mode: deterministic bytes-derived unit vector (real batch shapes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "feature extraction needs a real decoder; "
                    "use decode_mode='fake'")
            feats = []
            for p in pdf["payload"]:
                d = hashlib.sha256(p if p is not None else b"").digest()
                v = np.frombuffer(d, dtype=np.uint8).astype(np.float32)
                v = np.resize(v, FEATURE_DIM)
                v = v / (np.linalg.norm(v) or 1.0)
                feats.append(v.tolist())
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "feature": feats,
            })

    return df.mapInPandas(run, FEATURED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: explode decoded frame indices
    (0, every_n, 2*every_n, ...) -- pure native ops, the decode of each
    sampled frame would be another mapInPandas stage on a real cluster."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (df.filter(F.col("kind") == "video")
            .withColumn("frame_idx", F.explode(frames))
            .select("asset_id", "frame_idx", "width", "height"))
