"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k, expressed with native higher-order
functions (``zip_with`` + ``aggregate``) so the dot products run inside
whole-stage codegen, no Python.  Scale path: random-hyperplane LSH bucketing
(probe the query's bucket plus its <=1-bit-flip neighbors), which turns a
full scan into a few bucket lookups -- the buckets are just a partition key,
so at 100 TB the table is written bucketed/partitioned by ``bucket`` and a
query prunes to a handful of partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_SEED = 0x51AE


def _cosine_col(vec_col: str, qlit) -> "F.Column":
    """cos(vec, q) as a native column expression (JVM-side, codegen)."""
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit,
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    n1 = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(
        F.transform(qlit, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return dot / (n1 * n2)


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (df.select(F.col(id_col),
                      F.round(_cosine_col(vec_col, qlit), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def hyperplane_bucket_udf(dim: int, n_planes: int = 12):
    """vec -> int64 sign-bucket under fixed random hyperplanes."""
    rng = np.random.RandomState(_SEED)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        keys = np.zeros(len(m), dtype=np.int64)
        for j in range(n_planes):
            keys |= signs[:, j].astype(np.int64) << j
        return pd.Series(keys)

    return bucket, planes


def build_lsh_index(
    df: DataFrame, dim: int, n_planes: int = 12,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Attach a bucket column.  At scale: persist partitioned by ``bucket``
    so queries prune to the probed buckets (partition pruning is free)."""
    bucket, planes = hyperplane_bucket_udf(dim, n_planes)
    return df.withColumn("bucket", bucket(F.col(vec_col))), planes


def lsh_topk(
    indexed: DataFrame, planes: np.ndarray, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", probe_flips: int = 1,
) -> DataFrame:
    """ANN top-k: scan only the query's bucket + <=probe_flips-bit neighbors."""
    q = np.asarray(query_vec, dtype=float)
    signs = (planes @ q) > 0
    base_key = 0
    for j, s in enumerate(signs):
        base_key |= int(s) << j
    probes = {base_key}
    if probe_flips >= 1:
        for j in range(len(planes)):
            probes.add(base_key ^ (1 << j))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    cand = indexed.filter(F.col("bucket").isin(list(probes)))
    return (cand.select(F.col(id_col),
                        F.round(_cosine_col(vec_col, qlit), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))
