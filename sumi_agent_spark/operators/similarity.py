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


_PAIRS_SCHEMA_DDL = "id_a long, id_b long, cos_sim double"


def _unit_rows(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    if len(m) == 0:
        return m.reshape(0, 0)
    return m / np.maximum(np.linalg.norm(m, axis=1), 1e-300)[:, None]


def cosine_pairs_blocked(
    df: DataFrame, threshold: float = 0.5, round_to: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_blocks: int = 8, chunk_elems: int = 1 << 22,
) -> DataFrame:
    """Exact all-pairs cosine similarity >= threshold, fully distributed.

    Block-both-sides matmul: every row gets a hash block id in
    ``[0, n_blocks)``; each of the ``n_blocks*(n_blocks+1)/2`` unordered
    block pairs ``(i, j), i <= j`` becomes one ``applyInPandas`` task that
    L2-normalizes its two blocks and runs one BLAS call (``A @ B.T``) per
    chunk, so no task materializes more than ``chunk_elems`` similarity
    cells at once.  Nothing is ever collected to the driver -- the only
    driver-side object is the tiny static block-pair list.  Exact (float64,
    no LSH), and ~2 orders of magnitude faster than evaluating interpreted
    ``zip_with``/``aggregate`` HOF chains per pair.

    Scale story: shuffle volume is ``n_blocks`` copies of the table (each
    row participates in ``n_blocks`` block pairs) and peak task memory is
    ``~2*n/n_blocks`` vectors, so at 100 TB you raise ``n_blocks`` until a
    block fits an executor (work stays the same O(n^2) BLAS flops, spread
    over ``O(n_blocks^2)`` independent tasks).  When a small reference set
    fits the driver, ``cosine_pairs_broadcast`` skips the shuffle; when
    lossy recall is acceptable, ``operators.dedup.embedding_near_duplicates``
    is the sub-quadratic path.

    Float caveat: pre-normalized BLAS summation can differ from a
    sequential dot/(|a||b|) fold in the last ~1e-15 relative ulps, so a
    cosine landing EXACTLY on a rounding/threshold boundary could round
    differently than a reference computed with another summation order --
    a measure-zero event for real-valued embeddings (verified identical to
    the HOF fold on the full benchmark tables), but not a bit-for-bit
    contract."""
    spark = df.sparkSession
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pairs = spark.createDataFrame(pair_rows, "pi int, pj int")

    base = (df.select(F.col(id_col).cast("long").alias("vid"), vec_col)
            .withColumn("blk", F.pmod(F.xxhash64("vid"),
                                      F.lit(n_blocks)).cast("int")))
    rep = base.join(F.broadcast(pairs),
                    (F.col("blk") == F.col("pi"))
                    | (F.col("blk") == F.col("pj")))

    def block_pair_sim(key, pdf):
        pi, pj = key
        in_a = pdf["blk"].to_numpy() == pi
        a_ids = pdf["vid"].to_numpy(dtype=np.int64)[in_a]
        a_unit = _unit_rows(pdf[in_a], vec_col)
        if pi == pj:
            b_ids, b_unit = a_ids, a_unit
        else:
            b_ids = pdf["vid"].to_numpy(dtype=np.int64)[~in_a]
            b_unit = _unit_rows(pdf[~in_a], vec_col)
        out = []
        if len(a_ids) and len(b_ids):
            chunk = max(1, chunk_elems // len(b_ids))
            for s in range(0, len(a_ids), chunk):
                sim = np.round(a_unit[s:s + chunk] @ b_unit.T, round_to)
                # diagonal blocks: strict upper triangle dedups the pair;
                # off-diagonal: every cross pair appears exactly once here,
                # orient it as (min, max) on emit
                keep = (sim >= threshold) & \
                    (a_ids[s:s + chunk, None] != b_ids[None, :])
                if pi == pj:
                    keep &= a_ids[s:s + chunk, None] < b_ids[None, :]
                ai, bj = np.nonzero(keep)
                if len(ai) == 0:
                    continue
                ia, ib = a_ids[s + ai], b_ids[bj]
                out.append(pd.DataFrame({
                    "id_a": np.minimum(ia, ib),
                    "id_b": np.maximum(ia, ib),
                    "cos_sim": sim[ai, bj],
                }))
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cos_sim": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    return rep.groupBy("pi", "pj").applyInPandas(block_pair_sim,
                                                 _PAIRS_SCHEMA_DDL)


def cosine_pairs_broadcast(
    df: DataFrame, threshold: float = 0.5, round_to: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    chunk_elems: int = 1 << 22, max_build_rows: int = 1_000_000,
) -> DataFrame:
    """Shuffle-free variant of :func:`cosine_pairs_blocked` for when one
    side is a bounded reference set: collect + L2-normalize it once
    (broadcast-join build-side footprint), then stream the table through
    ``mapInPandas`` with one BLAS call per chunk.  Refuses to collect more
    than ``max_build_rows`` rows -- above the cap use the blocked plan,
    which is byte-identical and never touches the driver."""
    import pyarrow  # noqa: F401  (mapInPandas requires Arrow)
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cos_sim", DoubleType()),
    ])

    rows = (df.select(F.col(id_col).cast("long"), vec_col)
            .limit(max_build_rows + 1).collect())
    if len(rows) > max_build_rows:
        raise ValueError(
            f"cosine_pairs_broadcast: build side exceeds max_build_rows="
            f"{max_build_rows}; use cosine_pairs_blocked (no driver collect)")
    if not rows:
        return df.sparkSession.createDataFrame([], out_schema)
    ids_b = np.array([r[0] for r in rows], dtype=np.int64)
    mat_b = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat_b, axis=1)
    unit_b = mat_b / np.maximum(norms, 1e-300)[:, None]
    bc = df.sparkSession.sparkContext.broadcast((ids_b, unit_b))
    chunk = max(1, chunk_elems // max(len(ids_b), 1))

    def block_sim(batches):
        b_ids, b_unit = bc.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(a_mat) == 0:
                continue
            a_unit = a_mat / np.maximum(
                np.linalg.norm(a_mat, axis=1), 1e-300)[:, None]
            for s in range(0, len(a_ids), chunk):
                sim = np.round(a_unit[s:s + chunk] @ b_unit.T, round_to)
                keep = (sim >= threshold) & (a_ids[s:s + chunk, None] < b_ids[None, :])
                ai, bj = np.nonzero(keep)
                if len(ai) == 0:
                    continue
                yield pd.DataFrame({
                    "id_a": a_ids[s + ai],
                    "id_b": b_ids[bj],
                    "cos_sim": sim[ai, bj],
                })

    return df.select(F.col(id_col).cast("long").alias(id_col), vec_col) \
        .mapInPandas(block_sim, out_schema)


# ─── IVF (inverted-file) ANN ───

def train_ivf_centroids(
    df: DataFrame, n_lists: int = 16, sample: int = 4096, iters: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = _SEED,
) -> np.ndarray:
    """Coarse quantizer: Lloyd k-means on a bounded deterministic sample.

    Training happens driver-side on ``sample`` vectors (ordered by id, so
    the sample -- and therefore the centroids -- are independent of
    partitioning; IVF quantizers are conventionally trained on a subset).
    Returns L2-normalized centroids (n_lists, dim): spherical k-means, the
    right geometry for cosine retrieval."""
    rows = (df.select(id_col, vec_col).orderBy(id_col).limit(sample)
            .collect())
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1), 1e-300)[:, None]
    rng = np.random.RandomState(seed)
    init_idx = rng.choice(len(X), size=min(n_lists, len(X)), replace=False)
    C = X[np.sort(init_idx)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-300)
    return C


def assign_ivf_lists(
    df: DataFrame, centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``list_id`` = argmax-cosine centroid.  At 100 TB the table is
    written partitioned by ``list_id`` so a query's n_probe lists prune to
    a handful of partitions (same deployment story as the LSH buckets)."""
    from pyspark.sql.types import IntegerType

    C = centroids

    @pandas_udf(IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1), 1e-300)[:, None]
        return pd.Series(np.argmax(m @ C.T, axis=1).astype(np.int32))

    return df.withColumn("list_id", nearest(F.col(vec_col)))


def ivf_topk(
    indexed: DataFrame, centroids: np.ndarray, query_vec: list[float],
    k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k scanning only the ``n_probe`` lists nearest the query."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = np.argsort(-(centroids @ qn))[:n_probe]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    cand = indexed.filter(F.col("list_id").isin([int(p) for p in probe]))
    return (cand.select(F.col(id_col),
                        F.round(_cosine_col(vec_col, qlit), 6).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))
            .limit(k))


def hyperplane_bucket_udf(dim: int, n_planes: int = 12):
    """vec -> int64 sign-bucket under fixed random hyperplanes."""
    rng = np.random.RandomState(_SEED)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
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
