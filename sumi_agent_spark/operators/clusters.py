"""Duplicate clustering: connected components over near-dup pairs.

The pairwise near-dedup operators (``operators/dedup.py``) answer "is A
a near-copy of B"; what a training-mix builder often needs is the
CLUSTER view -- "which documents form one duplicate family, and which
single row represents it" (the FineWeb / SlimPajama convention: group
near-duplicates into components, keep one canonical representative per
component, record cluster sizes for analysis).  Pairwise keep-first
dropping is not transitive: with pairs (A,B) and (B,C) but not (A,C),
keep-first drops B and C survives alongside A even though they sit in
one duplicate family.  Component-level dedup closes that.

:func:`connected_components` is the core: iterative minimum-label
propagation with pointer jumping (each round a node adopts the smallest
label among itself, its neighbours, and its label's label -- the extra
label-of-label hop is path halving, which cuts convergence from
O(diameter) to O(log diameter) rounds; cf. the alternating/star
algorithms of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14).  Labels are monotonically non-increasing and bounded
below by the component minimum, so the fixpoint is exact, independent
of partitioning.

Scale shape: each round is two hash joins plus one map-side-combinable
``min`` aggregation, all keyed by node id -- no windows, no driver-side
graph.  The label frame is ``localCheckpoint``-ed every round: iterative
plans otherwise nest one join-tree per round and Catalyst optimize time
explodes (the measured lesson from the index probes -- minutes of
driver CPU; see ``minhash_index.py``).  The per-round driver traffic is
one scalar count.  Duplicate graphs in practice are star/clique shaped
around boilerplate (tiny diameter); the pointer jump keeps even
pathological chain graphs to ~log2(n) rounds, and ``max_iter`` turns
"silently not converged" into a loud error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """``(id, rep)`` for every node in ``edges``: ``rep`` is the
    smallest node id in the node's connected component (binary/natural
    ordering of the id type -- the same keep-first orientation the
    pairwise operators use).

    ``edges`` rows are undirected pairs in either orientation;
    duplicate edges and self-loops are tolerated (they only add
    redundant min candidates).  Raises ``RuntimeError`` after
    ``max_iter`` rounds without convergence rather than returning a
    partially-propagated labelling.
    """
    e = (edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
         .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
         .filter(F.col("x") != F.col("y")))
    sym = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    # edges are reused every round -- pin them once so each iteration
    # re-reads a materialized block instead of re-running the upstream
    # plan (which may contain UDF signature stages when composed with
    # the near-dup operators)
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("x").alias("id")).distinct()
              .withColumn("lbl", F.col("id"))
              .localCheckpoint(eager=True))
    for _ in range(int(max_iter)):
        nbr = (sym.join(labels.withColumnRenamed("id", "y"), "y")
               .select("x", "lbl")
               .withColumnRenamed("x", "id"))
        jump = (labels.withColumnRenamed("lbl", "j")
                .join(labels.withColumnRenamed("id", "j"), "j")
                .select("id", "lbl"))
        new_labels = (labels.select("id", "lbl")
                      .unionByName(nbr)
                      .unionByName(jump)
                      .groupBy("id").agg(F.min("lbl").alias("lbl"))
                      .localCheckpoint(eager=True))
        changed = (new_labels
                   .join(labels.withColumnRenamed("lbl", "old"), "id")
                   .filter(F.col("lbl") != F.col("old"))
                   .count())
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("lbl").alias("rep"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds -- "
        "the duplicate graph has a longer path structure than expected; "
        "raise max_iter")


def near_duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: int | None = None,
    shingle_k: int = 5,
    max_bucket_size: int = 1000,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Cluster view of near-duplication: every input row gains
    ``cluster_rep`` (the smallest ``id_col`` in its duplicate
    component; itself when unduplicated) and ``cluster_size`` (1 for
    singletons).  Component-level dedup is then one filter:
    ``result.filter(F.col(id_col) == F.col("cluster_rep"))`` keeps
    exactly one canonical row per duplicate family -- transitively,
    unlike pairwise keep-first.

    Pair discovery defaults to :func:`dedup.minhash_near_duplicates`
    with the given geometry; pass ``pairs`` (``id_a``/``id_b``
    columns) to cluster over pairs from any other source (SimHash,
    embedding cosine, an exact-Jaccard audit set).  Pairs may
    reference ids absent from ``df`` (e.g. rows already dropped by an
    earlier gate): components are computed over the full pair graph
    (absent nodes still CONNECT the family), but ``cluster_rep`` and
    ``cluster_size`` are then re-rooted to the nodes PRESENT in
    ``df`` -- so the canonical-representative filter always keeps
    exactly one live row per family instead of none.

    Scale: the pairs stage is the banded/capped LSH operator (never
    all-pairs); the component stage touches only nodes that APPEAR in
    pairs (duplicate families are a small fraction of a deduped-ish
    corpus), and the final attach is one left join from ``df`` keyed
    by ``id_col``."""
    if pairs is None:
        from .dedup import minhash_near_duplicates
        pairs = minhash_near_duplicates(
            df, id_col, text_col, threshold=threshold,
            n_hashes=n_hashes, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size)
    comp = connected_components(pairs, "id_a", "id_b")
    present = df.select(F.col(id_col).alias("id")).distinct()
    comp = comp.join(present, "id")
    reroot = (comp.groupBy("rep")
              .agg(F.min("id").alias("cluster_rep"),
                   F.count("*").alias("cluster_size")))
    attach = (comp.join(reroot, "rep")
              .select(F.col("id").alias(id_col),
                      "cluster_rep", "cluster_size"))
    return (df.join(attach, id_col, "left")
            .withColumn("cluster_rep",
                        F.coalesce(F.col("cluster_rep"), F.col(id_col)))
            .withColumn("cluster_size",
                        F.coalesce(F.col("cluster_size"), F.lit(1))
                        .cast("long")))
