"""Persisted MinHash signature index for incremental (cross-run) near-dedup.

The 100 TB operation is NOT "re-dedup the whole corpus every day" -- it is
"dedup today's 1-5 TB ingest slice against the existing corpus" (SCALE.md's
layout section).  This module persists the reusable halves of
``operators.dedup.minhash_near_duplicates`` so a new slice joins against
them instead of recomputing the corpus:

* ``bands/``    -- the LSH bucket rows ``(doc_id, band, band_key)``,
  partitioned by ``band`` so the banded join co-locates by bucket files;
* ``shingles/`` -- each doc's unique shingle-hash array, the verify-stage
  input (exact Jaccard runs JVM-side via ``array_intersect`` exactly like
  the batch operator, with no access to the original corpus text);
* ``meta/``     -- one row pinning the geometry (n_hashes, bands,
  shingle_k, threshold).  Geometry is part of the index identity: a slice
  signed with different hashes can never match the persisted buckets, so a
  mismatch raises instead of silently returning zero pairs.

Incremental candidate generation joins NEW x (OLD union NEW) -- new-vs-new
plus new-vs-corpus pairs, never old-vs-old (the corpus was already deduped
when it entered the index).  Bucket capping counts the FULL bucket (old +
new rows): a boilerplate bucket is hot regardless of which run its rows
arrived in, and using the full size keeps the incremental run's candidate
set exactly equal to what a full-corpus run would generate for the same
pairs (proven in tests/test_minhash_index.py).

Storage cost, stated honestly: ``shingles/`` stores one 8-byte hash per
unique k-gram, i.e. roughly ``8 x n_chars`` per document -- a multiple of
the compressed text size.  That is the price of EXACT verification without
re-reading corpus text; deployments that keep the corpus queryable can
instead drop ``shingles/`` and re-derive the verify arrays from the corpus
table (same ``make_shingle_udf``), trading a text re-scan of candidate docs
for the storage.  The signatures themselves (n_hashes x 8 B) are NOT
stored: ``bands/`` is the only part the join needs, and it is smaller.

Determinism: the hash family derives from the same fixed seed as the batch
operator, so signatures computed in different runs are bit-identical.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _banded,
    _observe_capping,
    bucket_cap_stats,
    make_minhash_udf,
    make_shingle_udf,
    make_sig_shingle_udf,
    resolve_bands,
)


def _marker_committed(spark: SparkSession, path: str) -> bool:
    """True iff the parquet directory at ``path`` was fully committed
    (its ``_SUCCESS`` marker exists).  Uses the Hadoop FileSystem API so
    the check works on whatever store ``index_path`` lives on.

    DEPLOYMENT REQUIREMENT: epoch commits are defined by ``_SUCCESS``,
    so index paths must keep
    ``mapreduce.fileoutputcommitter.marksuccessfuljobs=true`` (the
    default).  A deployment that disables success markers (some
    object-store committer setups) would make every committed reindex
    epoch resolve as absent -- readers would silently serve stale
    epoch-0 signatures, the exact failure the epoch machinery exists to
    prevent.  :func:`_assert_marker_visible` turns that misconfiguration
    into a loud error at reindex time; falling back to
    directory-existence here is NOT an option (a half-written marker
    directory would then count as committed, reopening the crash
    window)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _assert_marker_visible(spark: SparkSession, index_path: str,
                           epoch: int) -> None:
    """Post-commit guard run by every reindex: the marker it just wrote
    must be visible through :func:`_marker_committed`, or the deployment
    has success markers disabled and every epoch would silently resolve
    as absent (readers serving stale signatures forever).  One FS check,
    turning a configuration hazard into an immediate loud error."""
    if not _marker_committed(spark, f"{index_path}/meta_e{epoch}"):
        raise RuntimeError(
            f"epoch marker {index_path}/meta_e{epoch} was written but its "
            f"_SUCCESS file is not visible -- this store/committer has "
            f"success markers disabled "
            f"(mapreduce.fileoutputcommitter.marksuccessfuljobs=false?), "
            f"which would make every reindex epoch invisible to readers; "
            f"re-enable success markers for index paths")


def _live_epoch(spark: SparkSession, index_path: str, start: int = 0) -> int:
    """Resolve an index's live reindex epoch: the highest CONTIGUOUS
    committed ``meta_e{N}`` marker at or above ``start``.  Markers are
    contiguous by construction (epoch N+1 is only ever written by a
    reindex that read live epoch N), so the probe terminates at the
    first gap.  ``start`` covers pre-marker indexes that flipped an
    ``epoch`` field in base meta.  The ONE implementation of the
    commitment-resolution rule, shared by every index's ``_read_meta``."""
    live = start
    while _marker_committed(spark, f"{index_path}/meta_e{live + 1}"):
        live += 1
    return live


def _delete_stale_epoch_markers(spark: SparkSession, index_path: str) -> None:
    """Remove a PREVIOUS index's commit state at this path -- the base
    ``meta/`` create marker FIRST, then the leftover ``meta_e*`` epoch
    markers.  Runs first in every create: the epoch markers are
    append-only (see :func:`_read_meta`), so a fresh index written over
    an old reindexed one would otherwise inherit the old markers and
    resolve a live epoch whose ``bands_eN`` dirs belong to the dead
    index -- silent corruption.  Deletion ORDER is load-bearing: base
    meta goes first so that a crash anywhere inside the create leaves
    the old index either fully intact (crash before any delete) or
    LOUDLY unreadable (meta gone -> ``_read_meta`` raises and the create
    re-runs) -- never readable-but-silently-reverted to its stale
    epoch-0 signatures, which is what deleting only the markers first
    would produce."""
    jvm = spark._jvm
    fs = (jvm.org.apache.hadoop.fs.Path(index_path)
          .getFileSystem(spark._jsc.hadoopConfiguration()))
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{index_path}/meta"), True)
    glob = jvm.org.apache.hadoop.fs.Path(f"{index_path}/meta_e*")
    for status in fs.globStatus(glob) or []:
        fs.delete(status.getPath(), True)


def _read_meta(spark: SparkSession, index_path: str,
               expect_granularity: Optional[str] = "doc") -> dict:
    row = spark.read.parquet(f"{index_path}/meta").first()
    meta = {k: row[k] for k in
            ("n_hashes", "bands", "shingle_k", "threshold")}
    granularity = row.asDict().get("granularity", "doc")
    meta["granularity"] = granularity
    if expect_granularity is not None and granularity != expect_granularity:
        raise ValueError(
            f"minhash index at {index_path} has granularity "
            f"{granularity!r}; this operator requires "
            f"{expect_granularity!r} (doc-level and group-level indexes "
            f"store different shingle layouts and cannot be mixed)")
    # Live reindex epoch.  The base ``meta/`` directory is written once at
    # create and NEVER rewritten (a parquet overwrite is delete-then-write,
    # so a crash mid-flip would destroy the index's create marker); each
    # reindex instead commits an APPEND-ONLY marker directory
    # ``meta_e{N}`` and the live epoch resolves to the highest contiguous
    # committed marker.  Markers are contiguous by construction (epoch
    # N+1 is only ever written by a reindex that read live epoch N), so
    # the probe loop terminates at the first gap.  Pre-marker indexes
    # that flipped an ``epoch`` field in base meta still resolve
    # correctly: probing starts from that value.
    meta["epoch"] = _live_epoch(
        spark, index_path, int(row.asDict().get("epoch", 0) or 0))
    return meta


def _committed_doc_ids(spark: SparkSession, index_path: str,
                       live: Optional[int] = None) -> DataFrame:
    """One-column (``doc_id``) DataFrame of docs COMMITTED to the index
    at ANY live epoch.

    Reads the ``bands`` stores, which every write path writes LAST -- so a
    doc listed here is guaranteed to have its shingle rows present too,
    and a doc whose append crashed half-way (shingles written, bands not)
    correctly reads as absent.  Column-pruned scan of one key column."""
    if live is None:
        live = _read_meta(spark, index_path)["epoch"]
    return (_read_epoched(spark, index_path, "bands", live, ["doc_id"])
            .select("doc_id").distinct())


def _unique_doc_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, text) with duplicate keys collapsed deterministically.

    The index stores exactly one shingle array / signature per key; a
    caller that skipped exact dedup (``run_pipeline`` with
    ``dedup=False``) can feed duplicate ``(conv_id, turn_idx)`` keys,
    which would write duplicate shingle/band rows -- multiplying every
    later slice's verify-join rows and emitting duplicated pairs.  The
    winner is ``min(text)`` per key (deterministic under retries, unlike
    ``dropDuplicates``); one hash-agg shuffle on the key, paid only on
    write/append, never on the incremental read path."""
    return (df.groupBy(F.col(id_col).alias("doc_id"))
            .agg(F.min(F.col(text_col)).alias("text")))


def write_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: Optional[int] = None,
    shingle_k: int = 5,
) -> dict:
    """Create a MinHash index at ``index_path`` from a (deduped) corpus.

    Computes signatures once and writes the per-doc shingle arrays, then
    the banded LSH rows (partitioned by band), then the geometry meta --
    in that order, so readers can treat ``meta`` as the create-commit
    marker and ``bands`` as the per-doc commit marker (see
    :func:`_committed_doc_ids`).  Returns the pinned geometry.  Overwrites
    any existing index at the path.  Duplicate keys in ``df`` collapse to
    one row (min text per key -- see :func:`_unique_doc_rows`)."""
    bands = resolve_bands(threshold, n_hashes, bands)
    spark = df.sparkSession
    _delete_stale_epoch_markers(spark, index_path)
    # ONE Arrow pass computes signatures and shingle arrays together
    # (make_sig_shingle_udf), materialized once -- the two store writes
    # then read cached narrow rows instead of each re-running Python over
    # the full corpus text (r7 optimization; values are bit-identical)
    sig_sh = make_sig_shingle_udf(n_hashes, shingle_k)
    base = _unique_doc_rows(df, id_col, text_col)
    ss = (base.select("doc_id", sig_sh("text").alias("_ss"))
          .select("doc_id", F.col("_ss.sig").alias("sig"),
                  F.col("_ss.sh").alias("sh"))
          .localCheckpoint(eager=False))
    (ss.select("doc_id", "sh")
     .write.mode("overwrite").parquet(f"{index_path}/shingles"))
    (_banded(ss.select("doc_id", "sig"), "doc_id", bands, key="md5")
     .write.mode("overwrite").partitionBy("band")
     .parquet(f"{index_path}/bands"))
    meta = {"n_hashes": n_hashes, "bands": bands, "shingle_k": shingle_k,
            "threshold": float(threshold), "granularity": "doc"}
    spark.createDataFrame([meta]).write.mode("overwrite").parquet(
        f"{index_path}/meta")
    return meta


def append_to_minhash_index(
    new_df: DataFrame, id_col: str, text_col: str, index_path: str,
) -> None:
    """Append a slice's shingle arrays + band rows to an existing index,
    idempotently: each store independently anti-joins the keys it already
    holds, so re-running a completed append adds nothing, and re-running
    an append that crashed BETWEEN the two writes (shingles present, bands
    absent) completes it to an exactly-once state instead of duplicating
    -- shingles are written first, bands last, so ``bands`` membership
    certifies a doc's append fully committed.

    Call AFTER consuming the incremental pair result for the slice (the
    pair computation must see the index in its pre-slice state; Spark's
    lazy evaluation would otherwise race the append against the read).
    Geometry comes from the index meta, so appends can never drift.
    Duplicate slice keys collapse to one row (:func:`_unique_doc_rows`).
    Membership spans ALL live epochs (a doc can exist only in a reindex
    epoch); new docs append into the BASE stores -- per-doc max-epoch
    resolution at read time makes that correct regardless of live epoch."""
    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path)
    live = meta["epoch"]
    minhash = make_minhash_udf(meta["n_hashes"], meta["shingle_k"])
    shingles = make_shingle_udf(meta["shingle_k"])
    base = _unique_doc_rows(new_df, id_col, text_col)
    sh_existing = (_read_epoched(spark, index_path, "shingles", live,
                                 ["doc_id"])
                   .select("doc_id").distinct())
    (base.join(sh_existing, "doc_id", "left_anti")
     .select("doc_id", shingles("text").alias("sh"))
     .write.mode("append").parquet(f"{index_path}/shingles"))
    bd_existing = _committed_doc_ids(spark, index_path, live)
    sig = (base.join(bd_existing, "doc_id", "left_anti")
           .select("doc_id", minhash("text").alias("sig")))
    (_banded(sig, "doc_id", meta["bands"], key="md5")
     .write.mode("append").partitionBy("band")
     .parquet(f"{index_path}/bands"))


def minhash_near_duplicates_incremental(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    max_bucket_size: int = 1000,
    observation=None,
) -> DataFrame:
    """Near-duplicate pairs touching the new slice, against index + slice.

    Returns ``(id_a, id_b, jaccard, new_a, new_b)`` with
    ``jaccard >= threshold`` (the index's pinned threshold): every pair has
    at least one side in ``new_df`` (old-vs-old is never recomputed), ids
    are canonically ordered (``id_a < id_b``), and the ``new_*`` flags tell
    a dedup policy which side is droppable -- a corpus doc can never be
    dropped by a later slice, so "corpus wins" means dropping
    ``id_a if new_a and not new_b else id_b``... precisely: the new side of
    a mixed pair, the later key of a new-new pair.

    Exactness: same hash family (fixed seed), same band geometry (from
    meta), bucket sizes counted over the FULL bucket (index + slice rows),
    and the same JVM-side exact-Jaccard verify as the batch operator --
    so the output equals a full-corpus ``minhash_near_duplicates`` run
    restricted to pairs with at least one NEW slice doc (tested).

    A slice doc whose key is ALREADY committed to the index is corpus, not
    new: it is filtered from the slice side up front (one anti-join
    against the column-pruned committed-key set).  Without the filter, a
    re-run of a completed slice would count each such doc twice in every
    bucket -- shifting the capping threshold relative to the original run
    -- and emit the same pair twice with conflicting ``new_*`` flags.

    Scale shape: the slice's band rows shuffle-join against the index's
    band partitions; candidate verify joins against the shingle store.
    Nothing scans corpus text, nothing is collected to the driver, and the
    per-run cost is O(slice + matched buckets), not O(corpus)."""
    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path)
    live = meta["epoch"]
    minhash = make_minhash_udf(meta["n_hashes"], meta["shingle_k"])
    shingles = make_shingle_udf(meta["shingle_k"])
    threshold = meta["threshold"]

    from ..parallel import fan_out

    # fan_out: a single-row-group slice scan would serialize the
    # signature UDF; localCheckpoint: base feeds the signature pass, the
    # candidate-restricted verify shingles AND the store anti-join --
    # three consumers that would each re-scan the slice and re-run the
    # committed-key anti-join (a band-store read) per reference
    base = (fan_out(new_df.select(F.col(id_col).alias("doc_id"),
                                  F.col(text_col).alias("text")))
            .join(_committed_doc_ids(spark, index_path, live), "doc_id",
                  "left_anti")
            .localCheckpoint(eager=False))
    sig = base.select("doc_id", minhash("text").alias("sig"))
    new_banded = _banded(sig, "doc_id", meta["bands"], key="md5") \
        .withColumn("is_new", F.lit(True))
    # epoch resolution BEFORE the capping window: a reindexed doc's stale
    # epoch-0 band rows must neither inflate bucket sizes nor generate
    # candidates (free at epoch 0 -- see _resolve_latest)
    old_banded = (_resolve_latest(
                      _read_epoched(spark, index_path, "bands", live,
                                    ["doc_id", "band", "band_key"]),
                      "doc_id", live)
                  .withColumn("is_new", F.lit(False)))
    # the capping window shuffles index band rows on (band, band_key) --
    # the SAME partitioning the candidate self-join needs, so the exchange
    # is computed once and reused: the incremental run pays one narrow-row
    # shuffle of the band store per slice, not two.  (Restricting to
    # slice-touched buckets via a semi-join does not help: a shuffled
    # semi-join costs the same corpus exchange, a broadcast one caps the
    # slice size, and a shared-UDF build side trips Spark's
    # zip-partitions assertion -- measured, r4.)
    all_banded = old_banded.unionByName(new_banded)

    from pyspark.sql.window import Window
    # cap on the FULL bucket size (old + new): hotness is a property of the
    # bucket, not of which run contributed the rows -- and full-bucket
    # counting is what makes incremental == full-run-restricted exact
    sized = all_banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "band_key")))
    if observation is not None:
        sized = _observe_capping(sized, observation, max_bucket_size)
    capped = sized.filter(F.col("bucket_n") <= max_bucket_size) \
        .drop("bucket_n")
    # left side: slice rows only.  localCheckpoint: pairs feeds both
    # candidate-restriction branches and the final verify join -- without
    # it each reference recomputes the banded window + self-join
    pairs = _canonical_candidate_pairs(
        capped.filter("is_new"), capped, "doc_id", ["band", "band_key"]) \
        .localCheckpoint(eager=False)

    # verify inputs are semi-join-restricted to candidate ids BEFORE the
    # union: without the restriction every incremental run would shuffle
    # the O(corpus)-sized shingle store (the index's largest artifact,
    # ~8 B per corpus char) into the pair join, contradicting the
    # O(slice + matched buckets) cost contract (the grouped and embedding
    # variants already restrict; this path was the straggler).
    cand = (pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct())
    new_sh = (base.join(cand, "doc_id", "left_semi")
              .select("doc_id", shingles("text").alias("sh")))
    # anti-join the store against the slice's keys: a crashed append may
    # have left slice docs' shingle arrays in the store without their
    # bands (phantoms).  Values would survive (the phantom array equals
    # the fresh one), but each affected pair would emit twice.
    # candidate-restrict FIRST, then resolve epochs: the per-doc window
    # runs over candidate rows only, never the O(corpus) store
    old_sh = (_resolve_latest(
                  _read_epoched(spark, index_path, "shingles", live,
                                ["doc_id", "sh"])
                  .join(cand, "doc_id", "left_semi"),
                  "doc_id", live)
              .join(base.select("doc_id"), "doc_id", "left_anti"))
    # candidate-restricted, so bounded: materialize once for the size
    # prune + both verify sides
    all_sh = old_sh.unionByName(new_sh).localCheckpoint(eager=False)
    from .dedup import _size_prefiltered_pairs
    pairs = _size_prefiltered_pairs(
        pairs, all_sh.select("doc_id", F.size("sh").alias("_n")), threshold)
    sa = all_sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = all_sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        _array_jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
                    "new_a", "new_b"))


def minhash_index_bucket_audit(
    new_df: DataFrame, id_col: str, text_col: str, index_path: str,
    max_bucket_size: int = 1000,
) -> dict:
    """Exact capping recount for an incremental run (index + slice rows).

    The observe-based counter on
    :func:`minhash_near_duplicates_incremental` is free but unavailable
    when the run's output is completely empty (Spark prunes the observed
    subtree -- see ``operators.dedup._observe_capping``); this recomputes
    the bucket sizes over the SAME old-union-new row set and returns exact
    {n_capped_rows, n_capped_buckets, max_bucket_n}.  One extra banded
    scan of slice + index -- an audit tool, not the hot path."""
    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path)
    live = meta["epoch"]
    minhash = make_minhash_udf(meta["n_hashes"], meta["shingle_k"])
    # same already-committed filter as the pair computation, so the audit
    # recounts exactly the buckets that run saw
    sig = (new_df.select(F.col(id_col).alias("doc_id"),
                         F.col(text_col).alias("text"))
           .join(_committed_doc_ids(spark, index_path, live), "doc_id",
                 "left_anti")
           .select("doc_id", minhash("text").alias("sig")))
    new_banded = _banded(sig, "doc_id", meta["bands"], key="md5")
    old_banded = _resolve_latest(
        _read_epoched(spark, index_path, "bands", live,
                      ["doc_id", "band", "band_key"]),
        "doc_id", live)
    sizes = (old_banded.unionByName(new_banded)
             .groupBy("band", "band_key").agg(F.count("*").alias("n")))
    return bucket_cap_stats(sizes, max_bucket_size)


def reindex_docs(
    changed_df: DataFrame, id_col: str, text_col: str, index_path: str,
) -> dict:
    """Rebuild CHANGED docs of a doc-granularity index into a fresh epoch.

    The doc analog of :func:`reindex_groups`, for re-exports whose TEXT
    changed (a re-crawl replaced the page, a transcript turn was
    redacted upstream): append-only stores cannot update a committed
    doc's signature in place, so without this the stale signature
    anchors all future near-dedup and the NEW content escapes it
    silently (the pipeline's ``n_preindexed_changed`` counter makes the
    case visible; this operator fixes it).  ``changed_df`` carries the
    changed docs' CURRENT text, one row per key (duplicates collapse,
    :func:`_unique_doc_rows`); shingle arrays and band rows are
    recomputed for exactly those ids, written to ``shingles_e{N+1}``
    then ``bands_e{N+1}`` (overwrite mode -- a crashed attempt's orphan
    dirs are replaced), and the epoch is committed LAST by the
    append-only ``meta_e{N+1}`` marker.  Readers resolve per-doc
    latest-epoch exactly like the grouped index (free at epoch 0).
    Note this updates the INDEX only: replacing the doc's already-written
    pipeline OUTPUT rows is the caller's upsert (Iceberg MERGE in the
    nominal deployment).  O(changed docs), never O(corpus)."""
    spark = changed_df.sparkSession
    meta = _read_meta(spark, index_path)
    new_epoch = meta["epoch"] + 1
    # one shared signature+shingle pass, as in write_minhash_index
    sig_sh = make_sig_shingle_udf(meta["n_hashes"], meta["shingle_k"])
    base = _unique_doc_rows(changed_df, id_col, text_col)
    ss = (base.select("doc_id", sig_sh("text").alias("_ss"))
          .select("doc_id", F.col("_ss.sig").alias("sig"),
                  F.col("_ss.sh").alias("sh"))
          .localCheckpoint(eager=False))
    (ss.select("doc_id", "sh")
     .write.mode("overwrite")
     .parquet(_epoch_path(index_path, "shingles", new_epoch)))
    (_banded(ss.select("doc_id", "sig"), "doc_id", meta["bands"], key="md5")
     .write.mode("overwrite").partitionBy("band")
     .parquet(_epoch_path(index_path, "bands", new_epoch)))
    meta_new = {"n_hashes": meta["n_hashes"], "bands": meta["bands"],
                "shingle_k": meta["shingle_k"],
                "threshold": float(meta["threshold"]),
                "granularity": "doc", "epoch": new_epoch}
    spark.createDataFrame([meta_new]).write.mode("overwrite").parquet(
        f"{index_path}/meta_e{new_epoch}")
    _assert_marker_visible(spark, index_path, new_epoch)
    return meta_new


def changed_preindexed_ids(
    new_df: DataFrame, id_col: str, text_col: str, index_path: str,
) -> DataFrame:
    """Committed slice keys whose CURRENT text differs from what the index
    signed -- the re-exports that need :func:`reindex_docs`.

    The incremental read path treats any already-committed key as corpus
    and drops it from the slice; that is correct for identical re-exports
    (a completed slice re-run) but SILENT for changed ones (a re-crawl
    replaced the page): the stale signature keeps anchoring near-dedup
    while the new content escapes it.  This probe makes the distinction
    visible: it re-shingles exactly the preindexed slice rows and compares
    against the stored shingle arrays (both sides are sorted unique hash
    arrays from the same UDF, so array equality IS text-set equality up to
    61-bit hash collisions).  Returns a one-column (``doc_id``) DataFrame.
    Cost: O(preindexed rows) -- the store scan is semi-join-restricted to
    the preindexed keys, never O(corpus).

    Implementation note shared with :func:`changed_preindexed_gids`: the
    comparison is a JOIN, never a union of two ``exceptAll`` branches --
    Spark's plan deduplication mis-rewrites
    ``a.exceptAll(b).union(b.exceptAll(a))`` when the branches share
    subplans (observed: each branch alone counts 0, the union counts
    hundreds), while self-join attribute dedup is well-trodden."""
    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path)
    live = meta["epoch"]
    shingles = make_shingle_udf(meta["shingle_k"])
    base = _unique_doc_rows(new_df, id_col, text_col)
    pre = base.join(_committed_doc_ids(spark, index_path, live),
                    "doc_id", "left_semi")
    fresh = pre.select("doc_id", shingles("text").alias("sh_new"))
    stored = _resolve_latest(
        _read_epoched(spark, index_path, "shingles", live, ["doc_id", "sh"])
        .join(pre.select("doc_id"), "doc_id", "left_semi"),
        "doc_id", live)
    return (fresh.join(stored, "doc_id")
            .filter(F.col("sh_new") != F.col("sh"))
            .select("doc_id"))


def probe_index_near_duplicates(
    probe_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs between probe rows' CURRENT text and the rest
    of the committed corpus -- the replacement-content check for changed
    re-exports.

    :func:`minhash_near_duplicates_incremental` anti-joins committed keys
    out of the slice (a completed re-run must not pair with itself), so a
    CHANGED re-export's new text is never checked there: a re-crawl that
    rewrites doc B into a near-copy of committed doc A would sail into the
    corpus as B's replacement.  This operator closes that hole.  Semantics:

    * probe keys are NOT excluded for being committed -- that is the
      point -- but a probe key's OWN stored (old) content is excluded
      entirely: it is about to be replaced by a reindex, so a replacement
      resembling its predecessor (the common case: a small edit) is not a
      duplicate, and neither is a replacement resembling ANOTHER probe
      key's dying old content;
    * probe-vs-probe pairs compare both keys' NEW text (two re-exports
      rewritten into copies of each other are still duplicates);
    * output matches the incremental operator's shape
      ``(id_a, id_b, jaccard, new_a, new_b)`` with ``new_* = is-probe``,
      so :func:`incremental_drop_keys` applies the same policy: the probe
      side of a mixed pair drops (surviving corpus wins), the later key
      of a probe-probe pair drops (keep-first);
    * predecessor-shadow carve-out: a mixed pair is VOID when the corpus
      doc's stored content itself near-duplicates the probe key's own
      stored (old) content -- that corpus doc is the predecessor's
      shadow (typically an earlier replacement deleted for duplicating
      this key, then reindexed for convergence), and matching it means
      the replacement resembles this key's own history, which is never
      duplication.

    Scale shape: the probe set (changed re-exports of one slice) is tiny,
    so its banded rows are BROADCAST; the corpus band store is scanned
    with a broadcast semi-join restriction to probe-touched buckets and
    never shuffled O(corpus) -- the capping window runs over matched
    buckets only, still counting TRUE full-bucket sizes (the restriction
    is by bucket key, so no row of a matched bucket is lost).  Verify
    reads the shingle store restricted to candidate ids, epoch-resolved;
    probe-side shingles come from the probe text.  O(probe + matched
    buckets), never O(corpus).

    Plan shape: the bounded intermediates (``capped``, ``pairs``,
    ``all_sh``) are eagerly ``localCheckpoint``-ed -- each is referenced
    2-3x downstream and the verify + shadow tree otherwise multiplies
    their window/UDF/epoch-read subtrees into a plan Catalyst optimizes
    for minutes (see :func:`probe_grouped_index_near_duplicates` for the
    full rationale and the executor-loss trade)."""
    spark = probe_df.sparkSession
    meta = _read_meta(spark, index_path)
    live = meta["epoch"]
    minhash = make_minhash_udf(meta["n_hashes"], meta["shingle_k"])
    shingles = make_shingle_udf(meta["shingle_k"])
    threshold = meta["threshold"]

    base = _unique_doc_rows(probe_df, id_col, text_col)
    sig = base.select("doc_id", minhash("text").alias("sig"))
    probe_banded = (_banded(sig, "doc_id", meta["bands"], key="md5")
                    .withColumn("is_new", F.lit(True)))
    # corpus rows of probe keys are the dying old content: excluded before
    # bucketing so they neither pair nor inflate bucket sizes (the
    # replacement takes their place in the very same run)
    old_banded = (_resolve_latest_bucket_restricted(
                      _read_epoched(spark, index_path, "bands", live,
                                    ["doc_id", "band", "band_key"]),
                      "doc_id", live,
                      probe_banded.select("band", "band_key").distinct(),
                      ["band", "band_key"])
                  .join(base.select("doc_id"), "doc_id", "left_anti")
                  .withColumn("is_new", F.lit(False)))
    from pyspark.sql.window import Window
    all_banded = old_banded.unionByName(probe_banded)
    sized = all_banded.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band", "band_key")))
    capped = (sized.filter(F.col("bucket_n") <= max_bucket_size)
              .drop("bucket_n")
              .localCheckpoint())
    pairs = (_canonical_candidate_pairs(
                 capped.filter("is_new"), capped, "doc_id",
                 ["band", "band_key"])
             .localCheckpoint())
    cand = (pairs.select(F.col("id_a").alias("doc_id"))
            .union(pairs.select(F.col("id_b").alias("doc_id")))
            .distinct())
    new_sh = (base.join(cand, "doc_id", "left_semi")
              .select("doc_id", shingles("text").alias("sh")))
    # probe keys resolve to their NEW shingles (the store rows are the
    # content being replaced), exactly as the incremental op's slice-wins
    # rule; candidate-restrict before epoch resolution, as everywhere
    old_sh = (_resolve_latest(
                  _read_epoched(spark, index_path, "shingles", live,
                                ["doc_id", "sh"])
                  .join(cand, "doc_id", "left_semi"),
                  "doc_id", live)
              .join(base.select("doc_id"), "doc_id", "left_anti"))
    all_sh = old_sh.unionByName(new_sh).localCheckpoint()
    sa = all_sh.select(F.col("doc_id").alias("id_a"),
                       F.col("sh").alias("sh_a"))
    sb = all_sh.select(F.col("doc_id").alias("id_b"),
                       F.col("sh").alias("sh_b"))
    verified = (pairs.join(sa, "id_a").join(sb, "id_b")
                .withColumn("jaccard",
                            _array_jaccard(F.col("sh_a"), F.col("sh_b")))
                .filter(F.col("jaccard") >= threshold))
    # Predecessor-shadow carve-out (see _filter_predecessor_shadow): a
    # corpus doc matching only the probe key's own stored history --
    # typically an earlier replacement deleted for duplicating this key,
    # then reindexed for convergence (the pipeline reindexes
    # delete-action replacements too) -- must not void the replacement.
    probe_old_sh = (_resolve_latest(
                        _read_epoched(spark, index_path, "shingles", live,
                                      ["doc_id", "sh"])
                        .join(base.select("doc_id"), "doc_id", "left_semi"),
                        "doc_id", live)
                    .select(F.col("doc_id").alias("_pid"),
                            F.col("sh").alias("sh_old")))
    return _filter_predecessor_shadow(
        verified, probe_old_sh, "sh_old", "sh_a", "sh_b",
        _array_jaccard, threshold, "jaccard")


# ─── Group-granularity (conversation) index ───
#
# Same layout contract as the doc index (shingles first, bands last = the
# commit marker, meta = create marker), with two differences pinned in
# meta as granularity="group":
#
# * ``bands/`` keys are GROUP ids and band keys come from the group's
#   union-set signature (elementwise unsigned min over member rows --
#   ``dedup._group_signatures``);
# * ``shingles/`` stores EXPLODED ``(doc_id, sh)`` rows, one per unique
#   shingle per group, never a per-group array: a million-turn
#   conversation must not materialize as one unbounded array anywhere,
#   and the exact-Jaccard verify runs as scalar-row joins + counts
#   exactly like ``minhash_near_duplicates_grouped``.
#
# Semantics: a GROUP is closed per slice.  A group id already committed
# to the index is corpus and a later slice's rows for it are ignored
# (filtered, like re-ingested docs) -- the right model for transcript
# dumps where a conversation is complete when exported.  A conversation
# that DOES grow (a later dump re-exports it with new turns) is handled
# by EPOCH-VERSIONED REINDEXING (:func:`reindex_groups`): growing a
# committed conversation changes its signature, which append-only stores
# cannot express in place, so the rebuilt groups are written to fresh
# ``shingles_e{N}/`` + ``bands_e{N}/`` directories and the epoch is
# committed LAST by an APPEND-ONLY marker directory ``meta_e{N}`` (the
# same commit-marker discipline as everything else here, without ever
# rewriting the base ``meta/`` create marker -- a parquet overwrite is
# delete-then-write and a crash mid-rewrite would leave the index
# unreadable).  Readers resolve live = highest contiguous committed
# marker, union epochs 0..live and keep each group's rows from the
# HIGHEST epoch that contains it, so a rebuilt group's stale epoch-0
# band rows can never generate candidates.  A crash between the epoch
# writes and the marker commit leaves the old epoch live, and a re-run
# overwrites the orphaned directories idempotently.
# Cost, stated honestly: an index that has never been reindexed
# (epoch 0) reads exactly as before -- zero extra shuffles; once epochs
# exist, readers pay one additional narrow-row shuffle (a per-gid
# max-epoch window over the band store, and over the candidate-restricted
# shingle rows) per run, and stale epochs accrete until a compaction
# rewrite (= a fresh write_grouped_minhash_index from the resolved
# state).


def _group_shingle_rows(df: DataFrame, group_col: str, text_col: str,
                        shingle_k: int) -> DataFrame:
    """Exploded unique (doc_id, sh) rows per group."""
    shingles = make_shingle_udf(shingle_k)
    return (df.select(F.col(group_col).alias("doc_id"),
                      F.col(text_col).alias("text"))
            .select("doc_id", F.explode(shingles("text")).alias("sh"))
            .distinct())


def _epoch_path(index_path: str, sub: str, epoch: int) -> str:
    """Directory of one epoch of a grouped store: epoch 0 is the base
    ``bands/``/``shingles/`` directory (pre-epoch indexes read
    unchanged), epoch N >= 1 is ``bands_eN/``/``shingles_eN/``."""
    return (f"{index_path}/{sub}" if epoch == 0
            else f"{index_path}/{sub}_e{epoch}")


def _read_epoched(spark: SparkSession, index_path: str, sub: str,
                  live: int, cols: list[str]) -> DataFrame:
    """Union of a grouped store's epochs 0..live with an ``_epoch``
    column.  Directories beyond ``live`` (a crashed reindex that never
    flipped meta) are never read -- invisibility by construction."""
    out = None
    for e in range(live + 1):
        part = (spark.read.parquet(_epoch_path(index_path, sub, e))
                .select(*cols).withColumn("_epoch", F.lit(e)))
        out = part if out is None else out.unionByName(part)
    return out


def _resolve_latest(rows: DataFrame, key_col: str, live: int) -> DataFrame:
    """Keep each key's rows from the highest epoch that contains it; a
    never-reindexed index (live == 0) short-circuits to a free column
    drop.  One narrow-row shuffle on the key when epochs exist."""
    if live == 0:
        return rows.drop("_epoch")
    from pyspark.sql.window import Window
    w = Window.partitionBy(key_col)
    return (rows.withColumn("_emax", F.max("_epoch").over(w))
            .filter(F.col("_epoch") == F.col("_emax"))
            .drop("_emax", "_epoch"))


def _filter_predecessor_shadow(
    verified: DataFrame, probe_old: DataFrame, old_col: str,
    val_a: str, val_b: str, sim_fn, threshold: float, score_col: str,
) -> DataFrame:
    """Predecessor-shadow carve-out shared by the doc and embedding
    probes: a MIXED verified pair is void when the corpus side's stored
    value near-duplicates the probe key's OWN stored (old) value --
    matching one's predecessor's shadow is never duplication.
    Uncommitted probes (NULL old value, from the left join against
    ``probe_old`` keyed ``_pid``) are never carved; probe-probe pairs
    are never carved.  ``sim_fn(corpus_val, old_val)`` supplies the
    similarity (array Jaccard / cosine); the surviving rows project the
    standard ``(id_a, id_b, <score_col>, new_a, new_b)`` shape."""
    mixed = F.col("new_a") != F.col("new_b")
    v = (verified
         .withColumn("_pid", F.when(F.col("new_a"), F.col("id_a"))
                              .otherwise(F.col("id_b")))
         .withColumn("_cval", F.when(F.col("new_a"), F.col(val_b))
                               .otherwise(F.col(val_a)))
         .join(probe_old, "_pid", "left"))
    # coalesce: sim_fn can yield NULL (cosine of a zero-norm stored old
    # vector is 0/0), and filter(~NULL) would silently drop the verified
    # pair -- a NULL similarity must never void a real duplicate (r6
    # ADVICE)
    shadow = F.coalesce(
        mixed & F.col(old_col).isNotNull()
        & (sim_fn(F.col("_cval"), F.col(old_col)) >= threshold),
        F.lit(False))
    return (v.filter(~shadow)
            .select("id_a", "id_b",
                    F.round(score_col, 6).alias(score_col),
                    "new_a", "new_b"))


def _array_jaccard(x, y):
    """Exact Jaccard of two array columns as a double expression."""
    inter = F.size(F.array_intersect(x, y)).cast("double")
    return inter / ((F.size(x) + F.size(y)).cast("double") - inter)


def _canonical_candidate_pairs(
    a: DataFrame, b: DataFrame, id_col: str, join_cols,
) -> DataFrame:
    """Bucket-join two candidate row sets and emit canonically ordered
    pairs: ``id_a < id_b`` with the ``is_new`` flags carried through the
    same swap, self-pairs removed, multi-bucket duplicate collisions
    collapsed.  Every incremental/probe operator (doc, grouped,
    embedding) shares this exact canonicalization -- the keep-first /
    corpus-wins drop policy in :func:`incremental_drop_keys` reads the
    orientation, so it must never diverge between them."""
    a, b = a.alias("a"), b.alias("b")
    a_lt = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    return (a.join(b, join_cols)
            .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            .select(
                F.when(a_lt, F.col(f"a.{id_col}"))
                 .otherwise(F.col(f"b.{id_col}")).alias("id_a"),
                F.when(a_lt, F.col(f"b.{id_col}"))
                 .otherwise(F.col(f"a.{id_col}")).alias("id_b"),
                F.when(a_lt, F.col("a.is_new")).otherwise(F.col("b.is_new"))
                 .alias("new_a"),
                F.when(a_lt, F.col("b.is_new")).otherwise(F.col("a.is_new"))
                 .alias("new_b"))
            .distinct())


def _resolve_latest_bucket_restricted(
    rows: DataFrame, key_col: str, live: int,
    bucket_probe: DataFrame, bucket_cols: list[str],
) -> DataFrame:
    """Epoch resolution for probe-sized bucket lookups without an
    O(store) shuffle.

    A bucket restriction is NOT sound before :func:`_resolve_latest`
    (a key's latest-epoch row may live in a different bucket, and
    dropping it would resurrect an older epoch's row), but windowing
    the whole store to serve a handful of probe buckets is an
    O(corpus) shuffle per probe.  Two phases keep both properties:
    restrict to keys with ANY row in a probe-touched bucket (broadcast
    map-side semi-join, no shuffle), resolve only those keys' rows,
    then re-apply the bucket restriction to the resolved rows.  At
    ``live == 0`` this reduces to the single broadcast semi-join.

    The key semi-join carries NO broadcast hint on purpose: the key set
    is normally probe-sized (AQE broadcasts it at runtime), but one
    degenerate hot bucket -- the boilerplate-collision shape the
    callers' ``max_bucket_size`` capping exists to discard downstream
    -- can make it corpus-scale, and a FORCED broadcast would then OOM
    the driver.  Without the hint AQE degrades exactly that case to a
    scalable shuffled semi-join, while the downstream capping window
    still discards the hot bucket with its true membership intact.
    (Pre-capping the bucket membership here instead would count
    UNRESOLVED multi-epoch rows and could drop buckets the resolved
    view keeps -- not pair-exact.)"""
    restricted = rows.join(F.broadcast(bucket_probe), bucket_cols,
                           "left_semi")
    if live == 0:
        return restricted.drop("_epoch")
    keys = restricted.select(key_col).distinct()
    return (_resolve_latest(
                rows.join(keys, key_col, "left_semi"),
                key_col, live)
            .join(F.broadcast(bucket_probe), bucket_cols, "left_semi"))


def committed_group_ids(spark: SparkSession, index_path: str,
                        live: Optional[int] = None) -> DataFrame:
    """One-column (``gid``) set of groups committed to a grouped index at
    ANY live epoch.  Epoch commit marker is that epoch's bands store
    (written last within the epoch); the base-epoch marker doubles as the
    create marker exactly as before."""
    if live is None:
        live = _read_meta(spark, index_path,
                          expect_granularity="group")["epoch"]
    return (_read_epoched(spark, index_path, "bands", live, ["doc_id"])
            .select(F.col("doc_id").alias("gid")).distinct())


def reindex_groups(
    grown_df: DataFrame, group_col: str, text_col: str, index_path: str,
) -> dict:
    """Rebuild the touched groups of a grouped index into a fresh epoch.

    ``grown_df`` must carry each touched conversation's FULL current
    member rows (old + new turns): signatures and shingle sets are
    recomputed from scratch for exactly the group ids present, written
    to ``shingles_e{N+1}`` then ``bands_e{N+1}`` (overwrite mode, so a
    crashed attempt's orphan directories are replaced, never appended
    to), and the epoch is committed LAST by writing the APPEND-ONLY
    marker directory ``meta_e{N+1}`` -- the base ``meta/`` (the index's
    create marker and geometry pin) is never rewritten, so there is no
    crash window in which the index is unreadable: a crash anywhere
    before the marker's ``_SUCCESS`` lands leaves the old epoch live and
    the whole operation re-runnable.  Groups NOT present in ``grown_df``
    are untouched (their latest epoch still wins at read time).  Returns
    the new meta.  O(touched groups), never O(corpus)."""
    from .dedup import _group_signatures

    spark = grown_df.sparkSession
    meta = _read_meta(spark, index_path, expect_granularity="group")
    new_epoch = meta["epoch"] + 1
    base = grown_df.select(F.col(group_col).alias("gid"),
                           F.col(text_col).alias("text"))
    (_group_shingle_rows(base, "gid", "text", meta["shingle_k"])
     .write.mode("overwrite")
     .parquet(_epoch_path(index_path, "shingles", new_epoch)))
    gsig = _group_signatures(base, "gid", "text", meta["n_hashes"],
                             meta["shingle_k"])
    (_banded(gsig, "gid", meta["bands"], key="md5")
     .write.mode("overwrite").partitionBy("band")
     .parquet(_epoch_path(index_path, "bands", new_epoch)))
    meta_new = {"n_hashes": meta["n_hashes"], "bands": meta["bands"],
                "shingle_k": meta["shingle_k"],
                "threshold": float(meta["threshold"]),
                "granularity": "group", "epoch": new_epoch}
    # epoch commit marker: a fresh directory, never an overwrite of live
    # state (overwrite mode only matters for a PREVIOUS crashed attempt's
    # partial marker, which by definition has no _SUCCESS and is not live)
    spark.createDataFrame([meta_new]).write.mode("overwrite").parquet(
        f"{index_path}/meta_e{new_epoch}")
    _assert_marker_visible(spark, index_path, new_epoch)
    return meta_new


def changed_preindexed_gids(
    new_df: DataFrame, group_col: str, text_col: str, index_path: str,
) -> DataFrame:
    """Committed slice group ids whose CURRENT member rows' shingle set
    differs from the indexed one -- the grown/changed conversations that
    need :func:`reindex_groups`.  Group analog of
    :func:`changed_preindexed_ids`: the grouped store holds exploded
    ``(gid, sh)`` rows, so "changed" is a nonempty symmetric difference
    between the fresh and stored row sets, computed as a full-outer join
    on ``(gid, sh)`` (both sides are distinct rows; any row missing a
    side marks its gid changed -- see the implementation note on
    :func:`changed_preindexed_ids` for why this is NOT two ``exceptAll``
    branches unioned).  Only the preindexed gids are compared
    (semi-join-restricted both sides, never O(corpus)).  Returns a
    one-column (``gid``) DataFrame."""
    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path, expect_granularity="group")
    live = meta["epoch"]
    base = new_df.select(F.col(group_col).alias("gid"),
                         F.col(text_col).alias("text"))
    pre_gids = (base.select("gid").distinct()
                .join(committed_group_ids(spark, index_path, live),
                      "gid", "left_semi"))
    fresh = (_group_shingle_rows(base.join(pre_gids, "gid", "left_semi"),
                                 "gid", "text", meta["shingle_k"])
             .withColumnRenamed("doc_id", "gid"))
    stored = (_resolve_latest(
                  _read_epoched(spark, index_path, "shingles", live,
                                ["doc_id", "sh"])
                  .join(pre_gids.withColumnRenamed("gid", "doc_id"),
                        "doc_id", "left_semi"),
                  "doc_id", live)
              .withColumnRenamed("doc_id", "gid"))
    f = fresh.withColumn("_f", F.lit(1))
    s = stored.withColumn("_s", F.lit(1))
    return (f.join(s, ["gid", "sh"], "full_outer")
            .filter(F.col("_f").isNull() | F.col("_s").isNull())
            .select("gid").distinct())


def write_grouped_minhash_index(
    df: DataFrame,
    group_col: str,
    text_col: str,
    index_path: str,
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: Optional[int] = None,
    shingle_k: int = 5,
) -> dict:
    """Create a GROUP-granularity MinHash index (e.g. conversations) at
    ``index_path`` from a (deduped) corpus of member rows.  Overwrites any
    existing index at the path."""
    from .dedup import _group_signatures

    bands = resolve_bands(threshold, n_hashes, bands)
    spark = df.sparkSession
    _delete_stale_epoch_markers(spark, index_path)
    base = df.select(F.col(group_col).alias("gid"),
                     F.col(text_col).alias("text"))
    (_group_shingle_rows(base, "gid", "text", shingle_k)
     .write.mode("overwrite").parquet(f"{index_path}/shingles"))
    gsig = _group_signatures(base, "gid", "text", n_hashes, shingle_k)
    (_banded(gsig, "gid", bands, key="md5")
     .write.mode("overwrite").partitionBy("band")
     .parquet(f"{index_path}/bands"))
    meta = {"n_hashes": n_hashes, "bands": bands, "shingle_k": shingle_k,
            "threshold": float(threshold), "granularity": "group"}
    spark.createDataFrame([meta]).write.mode("overwrite").parquet(
        f"{index_path}/meta")
    return meta


def append_grouped_to_minhash_index(
    new_df: DataFrame, group_col: str, text_col: str, index_path: str,
) -> None:
    """Append a slice's groups to a group-granularity index, idempotently
    (same per-store anti-join + shingles-first/bands-last protocol as
    :func:`append_to_minhash_index`)."""
    from .dedup import _group_signatures

    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path, expect_granularity="group")
    live = meta["epoch"]
    base = new_df.select(F.col(group_col).alias("gid"),
                         F.col(text_col).alias("text"))
    # membership spans ALL live epochs (a gid can exist only in a reindex
    # epoch); new groups append into the BASE stores -- per-gid
    # max-epoch resolution makes that correct regardless of live epoch
    sh_existing = (_read_epoched(spark, index_path, "shingles", live,
                                 ["doc_id"])
                   .select(F.col("doc_id").alias("gid")).distinct())
    (_group_shingle_rows(base.join(sh_existing, "gid", "left_anti"),
                         "gid", "text", meta["shingle_k"])
     .write.mode("append").parquet(f"{index_path}/shingles"))
    bd_existing = committed_group_ids(spark, index_path, live)
    gsig = _group_signatures(base.join(bd_existing, "gid", "left_anti"),
                             "gid", "text", meta["n_hashes"],
                             meta["shingle_k"])
    (_banded(gsig, "gid", meta["bands"], key="md5")
     .write.mode("append").partitionBy("band")
     .parquet(f"{index_path}/bands"))


def minhash_near_duplicates_grouped_incremental(
    new_df: DataFrame,
    group_col: str,
    text_col: str,
    index_path: str,
    max_bucket_size: int = 1000,
    observation=None,
) -> DataFrame:
    """Group-granularity near-dup pairs touching the new slice, against
    index + slice -- the conversation analog of
    :func:`minhash_near_duplicates_incremental`.

    Returns ``(id_a, id_b, jaccard, new_a, new_b)`` with the index's
    pinned threshold, group-id pairs canonically ordered, never
    old-vs-old.  Groups already committed to the index are corpus and
    filtered from the slice (closed-per-slice model, see the section
    comment).  Candidate generation caps FULL buckets (index + slice
    rows); the exact verify joins exploded shingle rows -- index rows for
    corpus groups, freshly-shingled rows for slice groups, both
    semi-join-restricted to candidate groups."""
    from pyspark.sql.window import Window

    from .dedup import _group_signatures

    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path, expect_granularity="group")
    threshold = meta["threshold"]
    live = meta["epoch"]
    committed = committed_group_ids(spark, index_path, live)
    base = (new_df.select(F.col(group_col).alias("gid"),
                          F.col(text_col).alias("text"))
            .join(committed, "gid", "left_anti"))

    gsig = _group_signatures(base, "gid", "text", meta["n_hashes"],
                             meta["shingle_k"])
    new_banded = (_banded(gsig, "gid", meta["bands"], key="md5")  # aliases to doc_id
                  .withColumnRenamed("doc_id", "gid")
                  .withColumn("is_new", F.lit(True)))
    # epoch resolution BEFORE the capping window: a rebuilt group's stale
    # epoch-0 band rows must neither inflate bucket sizes nor generate
    # candidates (free at epoch 0 -- see _resolve_latest)
    old_banded = (_resolve_latest(
                      _read_epoched(spark, index_path, "bands", live,
                                    ["doc_id", "band", "band_key"]),
                      "doc_id", live)
                  .select(F.col("doc_id").alias("gid"), "band", "band_key")
                  .withColumn("is_new", F.lit(False)))
    all_banded = old_banded.unionByName(new_banded)
    sized = all_banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "band_key")))
    if observation is not None:
        sized = _observe_capping(sized, observation, max_bucket_size)
    capped = sized.filter(F.col("bucket_n") <= max_bucket_size) \
        .drop("bucket_n")
    pairs = _canonical_candidate_pairs(
        capped.filter("is_new"), capped, "gid", ["band", "band_key"])

    cand = (pairs.select(F.col("id_a").alias("gid"))
            .union(pairs.select(F.col("id_b").alias("gid")))
            .distinct())
    new_sh = (_group_shingle_rows(base.join(cand, "gid", "left_semi"),
                                  "gid", "text", meta["shingle_k"])
              .withColumnRenamed("doc_id", "gid"))
    # anti-join the store against the SLICE's gids: a crashed append may
    # have left a slice group's shingle rows in the store without its
    # bands (phantoms).  The grouped verify COUNTS rows, so a phantom+
    # fresh double-copy would inflate n_sh and n_inter and flip Jaccard
    # verdicts on the resumed run (the doc-index verify carries arrays,
    # where phantoms only duplicate identical rows and values survive).
    slice_gids = base.select("gid").distinct()
    # candidate-restrict FIRST, then resolve epochs: the per-gid window
    # runs over candidate rows only, never the O(corpus) store
    old_sh = (_resolve_latest(
                  _read_epoched(spark, index_path, "shingles", live,
                                ["doc_id", "sh"])
                  .join(cand.withColumnRenamed("gid", "doc_id"),
                        "doc_id", "left_semi"),
                  "doc_id", live)
              .select(F.col("doc_id").alias("gid"), "sh")
              .join(slice_gids, "gid", "left_anti"))
    sh_rows = old_sh.unionByName(new_sh)
    sizes = sh_rows.groupBy("gid").agg(F.count("*").alias("n_sh"))
    ea = sh_rows.select(F.col("gid").alias("id_a"), "sh")
    eb = sh_rows.select(F.col("gid").alias("id_b"), "sh")
    inter = (pairs.join(ea, "id_a").join(eb, ["id_b", "sh"])
             .groupBy("id_a", "id_b", "new_a", "new_b")
             .agg(F.count("*").alias("n_inter")))
    na = sizes.select(F.col("gid").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("gid").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (F.col("n_inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
                    "new_a", "new_b"))


def probe_grouped_index_near_duplicates(
    probe_df: DataFrame,
    group_col: str,
    text_col: str,
    index_path: str,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate GROUP pairs between probe conversations' CURRENT
    content and the committed corpus -- the conversation analog of
    :func:`probe_index_near_duplicates`, closing the same hole at group
    granularity: a re-export that rewrites conversation B into a
    near-copy of committed conversation A is invisible to
    :func:`minhash_near_duplicates_grouped_incremental` (committed gids
    are corpus and filtered from the slice), so without this probe it
    would sail in as B's replacement.

    Same semantics as the doc probe, group-shaped:

    * probe gids' OWN stored (old) group content is excluded -- it dies
      in the reindex this probe accompanies;
    * probe-vs-probe pairs compare both conversations' NEW content;
    * predecessor-shadow carve-out: a mixed pair is VOID when the
      corpus group's stored rows near-duplicate the probe gid's own
      stored (old) rows (that corpus group is the probe's history, e.g.
      an earlier deleted-then-reindexed replacement -- resembling your
      own past is never duplication); probes with no stored rows get no
      carve-out;
    * output ``(id_a, id_b, jaccard, new_a, new_b)`` feeds
      :func:`incremental_drop_keys` unchanged (ids are gids here).

    Scale shape: probe bands (one slice's changed conversations) are
    BROADCAST; the corpus band store is bucket-restricted before the
    capping window (true full-bucket sizes preserved -- restriction is
    by bucket key); shingle-row reads are candidate-restricted before
    epoch resolution; the verify is the grouped row-count join, never a
    per-group array.  O(probe + matched buckets), never O(corpus).

    Plan shape: the three bounded intermediates (``capped`` buckets,
    candidate ``pairs``, candidate-restricted ``sh_rows``) are eagerly
    ``localCheckpoint``-ed.  Each is referenced 2-3x downstream and each
    reference would otherwise replay a window/UDF/epoch-read subtree --
    the verify + shadow tree multiplies those references into a plan
    Catalyst takes minutes to optimize (measured on a toy fixture) and
    whose Python stages re-execute per consumer.  The frames are
    slice-bucket-bounded by construction (capping + candidate
    restriction), blocks are ContextCleaner-managed, and the trade --
    an executor loss during the probe fails the job instead of
    recomputing -- is acceptable for a slice-sized maintenance op whose
    enclosing pipeline run is idempotent and resumable."""
    from pyspark.sql.window import Window

    from .dedup import _group_signatures

    spark = probe_df.sparkSession
    meta = _read_meta(spark, index_path, expect_granularity="group")
    threshold = meta["threshold"]
    live = meta["epoch"]
    base = probe_df.select(F.col(group_col).alias("gid"),
                           F.col(text_col).alias("text"))
    probe_gids = base.select("gid").distinct()

    gsig = _group_signatures(base, "gid", "text", meta["n_hashes"],
                             meta["shingle_k"])
    probe_banded = (_banded(gsig, "gid", meta["bands"], key="md5")
                    .withColumnRenamed("doc_id", "gid")
                    .withColumn("is_new", F.lit(True)))
    old_banded = (_resolve_latest_bucket_restricted(
                      _read_epoched(spark, index_path, "bands", live,
                                    ["doc_id", "band", "band_key"]),
                      "doc_id", live,
                      probe_banded.select("band", "band_key").distinct(),
                      ["band", "band_key"])
                  .select(F.col("doc_id").alias("gid"), "band", "band_key")
                  .join(probe_gids, "gid", "left_anti")
                  .withColumn("is_new", F.lit(False)))
    all_banded = old_banded.unionByName(probe_banded)
    sized = all_banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "band_key")))
    capped = (sized.filter(F.col("bucket_n") <= max_bucket_size)
              .drop("bucket_n")
              .localCheckpoint())
    pairs = (_canonical_candidate_pairs(
                 capped.filter("is_new"), capped, "gid",
                 ["band", "band_key"])
             .localCheckpoint())

    cand = (pairs.select(F.col("id_a").alias("gid"))
            .union(pairs.select(F.col("id_b").alias("gid")))
            .distinct())
    new_sh = (_group_shingle_rows(base.join(cand, "gid", "left_semi"),
                                  "gid", "text", meta["shingle_k"])
              .withColumnRenamed("doc_id", "gid"))
    # corpus candidates resolve to their stored rows; probe gids' stored
    # rows are the dying old content and are excluded from the verify
    # (probe gids resolve to their NEW rows above)
    old_sh = (_resolve_latest(
                  _read_epoched(spark, index_path, "shingles", live,
                                ["doc_id", "sh"])
                  .join(cand.withColumnRenamed("gid", "doc_id"),
                        "doc_id", "left_semi"),
                  "doc_id", live)
              .select(F.col("doc_id").alias("gid"), "sh")
              .join(probe_gids, "gid", "left_anti")
              .localCheckpoint())
    sh_rows = old_sh.unionByName(new_sh).localCheckpoint()
    sizes = sh_rows.groupBy("gid").agg(F.count("*").alias("n_sh"))
    ea = sh_rows.select(F.col("gid").alias("id_a"), "sh")
    eb = sh_rows.select(F.col("gid").alias("id_b"), "sh")
    inter = (pairs.join(ea, "id_a").join(eb, ["id_b", "sh"])
             .groupBy("id_a", "id_b", "new_a", "new_b")
             .agg(F.count("*").alias("n_inter")))
    na = sizes.select(F.col("gid").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("gid").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (F.col("n_inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"))
    verified = (inter.join(na, "id_a").join(nb, "id_b")
                .withColumn("jaccard", jac)
                .filter(F.col("jaccard") >= threshold))

    # Predecessor-shadow carve-out, row-count shaped: stored rows of the
    # probe gids (their old content) vs stored rows of the mixed pairs'
    # corpus gids.  Restricted to the (tiny) verified mixed pair set
    # before any shingle join.
    mixedp = (verified.filter(F.col("new_a") != F.col("new_b"))
              .select(F.when(F.col("new_a"), F.col("id_a"))
                       .otherwise(F.col("id_b")).alias("_pgid"),
                      F.when(F.col("new_a"), F.col("id_b"))
                       .otherwise(F.col("id_a")).alias("_cgid")))
    pold = (_resolve_latest(
                _read_epoched(spark, index_path, "shingles", live,
                              ["doc_id", "sh"])
                .join(probe_gids.withColumnRenamed("gid", "doc_id"),
                      "doc_id", "left_semi"),
                "doc_id", live)
            .select(F.col("doc_id").alias("_pgid"), "sh"))
    np_ = pold.groupBy("_pgid").agg(F.count("*").alias("n_p"))
    i2 = (mixedp.join(pold, "_pgid")
          .join(old_sh.select(F.col("gid").alias("_cgid"), "sh"),
                ["_cgid", "sh"])
          .groupBy("_pgid", "_cgid").agg(F.count("*").alias("n_i2")))
    nc = sizes.select(F.col("gid").alias("_cgid"), F.col("n_sh").alias("n_c"))
    shadow_pairs = (mixedp.join(np_, "_pgid", "left")
                    .join(nc, "_cgid", "left")
                    .join(i2, ["_pgid", "_cgid"], "left")
                    .withColumn(
                        "_jac2",
                        F.coalesce(F.col("n_i2"), F.lit(0)).cast("double")
                        / (F.col("n_p") + F.col("n_c")
                           - F.coalesce(F.col("n_i2"), F.lit(0)))
                        .cast("double"))
                    .filter(F.col("n_p").isNotNull()
                            & (F.col("_jac2") >= threshold))
                    .select("_pgid", "_cgid",
                            F.lit(True).alias("_shadow")))
    out = (verified
           .withColumn("_pgid", F.when(F.col("new_a") != F.col("new_b"),
                                       F.when(F.col("new_a"),
                                              F.col("id_a"))
                                        .otherwise(F.col("id_b"))))
           .withColumn("_cgid", F.when(F.col("new_a") != F.col("new_b"),
                                       F.when(F.col("new_a"),
                                              F.col("id_b"))
                                        .otherwise(F.col("id_a"))))
           .join(shadow_pairs, ["_pgid", "_cgid"], "left")
           .filter(F.col("_shadow").isNull()))
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"),
                      "new_a", "new_b")


def minhash_grouped_index_bucket_audit(
    new_df: DataFrame, group_col: str, text_col: str, index_path: str,
    max_bucket_size: int = 1000,
) -> dict:
    """Exact capping recount for a grouped incremental run (index + slice
    group signatures) -- the group-granularity analog of
    :func:`minhash_index_bucket_audit`, for the empty-output corner where
    the observe-based counter is pruned."""
    from .dedup import _group_signatures

    spark = new_df.sparkSession
    meta = _read_meta(spark, index_path, expect_granularity="group")
    live = meta["epoch"]
    committed = committed_group_ids(spark, index_path, live)
    base = (new_df.select(F.col(group_col).alias("gid"),
                          F.col(text_col).alias("text"))
            .join(committed, "gid", "left_anti"))
    gsig = _group_signatures(base, "gid", "text", meta["n_hashes"],
                             meta["shingle_k"])
    new_banded = _banded(gsig, "gid", meta["bands"], key="md5")  # aliases to doc_id
    old_banded = _resolve_latest(
        _read_epoched(spark, index_path, "bands", live,
                      ["doc_id", "band", "band_key"]),
        "doc_id", live)
    sizes = (old_banded.unionByName(new_banded)
             .groupBy("band", "band_key").agg(F.count("*").alias("n")))
    return bucket_cap_stats(sizes, max_bucket_size)


def _compact_index(spark: SparkSession, src_path: str, dst_path: str,
                   granularity: str) -> dict:
    """Shared compaction body: rewrite an index's RESOLVED state
    (per-key latest epoch) as a fresh epoch-0 index at ``dst_path``.
    The doc and group layouts resolve identically -- the shingle store
    is ``(doc_id, sh)`` rows either way (``sh`` an array for docs, a
    scalar for groups), and resolution is a per-key max-epoch filter."""
    if dst_path.rstrip("/") == src_path.rstrip("/"):
        raise ValueError(
            "compaction writes a NEW index; dst_path must differ from "
            "src_path (in-place parquet swap is not atomic)")
    _delete_stale_epoch_markers(spark, dst_path)
    meta = _read_meta(spark, src_path, expect_granularity=granularity)
    live = meta["epoch"]
    (_resolve_latest(_read_epoched(spark, src_path, "shingles", live,
                                   ["doc_id", "sh"]), "doc_id", live)
     .write.mode("overwrite").parquet(f"{dst_path}/shingles"))
    (_resolve_latest(_read_epoched(spark, src_path, "bands", live,
                                   ["doc_id", "band", "band_key"]),
                     "doc_id", live)
     .write.mode("overwrite").partitionBy("band")
     .parquet(f"{dst_path}/bands"))
    meta_new = {"n_hashes": meta["n_hashes"], "bands": meta["bands"],
                "shingle_k": meta["shingle_k"],
                "threshold": float(meta["threshold"]),
                "granularity": granularity, "epoch": 0}
    spark.createDataFrame([meta_new]).write.mode("overwrite").parquet(
        f"{dst_path}/meta")
    return meta_new


def compact_grouped_index(spark: SparkSession, src_path: str,
                          dst_path: str) -> dict:
    """Rewrite a grouped index's RESOLVED state (per-group latest epoch)
    as a fresh epoch-0 index at ``dst_path``.

    Epoch directories accrete one per reindex and every reader pays the
    per-gid resolution shuffle once epochs exist; periodic compaction
    resets both.  No signatures are recomputed -- the resolved band and
    shingle rows ARE the full index state, so this is a copy-shaped job
    (shingles first, bands last, meta last, same commit discipline as
    create).  ``dst_path`` must differ from ``src_path``: parquet
    directories cannot be atomically swapped in place, so the caller
    flips whatever pointer names the live index (and deletes the old
    tree) once this returns."""
    return _compact_index(spark, src_path, dst_path, "group")


def compact_doc_index(spark: SparkSession, src_path: str,
                      dst_path: str) -> dict:
    """Doc-granularity compaction: the :func:`compact_grouped_index`
    analog for indexes reindexed via :func:`reindex_docs` (same resolved
    copy-shaped rewrite, same commit discipline, same
    must-be-a-new-path rule)."""
    return _compact_index(spark, src_path, dst_path, "doc")


def incremental_drop_keys(pairs: DataFrame) -> DataFrame:
    """The keys a corpus-wins + keep-first dedup policy drops, as a
    one-column (``doc_id``) DataFrame.

    * mixed pair (one corpus side): drop the NEW side -- the corpus doc is
      already persisted and by definition arrived first;
    * new-new pair: drop the later key (``id_b``; ids are canonically
      ordered, matching the batch gate's keep-first-by-key policy)."""
    drop = (F.when(F.col("new_a") & ~F.col("new_b"), F.col("id_a"))
             .otherwise(F.col("id_b")))
    return pairs.select(drop.alias("doc_id")).distinct()
