"""End-to-end scrub pipeline: read -> quality -> scrub -> order -> write.

Spark-first shape (SURVEY.md §3.1 translation):

* All heavy work is per-turn and embarrassingly parallel -- the hot path has
  ZERO shuffles: scan -> project(quality_udf, scrub_udf) -> write.  Catalyst
  fuses both UDF projections into one stage; Arrow batches stream through.
* Ordering (north rule: stable (conv_id, turn_idx) order) is applied only at
  the boundary via ``repartitionByRange + sortWithinPartitions``: a sampled
  range exchange, not a single-reducer global sort, so hot conversations
  split across partitions while the output file sequence stays totally
  ordered.
* Conversation-level rollups use two-phase salted aggregation
  (``conversation_stats``): partial agg on (conv_id, salt) first, so a
  10^7-turn hot conversation never lands on one reducer.  AQE's skew
  handling covers joins; salting aggregations is ours to do.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quality import DEFAULT_QUALITY_CONFIG, QualityConfig
from ..functions.udfs import LANG_CODES, REASON_CODES, make_quality_udf, make_scrub_udf

OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "role", "tool", "ts", "text", "masked_text",
    "n_detections", "n_regex", "n_dict", "n_heuristic", "n_ai",
    "lang", "nll", "n_chars", "symbol_ratio", "distinct_trigram_ratio",
    "mojibake", "keep", "drop_reason",
]


def scrub_transcripts(
    df: DataFrame,
    custom_keywords: Optional[list[str]] = None,
    mask_config: Optional[dict[str, bool]] = None,
    keep_prefecture: bool = True,
    name_initial: bool = False,
    current_year: int = 2026,
    quality_cfg: QualityConfig = DEFAULT_QUALITY_CONFIG,
    ai_caller=None,
    ai_fallback_caller=None,
) -> DataFrame:
    """The flagship transform.  One narrow stage: no shuffle, no collect.

    ``ai_caller`` (default None = off) switches on the optional
    AI-enrichment detection stage inside the scrub UDF -- see
    ``functions.udfs.make_scrub_udf``; the plan shape is unchanged."""
    scrub = make_scrub_udf(custom_keywords, mask_config, keep_prefecture,
                           name_initial, current_year,
                           ai_caller, ai_fallback_caller)
    quality = make_quality_udf(quality_cfg)
    lang_array = F.array(*[F.lit(x) for x in LANG_CODES])
    reason_array = F.array(*[F.lit(x) for x in REASON_CODES])
    out = (
        df
        .withColumn("_q", quality(F.col("text"), F.col("role")))
        .withColumn("_s", scrub(F.col("text")))
        .select(
            "conv_id", "turn_idx", "role", "tool", "ts", "text",
            F.col("_s.masked_text").alias("masked_text"),
            F.col("_s.n_detections").alias("n_detections"),
            F.col("_s.n_regex").alias("n_regex"),
            F.col("_s.n_dict").alias("n_dict"),
            F.col("_s.n_heuristic").alias("n_heuristic"),
            F.col("_s.n_ai").alias("n_ai"),
            # decode the UDF's tiny-int codes to strings JVM-side (codegen)
            F.element_at(lang_array, F.col("_q.lang_id") + 1).alias("lang"),
            F.col("_q.nll").alias("nll"),
            F.col("_q.n_chars").alias("n_chars"),
            F.col("_q.symbol_ratio").alias("symbol_ratio"),
            F.col("_q.distinct_trigram_ratio").alias("distinct_trigram_ratio"),
            F.col("_q.mojibake").alias("mojibake"),
            F.col("_q.keep").alias("keep"),
            F.element_at(reason_array, F.col("_q.reason_id") + 1)
             .alias("drop_reason"),
        )
    )
    return out


def scrub_conversations_grouped(
    df: DataFrame,
    keep_prefecture: bool = True,
    current_year: int = 2026,
) -> DataFrame:
    """Conversation-scoped scrub via ``applyInPandas`` (SURVEY.md §2.9).

    NON-DEFAULT variant: the furigana reading map is built over the WHOLE
    conversation (turns in turn_idx order), so a name labeled with furigana
    in one turn is initialed (``T.T.``) in every other turn.  This changes
    masked bytes relative to the reference's per-document scope -- the
    default ``scrub_transcripts`` remains the faithful path (SURVEY §7.3).

    Grouping shuffles on conv_id; hot conversations land on one task here,
    so this variant is for conversation-semantic use cases, not the bulk
    hot path."""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("masked_text", StringType()),
        StructField("n_detections", IntegerType()),
    ])

    def scrub_conv(pdf):
        import pandas as pd

        from ..functions.batch_detect import detect_all_batch
        from ..functions.oracle import (
            apply_mask_config, apply_redaction, build_reading_map,
        )

        pdf = pdf.sort_values("turn_idx")
        texts = pdf["text"].fillna("").tolist()
        conv_reading = build_reading_map("\n".join(texts))
        dets_all = detect_all_batch(texts, current_year=current_year)
        masked, counts = [], []
        for text, dets in zip(texts, dets_all):
            dets = apply_mask_config(dets)
            masked.append(apply_redaction(
                text, dets, keep_prefecture, name_initial=True,
                reading_map=conv_reading))
            counts.append(len(dets))
        return pd.DataFrame({
            "conv_id": pdf["conv_id"].values,
            "turn_idx": pdf["turn_idx"].values,
            "masked_text": masked,
            "n_detections": pd.array(counts, dtype="int32"),
        })

    return df.groupBy("conv_id").applyInPandas(scrub_conv, schema)


def ordered(df: DataFrame, num_partitions: Optional[int] = None) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering via range exchange.

    ``repartitionByRange`` samples key boundaries, so a hot conv_id is split
    across consecutive partitions instead of hammering one reducer the way
    ``Window.partitionBy('conv_id')`` would; ``sortWithinPartitions`` then
    yields a totally ordered file sequence."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (df.repartitionByRange(n, "conv_id", "turn_idx")
              .sortWithinPartitions("conv_id", "turn_idx"))


def with_turn_rank(df: DataFrame) -> DataFrame:
    """Per-conversation dense rank over turn_idx (Window form of the north
    rule's ordering).  For genuinely skewed conversations prefer
    ``ordered()``; this exists for consumers that need the rank column."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_rank", F.row_number().over(w))


def deduplicate_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic exact dedup: among turns sharing the same
    whitespace-normalized text, keep the first by (conv_id, turn_idx).

    Built as groupBy(fingerprint).min(key) + semi-join rather than
    ``dropDuplicates`` (which keeps an arbitrary row and is therefore
    nondeterministic under retries/speculation).  Two shuffles on the
    fingerprint/key -- run BEFORE the scrub stage so duplicate turns never
    pay detection cost.

    NULL text coalesces to a sentinel before fingerprinting: md5(NULL) is
    NULL and a plain equi-join never matches NULL keys, so without the
    coalesce every NULL-text turn would silently vanish (they now dedup
    against each other like any other group)."""
    norm = F.md5(F.coalesce(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "),
        F.lit("\x00<null-text>")))
    keyed = df.withColumn("_fp", norm)
    winners = (keyed
               .groupBy("_fp")
               .agg(F.min(F.struct("conv_id", "turn_idx")).alias("_w"))
               .select("_fp", F.col("_w.conv_id").alias("conv_id"),
                       F.col("_w.turn_idx").alias("turn_idx")))
    return (keyed.join(winners, ["_fp", "conv_id", "turn_idx"], "left_semi")
            .drop("_fp"))


def near_deduplicate_turns(
    df: DataFrame, threshold: float = 0.8, text_col: str = "text",
    observation=None, max_bucket_size: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """MinHash near-dedup for turns: drop every turn that has ANY
    near-duplicate earlier in ``(conv_id, turn_idx)`` order.

    The turn key is the ``(conv_id, turn_idx)`` struct itself -- structs
    compare lexicographically in Spark, so the LSH pair orientation
    ``id_a < id_b`` IS first-occurrence order and no surrogate id (with
    its retry-nondeterminism or collision risk) is needed.  Keep-first via
    pair-drop is the standard cheap policy: within a chained cluster
    a~b~c (a !~ c) it drops both b and c (b has the earlier near-dup a,
    c has b), i.e. it can over-drop relative to connected components but
    never keeps two near-duplicates where one pair was detected.  Like
    ``deduplicate_turns``, NULL/empty texts form one group (their padded
    shingle sets are identical), so only the first survives.

    Returns ``(deduped, drops)``.  ``drops`` is the small distinct set of
    dropped keys: the caller should ``persist()`` it and run one action
    (e.g. ``count()``) BEFORE consuming ``deduped`` -- that both fires
    ``observation`` (the capped-bucket recall metrics; an anti-join whose
    right side turns out empty would otherwise prune the observed subtree,
    see ``operators.dedup._observe_capping``) and pins the drop set so
    the expensive LSH subtree is not recomputed by the write pass."""
    from ..operators.dedup import minhash_near_duplicates

    keyed = df.withColumn("_nk", F.struct("conv_id", "turn_idx"))
    pairs = minhash_near_duplicates(
        keyed, "_nk", text_col, threshold=threshold,
        observation=observation, max_bucket_size=max_bucket_size)
    drops = pairs.select(F.col("id_b").alias("_nk")).distinct()
    deduped = keyed.join(drops, "_nk", "left_anti").drop("_nk")
    return deduped, drops


def near_deduplicate_conversations(
    df: DataFrame, threshold: float = 0.8, text_col: str = "text",
    observation=None, max_bucket_size: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """MinHash near-dedup at CONVERSATION granularity: drop every
    conversation whose union-of-turn-shingles Jaccard-matches an earlier
    conversation (keep-first by ``conv_id``).

    LLM training pipelines dedup *documents* (whole conversations), not
    just turns -- two scrapes of the same dialog differ per-turn only by
    timestamps/typos but are near-identical as documents.  Built on
    :func:`operators.dedup.minhash_near_duplicates_grouped`: the
    conversation signature is a ``groupBy(conv_id).min()`` over per-turn
    signatures (MinHash is distributive over set union), so no
    conversation's text is ever assembled in one place and giant
    conversations cannot skew a task.  Same keep-first-by-pair-drop policy
    as :func:`near_deduplicate_turns` (canonical ``id_a < id_b`` means the
    dropped ``id_b`` always has an earlier near-duplicate).

    Returns ``(deduped, drops)`` where ``drops`` is the distinct dropped
    ``conv_id`` set; persist + count it before consuming ``deduped``
    (fires ``observation``, pins the drop set)."""
    from ..operators.dedup import minhash_near_duplicates_grouped

    pairs = minhash_near_duplicates_grouped(
        df, "conv_id", text_col, threshold=threshold,
        observation=observation, max_bucket_size=max_bucket_size)
    drops = pairs.select(F.col("id_b").alias("conv_id")).distinct()
    deduped = df.join(drops, "conv_id", "left_anti")
    return deduped, drops


def conversation_stats(df: DataFrame, salt: int = 16) -> DataFrame:
    """Per-conversation keep/drop/mask counters with two-phase salted agg."""
    partial = (
        df.groupBy("conv_id", (F.pmod(F.hash("turn_idx"), F.lit(salt))).alias("_salt"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
            F.sum((F.col("n_detections") > 0).cast("long")).alias("n_masked"),
            F.sum("n_detections").alias("n_detections"),
        )
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("n_keep").alias("n_keep"),
            F.sum("n_drop").alias("n_drop"),
            F.sum("n_masked").alias("n_masked"),
            F.sum("n_detections").alias("n_detections"),
        )
    )


def pipeline_metrics(df: DataFrame) -> DataFrame:
    """Job-level metrics rollup: counts by (lang, keep, drop_reason)."""
    return (
        df.rollup("lang", "keep", "drop_reason")
        .agg(F.count("*").alias("n_turns"),
             F.sum("n_detections").alias("n_detections"))
        .orderBy("lang", "keep", "drop_reason")
    )


class RetentionError(RuntimeError):
    """A pipeline stage lost rows or destroyed content beyond tolerance."""


def _nd_input_fingerprint(df: DataFrame) -> tuple[int, int]:
    """(row count, order-insensitive row checksum) over
    (conv_id, turn_idx, text).

    One column-pruned scan.  ``text`` is part of the hash because the
    near-dup winner set depends on CONTENT, not just keys: an upstream
    re-generation that edits texts under unchanged keys must invalidate
    the persisted drop set, or a resumed run would replay drops computed
    for different text.  ``bit_xor`` of the per-row hashes never overflows
    (unlike a sum under ANSI arithmetic) and is order-insensitive.  An
    even number of fully identical rows xor-cancels (keys are NOT
    guaranteed unique when ``dedup=False``), which is why the row COUNT is
    checked alongside the checksum -- dropping or adding such rows changes
    ``n``; a same-count same-xor collision requires an adversarial edit,
    not an operational accident."""
    row = (df.select(F.xxhash64("conv_id", "turn_idx", "text").alias("h"))
           .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("hx"))
           .first())
    return int(row["n"]), int(row["hx"]) if row["hx"] is not None else 0


def _try_read_first(spark: SparkSession, path: str):
    """First row of a parquet path, or None if it was never (fully) written.

    Unlike ``resume_filter`` this also treats an empty/schema-less dir as
    absent: sidecars are written last, so a half-written one from a killed
    run must read as "not there" and trigger recompute, never an error."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).first()
    except AnalysisException as e:
        msg = str(e)
        if ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg):
            return None
        raise


def _near_dedup_full_stage(spark, df, threshold, output_path, resume,
                           scope="turn"):
    """Full-input MinHash near-dedup with a persisted drop-set sidecar.

    ``scope`` picks the dedup granularity: ``"turn"`` drops individual
    near-duplicate turns (:func:`near_deduplicate_turns`),
    ``"conversation"`` drops whole near-duplicate conversations
    (:func:`near_deduplicate_conversations`).

    The winner set is a deterministic function of (input, threshold,
    scope), so the first run persists the computed drop KEYS to
    ``_neardup_drops`` plus an input fingerprint in ``_neardup_meta``, and
    an idempotent RESTART reuses them with one anti-join instead of
    recomputing MinHash over the full input -- killing the r3
    recompute-on-resume cost while keeping the restart byte-identical to
    an uninterrupted run.  A fingerprint mismatch (the input changed
    between runs) falls back to full recompute: correctness never depends
    on the reuse.  Returns (deduped_df, lineage_row,
    drops_to_unpersist_or_None)."""
    from pyspark.sql import Observation

    from ..operators.dedup import (
        capped_bucket_metrics, minhash_bucket_audit,
        minhash_grouped_bucket_audit)

    conv_scope = scope == "conversation"
    key_cols = ["conv_id"] if conv_scope else ["conv_id", "turn_idx"]
    stage_name = "near_dedup_conversations" if conv_scope else "near_dedup"
    drops_path = f"{output_path}/_neardup_drops"
    meta_path = f"{output_path}/_neardup_meta"
    fingerprint = None  # computed at most once per run (full input scan)
    if resume:
        meta = _try_read_first(spark, meta_path)
        if (meta is not None and float(meta["threshold"]) == threshold
                and meta.asDict().get("scope", "turn") == scope):
            fingerprint = _nd_input_fingerprint(df)
            n_in, checksum = fingerprint
            if (int(meta["n_input_rows"]) == n_in
                    and int(meta["keys_checksum"]) == checksum):
                n_nd = int(meta["n_dropped"])
                if n_nd > 0:  # empty drop sets are meta-only (no parquet)
                    done = spark.read.parquet(drops_path)
                    df = df.join(done, key_cols, "left_anti")
                nd_row = {"stage": stage_name, "n_dropped": n_nd,
                          "n_preindexed_rows_dropped": 0,
                          "n_preindexed_changed": 0,
                          "n_capped_rows": int(meta["n_capped_rows"]),
                          "n_capped_buckets": int(meta["n_capped_buckets"]),
                          "max_bucket_n": int(meta["max_bucket_n"]),
                          "metrics_observed": False,
                          "drop_set_reused": True}
                return df, nd_row, None

    nd_obs = Observation("near_dedup_capping")
    df_pre_nd = df
    if conv_scope:
        deduped, nd_drops = near_deduplicate_conversations(
            df, threshold=threshold, observation=nd_obs)
    else:
        deduped, nd_drops = near_deduplicate_turns(
            df, threshold=threshold, observation=nd_obs)
    nd_drops.persist()
    n_nd = nd_drops.count()  # fires the observation; pins the drop set
    m = capped_bucket_metrics(nd_obs)
    metrics_observed = m is not None
    if m is None:
        # the observed subtree was pruned: the run produced zero LSH
        # pairs end to end -- which happens both when nothing was
        # capped AND when EVERY bucket was capped, so writing zeros
        # here would lie in exactly the pathological run this counter
        # exists to surface.  Recount exactly with one dedicated audit
        # job (rare path only; the hot path stays zero-extra-scan).
        if conv_scope:
            m = minhash_grouped_bucket_audit(
                df_pre_nd, "conv_id", "text", threshold=threshold)
        else:
            m = minhash_bucket_audit(
                df_pre_nd.withColumn("_nk", F.struct("conv_id", "turn_idx")),
                "_nk", "text", threshold=threshold)
    nd_row = {"stage": stage_name, "n_dropped": n_nd,
              "n_preindexed_rows_dropped": 0,
              "n_preindexed_changed": 0,
              "n_capped_rows": m["n_capped_rows"],
              "n_capped_buckets": m["n_capped_buckets"],
              "max_bucket_n": m["max_bucket_n"],
              "metrics_observed": metrics_observed,
              "drop_set_reused": False}
    # persist the drop set + input fingerprint BEFORE the main write so a
    # crashed run's restart can reuse it (drops first, meta last: meta's
    # presence certifies the drop parquet is complete)
    if n_nd > 0:
        if conv_scope:
            nd_drops.write.mode("overwrite").parquet(drops_path)
        else:
            (nd_drops.select(F.col("_nk.conv_id").alias("conv_id"),
                             F.col("_nk.turn_idx").alias("turn_idx"))
             .write.mode("overwrite").parquet(drops_path))
    if fingerprint is None:
        fingerprint = _nd_input_fingerprint(df_pre_nd)
    n_in, checksum = fingerprint
    meta_row = {"threshold": threshold, "scope": scope, "n_input_rows": n_in,
                "keys_checksum": checksum, "n_dropped": n_nd, **m}
    spark.createDataFrame([meta_row]).write.mode("overwrite").parquet(
        meta_path)
    return deduped, nd_row, nd_drops


def _near_dedup_slice_stage(spark, df, threshold, index_path,
                            scope="turn", collect_changed=False):
    """Daily-ingest near-dedup: LSH-join the slice against a persisted
    MinHash index (operators/minhash_index.py) instead of recomputing the
    corpus -- O(slice + matched buckets), never O(corpus), never old-vs-old.
    ``scope="turn"`` dedups individual turns against a doc-granularity
    index; ``scope="conversation"`` dedups whole conversations against a
    group-granularity index (union-of-turn shingle sets; conversations are
    closed per slice -- see operators/minhash_index.py).

    First run (no index at the path) bootstraps: full in-slice near-dedup;
    run_pipeline then CREATES the index from the kept turns after the main
    write.  Subsequent runs drop the new side of every corpus match plus
    the later key of in-slice pairs, and run_pipeline APPENDS the kept
    turns to the index after the write (append-last: a crash anywhere
    leaves the index in its pre-slice state, so a resumed run recomputes
    the same drops against the same index).  Returns
    (deduped_df, lineage_row, drops_to_unpersist_or_None, index_action,
    changed_rows_or_None) where index_action is
    ("create"|"append", kept_df) and changed_rows -- populated only when
    ``collect_changed`` and changed pre-indexed re-exports exist -- is
    the PERSISTED slice rows of those keys' CURRENT content, for
    ``run_pipeline``'s post-write ``reindex_changed`` stage (the caller
    unpersists it in its finally block)."""
    from pyspark.sql import Observation

    from ..operators.dedup import (
        capped_bucket_metrics, minhash_bucket_audit,
        minhash_grouped_bucket_audit)
    from ..operators.minhash_index import (
        incremental_drop_keys, minhash_grouped_index_bucket_audit,
        minhash_index_bucket_audit,
        minhash_near_duplicates_grouped_incremental,
        minhash_near_duplicates_incremental)

    conv_scope = scope == "conversation"
    meta = _try_read_first(spark, f"{index_path}/meta")
    if meta is None:  # bootstrap slice: plain in-slice near-dedup
        nd_obs = Observation("near_dedup_capping")
        if conv_scope:
            deduped, nd_drops = near_deduplicate_conversations(
                df, threshold=threshold, observation=nd_obs)
        else:
            deduped, nd_drops = near_deduplicate_turns(
                df, threshold=threshold, observation=nd_obs)
        nd_drops.persist()
        n_nd = nd_drops.count()
        m = capped_bucket_metrics(nd_obs)
        metrics_observed = m is not None
        if m is None:
            if conv_scope:
                m = minhash_grouped_bucket_audit(
                    df, "conv_id", "text", threshold=threshold)
            else:
                m = minhash_bucket_audit(
                    df.withColumn("_nk", F.struct("conv_id", "turn_idx")),
                    "_nk", "text", threshold=threshold)
        nd_row = {"stage": "near_dedup_bootstrap", "n_dropped": n_nd,
                  "n_preindexed_rows_dropped": 0,
                  "n_preindexed_changed": 0,
                  "n_capped_rows": m["n_capped_rows"],
                  "n_capped_buckets": m["n_capped_buckets"],
                  "max_bucket_n": m["max_bucket_n"],
                  "metrics_observed": metrics_observed,
                  "drop_set_reused": False}
        return deduped, nd_row, nd_drops, ("create", deduped), None

    if abs(float(meta["threshold"]) - threshold) > 1e-12:
        raise ValueError(
            f"minhash index at {index_path} was built with threshold "
            f"{meta['threshold']}; this run requested {threshold} -- "
            f"rebuild the index or match the threshold")
    expect_gran = "conversation" if conv_scope else "turn"
    index_gran = meta.asDict().get("granularity", "doc")
    if (index_gran == "group") != conv_scope:
        raise ValueError(
            f"minhash index at {index_path} has granularity "
            f"{index_gran!r} but this run requested "
            f"near-dedup scope {expect_gran!r} -- scope and index "
            f"granularity must match")
    # Slice rows whose key is ALREADY committed to the index are corpus
    # re-exports (a completed slice re-run, a partially re-exported dump):
    # emitting them would duplicate already-ingested content, so they are
    # DROPPED here -- with their own lineage counter, never silently (the
    # operators' committed filter only excludes them from pair
    # computation; without this gate they would pass straight to output).
    from ..operators.minhash_index import (
        _committed_doc_ids, changed_preindexed_gids, changed_preindexed_ids,
        committed_group_ids)
    nd_obs = Observation("near_dedup_capping")
    n_pre_changed = 0
    changed_rows = None
    if conv_scope:
        committed = (committed_group_ids(spark, index_path)
                     .withColumnRenamed("gid", "conv_id"))
        n_pre = df.join(committed, "conv_id", "left_semi").count()
        if n_pre:  # split identical vs CHANGED re-exports (reindex needed)
            # counted in TURN ROWS like its n_preindexed_rows_dropped
            # sibling (one lineage column, one unit) -- the changed-gid
            # set itself is tiny, the join is a broadcast-sized semi
            changed_gids = (changed_preindexed_gids(
                df, "conv_id", "text", index_path)
                .withColumnRenamed("gid", "conv_id"))
            n_pre_changed = df.join(F.broadcast(changed_gids), "conv_id",
                                    "left_semi").count()
            if collect_changed and n_pre_changed:
                # each changed conversation's slice rows -- its FULL
                # current member set under the closed-per-slice
                # convention reindex_groups requires.  Persisted: the
                # post-write reindex consumes it several times (two
                # store writes + the key count) and must see the exact
                # rows this gate counted, not a re-planned probe
                changed_rows = df.join(F.broadcast(changed_gids),
                                       "conv_id", "left_semi").persist()
        pairs = minhash_near_duplicates_grouped_incremental(
            df, "conv_id", "text", index_path, observation=nd_obs)
        drops = (incremental_drop_keys(pairs)
                 .withColumnRenamed("doc_id", "conv_id"))
        drops.persist()
        n_nd = drops.count()  # fires the observation; pins the drop set
        m = capped_bucket_metrics(nd_obs)
        metrics_observed = m is not None
        if m is None:
            m = minhash_grouped_index_bucket_audit(
                df, "conv_id", "text", index_path)
        deduped = (df.join(drops, "conv_id", "left_anti")
                   .join(committed, "conv_id", "left_anti"))
    else:
        keyed = df.withColumn("_nk", F.struct("conv_id", "turn_idx"))
        committed = (_committed_doc_ids(spark, index_path)
                     .withColumnRenamed("doc_id", "_nk"))
        n_pre = keyed.join(committed, "_nk", "left_semi").count()
        if n_pre:  # split identical vs CHANGED re-exports (reindex needed)
            changed_ids = (changed_preindexed_ids(
                keyed, "_nk", "text", index_path)
                .withColumnRenamed("doc_id", "_nk"))
            n_pre_changed = changed_ids.count()
            if collect_changed and n_pre_changed:
                # persisted for the same reason as the grouped branch
                changed_rows = keyed.join(F.broadcast(changed_ids),
                                          "_nk", "left_semi").persist()
        pairs = minhash_near_duplicates_incremental(
            keyed, "_nk", "text", index_path, observation=nd_obs)
        drops = (incremental_drop_keys(pairs)
                 .withColumnRenamed("doc_id", "_nk"))
        drops.persist()
        n_nd = drops.count()  # fires the observation; pins the drop set
        m = capped_bucket_metrics(nd_obs)
        metrics_observed = m is not None
        if m is None:
            m = minhash_index_bucket_audit(keyed, "_nk", "text", index_path)
        deduped = (keyed.join(drops, "_nk", "left_anti")
                   .join(committed, "_nk", "left_anti").drop("_nk"))
    nd_row = {"stage": "near_dedup_incremental", "n_dropped": n_nd,
              "n_preindexed_rows_dropped": n_pre,
              "n_preindexed_changed": n_pre_changed,
              "n_capped_rows": m["n_capped_rows"],
              "n_capped_buckets": m["n_capped_buckets"],
              "max_bucket_n": m["max_bucket_n"],
              "metrics_observed": metrics_observed,
              "drop_set_reused": False}
    return deduped, nd_row, drops, ("append", deduped), changed_rows


def _embedding_dedup_stage(spark, df, threshold, index_path, vec_col,
                           n_planes, collect_changed=False,
                           changed_probe_df=None):
    """Embedding near-dedup keyed on the ``(conv_id, turn_idx)`` struct --
    the embedding analog of :func:`_near_dedup_slice_stage`, for corpora
    that ship precomputed turn embeddings.

    ``index_path=None`` runs plain in-slice dedup (keep-first by key, the
    earlier turn of every cos >= threshold pair wins).  With an index
    path: first run bootstraps (in-slice dedup; ``run_pipeline`` creates
    the index from the kept rows after the main write), later runs join
    the slice against the persisted hyperplane index
    (operators/embedding_index.py) -- corpus-wins on mixed pairs,
    keep-first on slice pairs, pre-indexed re-export keys dropped with
    their own counter, O(slice + matched buckets) per run.

    Rows with a NULL embedding can never be flagged (they have nothing to
    compare) and pass through; the index stores only non-null vectors.
    Returns (deduped_df, lineage_row, drops_to_unpersist_or_None,
    index_action_or_None, changed_rows_or_None) with index_action =
    ("create"|"append", kept); changed_rows mirrors
    :func:`_near_dedup_slice_stage`'s contract (slice rows of changed
    pre-indexed keys, only under ``collect_changed``).

    ``changed_probe_df``: when the MinHash gate runs FIRST, it anti-joins
    its own committed keys out of this stage's input -- so a key
    committed to BOTH indexes whose re-export changed text AND embedding
    would never be seen here, and its stale vector would anchor the
    embedding index forever while the text side got reindexed.  Passing
    the pre-MinHash-gate rows here scopes the changed-re-export DETECTION
    (and only it) to the full slice; the dedup anti-joins and the
    ``n_preindexed_rows_dropped`` counter still operate on this stage's
    own input."""
    from pyspark.sql import Observation

    from ..operators.dedup import (
        capped_bucket_metrics, embedding_near_duplicates)
    from ..operators.embedding_index import (
        _committed_ids, embedding_index_bucket_audit,
        embedding_near_duplicates_incremental)
    from ..operators.minhash_index import incremental_drop_keys

    if vec_col not in df.columns:
        raise ValueError(
            f"embedding dedup requires a {vec_col!r} column in the input "
            f"(pass embedding_col= to name it); input has {df.columns}")
    keyed = df.withColumn("_ek", F.struct("conv_id", "turn_idx"))
    nonnull = keyed.filter(F.col(vec_col).isNotNull())
    meta = (_try_read_first(spark, f"{index_path}/meta")
            if index_path is not None else None)

    if meta is None:  # full in-slice dedup (bootstrap or index-less mode)
        stage = ("embedding_dedup_bootstrap" if index_path is not None
                 else "embedding_dedup")
        if nonnull.isEmpty():  # batch op's dim probe would crash
            nd_row = {"stage": stage, "n_dropped": 0,
                      "n_preindexed_rows_dropped": 0,
                      "n_preindexed_changed": 0, "n_capped_rows": 0,
                      "n_capped_buckets": 0, "max_bucket_n": 0,
                      "metrics_observed": False}
            clean = keyed.drop("_ek")
            action = (("create", clean) if index_path is not None else None)
            return clean, nd_row, None, action, None
        obs = Observation("embedding_dedup_capping")
        pairs = embedding_near_duplicates(
            nonnull, "_ek", vec_col, threshold=threshold,
            n_planes=n_planes, observation=obs)
        drops = pairs.select(F.col("id_b").alias("_ek")).distinct()
        drops.persist()
        n_nd = drops.count()  # fires the observation; pins the drop set
        m = capped_bucket_metrics(obs)
        metrics_observed = m is not None
        if m is None:
            # zero pairs end-to-end prunes the observed subtree; recount
            # exactly (rare path, one extra bucket scan) -- with the SAME
            # cap constant the capped join used, so a future tune cannot
            # desynchronize the audit from the join it describes
            from ..operators.dedup import (
                EMB_MAX_BUCKET_SIZE, bucket_cap_stats,
                make_hyperplane_bucket_udf)
            dim = nonnull.select(F.size(vec_col).alias("d")).first()["d"]
            bucket = make_hyperplane_bucket_udf(n_planes, dim)
            sizes = (nonnull.select(bucket(F.col(vec_col)).alias("bkt"))
                     .groupBy("bkt").agg(F.count("*").alias("n")))
            m = bucket_cap_stats(sizes, EMB_MAX_BUCKET_SIZE)
        deduped = keyed.join(drops, "_ek", "left_anti").drop("_ek")
        nd_row = {"stage": stage, "n_dropped": n_nd,
                  "n_preindexed_rows_dropped": 0,
                  "n_preindexed_changed": 0,
                  "n_capped_rows": m["n_capped_rows"],
                  "n_capped_buckets": m["n_capped_buckets"],
                  "max_bucket_n": m["max_bucket_n"],
                  "metrics_observed": metrics_observed}
        action = (("create", deduped) if index_path is not None else None)
        return deduped, nd_row, drops, action, None

    if abs(float(meta["threshold"]) - threshold) > 1e-12:
        raise ValueError(
            f"embedding index at {index_path} was built with threshold "
            f"{meta['threshold']}; this run requested {threshold} -- "
            f"rebuild the index or match the threshold")
    committed = (_committed_ids(spark, index_path)
                 .withColumnRenamed("doc_id", "_ek"))
    n_pre = keyed.join(committed, "_ek", "left_semi").count()
    probe_keyed = (changed_probe_df.withColumn(
                       "_ek", F.struct("conv_id", "turn_idx"))
                   if changed_probe_df is not None else keyed)
    n_pre_probe = (probe_keyed.join(committed, "_ek", "left_semi").count()
                   if changed_probe_df is not None else n_pre)
    n_pre_changed = 0
    changed_rows = None
    if n_pre_probe:  # split identical vs CHANGED re-exports (reindex)
        from ..operators.embedding_index import changed_preindexed_ids
        changed_ids = (changed_preindexed_ids(
            probe_keyed, "_ek", vec_col, index_path)
            .withColumnRenamed("doc_id", "_ek"))
        n_pre_changed = changed_ids.count()
        if collect_changed and n_pre_changed:
            # persisted for the same reason as the MinHash branches
            changed_rows = probe_keyed.join(F.broadcast(changed_ids),
                                            "_ek", "left_semi").persist()
    obs = Observation("embedding_dedup_capping")
    pairs = embedding_near_duplicates_incremental(
        keyed, "_ek", vec_col, index_path, observation=obs)
    drops = (incremental_drop_keys(pairs)
             .withColumnRenamed("doc_id", "_ek"))
    drops.persist()
    n_nd = drops.count()
    m = capped_bucket_metrics(obs)
    metrics_observed = m is not None
    if m is None:
        m = embedding_index_bucket_audit(keyed, "_ek", vec_col, index_path)
    deduped = (keyed.join(drops, "_ek", "left_anti")
               .join(committed, "_ek", "left_anti").drop("_ek"))
    nd_row = {"stage": "embedding_dedup_incremental", "n_dropped": n_nd,
              "n_preindexed_rows_dropped": n_pre,
              "n_preindexed_changed": n_pre_changed,
              "n_capped_rows": m["n_capped_rows"],
              "n_capped_buckets": m["n_capped_buckets"],
              "max_bucket_n": m["max_bucket_n"],
              "metrics_observed": metrics_observed}
    return deduped, nd_row, drops, ("append", deduped), changed_rows


def _nonempty_lines(col) -> F.Column:
    return F.size(F.filter(F.split(F.coalesce(col, F.lit("")), "\n"),
                           lambda x: F.length(F.trim(x)) > 0))


def _assert_retention(stage: str, rows_in: int, rows_out: int,
                      lines_in: int, lines_out: int,
                      min_line_ratio: float) -> dict:
    """The reference's accept/reject content validation, as hard guards.

    Analog of RedactPro.tsx:1337-1349 (cleaned lines >= 0.6x) and
    :1390-1398 (final output rejected under 0.5x of input lines) -- but
    the scrub stage is 1:1 by construction, so rows get an exact ==
    guard and only the content-line ratio is a threshold."""
    if rows_out != rows_in:
        raise RetentionError(
            f"stage {stage}: wrote {rows_out} rows for {rows_in} input rows "
            f"(the scrub stage is row-preserving; a transform corrupted it)")
    if lines_in > 0 and lines_out < min_line_ratio * lines_in:
        raise RetentionError(
            f"stage {stage}: masked output retains {lines_out}/{lines_in} "
            f"non-empty lines (< {min_line_ratio:.0%}); rejecting the run")
    return {"stage": f"{stage}_retention", "rows_in": rows_in,
            "rows_out": rows_out, "lines_in": lines_in,
            "lines_out": lines_out}


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    resume: bool = False,
    dedup: bool = False,
    near_dedup_threshold: Optional[float] = None,
    near_dedup_index_path: Optional[str] = None,
    near_dedup_scope: str = "turn",
    embedding_dedup_threshold: Optional[float] = None,
    embedding_index_path: Optional[str] = None,
    embedding_col: str = "embedding",
    embedding_n_planes: int = 16,
    reindex_changed: bool = False,
    sample_fraction: Optional[float] = None,
    sample_seed: int = 0,
    sample_key_cols: Optional[list] = None,
    sample_n_per_stratum: Optional[int] = None,
    sample_strata_cols: Optional[list] = None,
    sample_token_shares: Optional[dict] = None,
    sample_token_stratum_col: Optional[str] = None,
    sample_token_budget: Optional[int] = None,
    sample_token_col: Optional[str] = None,
    sample_token_allow_short: bool = False,
    drop_toxic_above: Optional[float] = None,
    gopher_quality_rules=None,
    repetition_thresholds=None,
    quality_model_path: Optional[str] = None,
    quality_min_score: Optional[float] = None,
    perplexity_model_path: Optional[str] = None,
    perplexity_max: Optional[float] = None,
    decontaminate_against: Optional[str] = None,
    decontam_text_col: str = "text",
    decontam_k: int = 13,
    decontam_min_hits: int = 1,
    decontam_ngrams: str = "char",
    decontam_scope: str = "turn",
    decontam_min_containment: Optional[float] = None,
    decontam_mode: str = "exact",
    min_line_ratio: float = 0.5,
    scrub_transform=scrub_transcripts,
    **scrub_kwargs,
) -> dict:
    """Batch entry point: parquet in, ordered parquet out, metrics + lineage.

    ``resume=True`` anti-joins against keys already present in the output
    (idempotent restart per the north rule).  ``dedup=True`` drops
    exact-duplicate turns before the scrub stage (deterministic
    first-occurrence winner).  ``near_dedup_threshold`` (e.g. 0.8)
    additionally drops MinHash-LSH near-duplicate turns (keep-first by
    ``(conv_id, turn_idx)``; see :func:`near_deduplicate_turns`) and
    writes the LSH recall-cap counters (``n_capped_buckets`` etc.,
    observed on the drop-set materialization -- no extra input scan) to
    the ``_lineage_neardup`` sidecar; the computed drop keys persist to a
    ``_neardup_drops`` sidecar so a resumed run reuses them (one anti-join)
    instead of recomputing full-input LSH.  ``near_dedup_index_path``
    switches near-dedup to INCREMENTAL mode for daily ingest slices: the
    slice LSH-joins against the persisted MinHash index at that path
    (bootstrap-created on first run, appended after every successful
    write), dropping turns that near-match the already-ingested corpus or
    an earlier turn of the slice -- O(slice), never O(corpus); see
    ``operators/minhash_index.py``.  ``near_dedup_scope="conversation"``
    switches near-dedup to document granularity: whole conversations whose
    union-of-turn-shingle Jaccard matches an earlier conversation are
    dropped (:func:`near_deduplicate_conversations`); ``"turn"`` (default)
    keeps the per-turn behavior.  The two options compose: conversation
    scope with an index path maintains a GROUP-granularity index
    (conversations are closed per slice; a turn-scope run against a group
    index, or vice versa, fails loudly on the granularity pinned in the
    index meta).
    ``embedding_dedup_threshold`` (e.g. 0.95) near-dedups on a
    precomputed ``embedding_col`` array column instead of / in addition
    to text shingles: turns whose embedding cosine matches an earlier
    turn (or, with ``embedding_index_path``, the already-ingested corpus
    via the persisted hyperplane index -- bootstrap-created on first run,
    appended after every successful write, exactly like the MinHash
    index) are dropped keep-first/corpus-wins; counters land in the
    ``_lineage_embdedup`` sidecar.  NULL embeddings never drop.  Both
    dedup families compose: MinHash runs first, the embedding stage sees
    its survivors.
    ``reindex_changed=True`` (requires an index path) ACTS on the
    ``n_preindexed_changed`` counters instead of only reporting them:
    after the main write and the index appends, committed keys whose
    slice content differs from the indexed state (a re-crawl replaced
    the doc, a conversation grew, a turn was re-embedded) are rebuilt
    into a fresh index epoch (``reindex_docs`` / ``reindex_groups`` /
    ``reindex_embeddings``) so FUTURE slices dedup against the current
    content instead of the stale signature; each reindex appends a
    ``{stage, n_keys, epoch}`` row to the ``_lineage_reindex`` sidecar.
    The changed rows are still DROPPED from this run's output (they are
    re-exports of already-written keys; replacing the stale OUTPUT rows
    is the caller's upsert -- Iceberg MERGE in the nominal deployment).
    To give that MERGE a source, the changed keys' current content is
    ALSO run through the same gates as the main path -- decontamination,
    toxicity (pre-scrub, like the main gate), the replacement probes
    against the near-dedup indexes (``probe_index_near_duplicates`` /
    ``probe_embedding_index_near_duplicates``: new content duplicating a
    DIFFERENT surviving committed key must not land; resembling the
    key's own predecessor never deletes), and the pure sampling-fraction
    rule -- then scrubbed and written to
    ``{output_path}/_changed_upsert`` with an ``_action`` column:
    ``upsert`` rows carry the processed replacement (MERGE: matched ->
    update, not-matched -> insert, covering a grown conversation's new
    turns); ``update`` replaces ``upsert`` whenever a rank-based
    sampling gate (exact-n stratified / token-budget mix) is active --
    rank membership is a property of the original run's population and
    cannot be re-derived per key, so replacements update matched rows
    but never insert; ``delete`` rows mark keys whose NEW content fails
    a drop gate so the stale output row must be removed.  Replacement
    keys the fraction rule excludes are dropped from the sidecar
    outright (they were never written; ``n_sampled_out`` counts them).
    Under ``decontam_scope="conversation"``, changed rows join the
    contamination flag source (a changed turn quoting a benchmark
    poisons its conversation's clean new siblings in the main write
    too), and the poisoned conversations' already-committed keys --
    enumerated from a turn-keyed index when one is active -- are
    emitted as key-only ``delete`` rows (retroactive contamination; a
    group-granularity index alone cannot enumerate turn keys, so that
    configuration covers only the keys present in the changed set).
    Near-dedup replacement probes run for all three index shapes: the
    turn-scope MinHash index and the embedding index probe per key, and
    a conversation-granularity index probes whole-group content
    (:func:`operators.minhash_index.probe_grouped_index_near_duplicates`)
    with a dropped gid deleting every replacement row of that
    conversation.
    The sidecar is written before the reindex commits, so a crash
    between the two can only duplicate byte-identical rows on the
    re-run (dedupe the MERGE source by key), never lose them; counts
    land in ``_lineage_upsert`` (read lineage sidecars with
    ``mergeSchema=true``; columns are additive across versions).
    At most one epoch per slice-with-changes accrues per index; compact
    periodically (``compact_doc_index`` etc.).  Conversation scope
    assumes the re-export carries each changed conversation's FULL
    current member rows (the same closed-per-slice convention the
    grouped index documents).  A completed-slice re-run finds zero
    changed keys (the index now stores the current content) and creates
    no further epochs -- the restart stays idempotent.
    ``sample_fraction`` (e.g. 0.1) keeps a deterministic hash sample of
    the dedup survivors (operators/sampling.py: membership is a pure
    function of ``sample_key_cols`` + ``sample_seed`` -- rerun-stable,
    partitioning-invariant, and NESTED across fractions at the same
    seed, so the 1% mix built through this entry point is a subset of
    the 10% mix); ``sample_n_per_stratum`` + ``sample_strata_cols``
    (e.g. 1000 per ``role``) instead/additionally keeps exactly
    min(n, stratum_size) rows per stratum by the same hash rank
    (duplicate keys fail loudly -- run with ``dedup=True``).  Both run
    BEFORE resume_filter (the stratified keep set depends on the full
    stratum population) and their counts land in the ``_lineage_sample``
    sidecar.  The fraction gate is resume-stable on ANY input
    (membership is per-row); the exact-n gate is resume-stable only on
    IDENTICAL input, so a resume whose input size differs from the
    original run's (recorded in the sidecar) is refused -- appending a
    re-ranked top-n over grown input would exceed n per stratum.  ``sample_token_shares`` + ``sample_token_stratum_col``
    (e.g. ``{"user": 0.7, "assistant": 0.3}`` over ``role``) sample
    toward a target per-stratum TOKEN mix instead
    (operators/sampling.py::token_budget_sample): per-stratum keep
    fractions derive from one token aggregate at ``sample_token_budget``
    total tokens (``None`` = max feasible); ``sample_token_col`` names a
    precomputed token-count column, default = ``length(text)`` as the
    char proxy.  Runs BEFORE resume_filter too -- the fractions are an
    aggregate of the FULL input, so a resumed run recomputes the same
    thresholds and the same membership; counts land in the
    ``_lineage_token_mix`` sidecar.  ``drop_toxic_above`` (e.g. 0.3) drops turns
    whose lexicon toxicity score exceeds the threshold, also pre-scrub so
    toxic turns never pay detection cost (operators/toxicity.py; NULL text
    scores 0 and is never dropped by this gate).
    ``gopher_quality_rules`` (the literal ``"gopher"`` or a
    metric->(min, max) dict) drops turns breaching any Gopher quality
    rule (:mod:`operators.doc_quality`: word count / mean word length
    bounds, hash/ellipsis symbol ratios, bullet/ellipsis line
    fractions, alphabetic-word fraction, stopword count).  Row-local
    column expressions -- the cheapest gate, so it runs first among
    the text-quality gates; drop count and the rule catalog land in
    the ``_lineage_docquality`` sidecar, and changed-upsert
    replacement rows are re-checked against the same rules.  NOTE:
    the full catalog's stopword/alpha rules are English-centric --
    pass a custom dict for the ja/en transcript mix.
    ``repetition_thresholds`` (the literal ``"gopher"`` or a metric->max
    dict) drops turns breaching any Gopher/MassiveText repetition rule
    (:mod:`operators.repetition`: duplicate line/paragraph fractions,
    top/duplicate n-gram char coverage), pre-scrub, after the cheap
    regex gates and before the classifier; drop count and the threshold
    catalog land in the ``_lineage_repetition`` sidecar, and
    changed-upsert replacement rows are re-checked against the same
    thresholds.  Requires unique ``(conv_id, turn_idx)`` keys.
    ``quality_model_path`` + ``quality_min_score`` apply a model-based
    quality filter (the CCNet/GPT-3 pattern): a persisted hashed-NB
    classifier (:mod:`operators.quality_classifier`) scores each turn
    fully JVM-side and rows below the threshold drop pre-scrub, last
    among the row gates (it is the most expensive one); drop counts and
    the model geometry land in the ``_lineage_quality`` sidecar, and
    changed-upsert replacement rows are re-checked with the same model.
    Requires unique ``(conv_id, turn_idx)`` keys (run ``dedup=True``
    first on dirty input).
    ``perplexity_model_path`` + ``perplexity_max`` apply the CCNet
    pattern's other half: a persisted smoothed unigram LM
    (:mod:`operators.lm_perplexity`) scores each turn's mean negative
    token log-prob (nats) fully JVM-side and rows above the cutoff
    drop pre-scrub; token-less rows score NULL and pass.  Drop counts
    and the model geometry land in the ``_lineage_perplexity``
    sidecar; changed-upsert replacement rows are re-checked with the
    same model.  Same unique-key requirement as the classifier.
    ``decontaminate_against`` (a parquet path of benchmark rows with a
    ``decontam_text_col`` text column) drops turns that share at least
    ``decontam_min_hits`` exact ``decontam_k``-gram shingles with the
    benchmark set (operators/decontaminate.py) -- the standard
    eval-contamination gate; the drop count + parameters land in the
    ``_lineage_decontam`` sidecar.  At the default ``turn`` scope the
    gate is per-row-independent like the toxicity gate, so it composes
    with resume/dedup in any order without changing winner sets.
    ``decontam_scope="conversation"`` widens the drop from the flagged
    turn to its whole conversation (one quoted eval question makes the
    surrounding dialog eval-correlated -- the document-level rule most
    pipelines apply; the lineage ``n_dropped`` then counts
    conversations) -- and is therefore NOT order-independent: the flag
    runs on the dedup stages' SURVIVORS, so if near-dedup dropped a
    conversation's only contaminated turn in favor of a near-copy in
    another conversation, that conversation's remaining turns are kept.
    Run decontamination on the raw dump (a separate
    ``run_pipeline`` pass, or ``flag_benchmark_overlap`` directly) when
    the stricter pre-dedup document rule is required.  ``decontam_min_containment`` (e.g. 0.7) switches
    the flag rule from global-set hit counting to per-benchmark-row
    containment (:func:`operators.decontaminate.benchmark_overlap_report`):
    a turn is contaminated when >= that fraction of any SINGLE eval
    row's distinct k-grams appear in it, with ``decontam_min_hits`` as
    an absolute floor.  ``decontam_mode="fuzzy"`` swaps the exact-gram
    flag for the paraphrase-tolerant windowed-LSH containment rule
    (:func:`operators.decontaminate.flag_benchmark_near_overlap`):
    ``decontam_min_containment`` becomes the required verify threshold
    and ``decontam_k`` the SHORT shingle size (e.g. 7 -- short grams
    survive a light rewording).  Lineage sidecar schemas are ADDITIVE across releases
    (e.g. r5 added ``ngrams`` to ``_lineage_decontam``): an output
    directory resumed across an upgrade can hold lineage files with and
    without a new column, so audits should read sidecars with
    ``option("mergeSchema", "true")`` -- plain reads infer the schema
    from an arbitrary file.

    Retention guards (reference accept/reject ratios,
    RedactPro.tsx:1337-1349,1390-1398): input rows and masked non-empty
    line counts are observed on the SAME pass as the write (zero extra
    scans); after the write the run fails with ``RetentionError`` if any
    row was lost/duplicated by the scrub stage or if masked content drops
    below ``min_line_ratio`` of the input's non-empty lines.  Guard
    metrics are appended to the ``_lineage_guards`` sidecar (separate from
    ``_lineage``: mixed schemas in one parquet dir read back unreliably).  ``scrub_transform``
    is the stage injection point (swap in a variant transform; tests use
    it to prove a corrupting transform trips the guard)."""
    from pyspark.sql import Observation

    from .checkpoint import resume_filter, write_with_lineage

    t0 = time.time()
    df = spark.read.parquet(input_path)
    # dedup stages run BEFORE resume_filter: both pick winners by
    # (conv_id, turn_idx) order over the FULL input, so a resumed run
    # reproduces the uninterrupted run's winner set exactly.  The reverse
    # order is wrong: if run 1 wrote turn A and crashed before A's
    # duplicate B, a resume-filtered input no longer contains A, the
    # (A, B) pair is never formed, and B survives -- the restart would
    # not be idempotent.  Cost: resumed runs redo dedup over the full
    # input, the right trade for deterministic output.
    if dedup:
        df = deduplicate_turns(df)
    nd_gate_on = (near_dedup_threshold is not None
                  and near_dedup_index_path is not None)
    eb_gate_on = (embedding_dedup_threshold is not None
                  and embedding_index_path is not None)
    if reindex_changed and not (nd_gate_on or eb_gate_on):
        raise ValueError(
            "reindex_changed=True acts on a persisted index's changed "
            "re-exports; enable at least one index gate (near_dedup_"
            "threshold + near_dedup_index_path, and/or embedding_dedup_"
            "threshold + embedding_index_path) -- an index path alone is "
            "never consulted, so the flag would be a silent no-op")
    if (quality_model_path is None) != (quality_min_score is None):
        raise ValueError(
            "quality_model_path and quality_min_score must be set "
            "together: a model without a threshold (or vice versa) "
            "would be a silent no-op gate")
    if (perplexity_model_path is None) != (perplexity_max is None):
        raise ValueError(
            "perplexity_model_path and perplexity_max must be set "
            "together: a model without a threshold (or vice versa) "
            "would be a silent no-op gate")
    rep_thresholds = None
    if repetition_thresholds is not None:
        from ..operators.repetition import GOPHER_THRESHOLDS
        if repetition_thresholds == "gopher":
            rep_thresholds = dict(GOPHER_THRESHOLDS)
        elif isinstance(repetition_thresholds, dict):
            if not repetition_thresholds:
                raise ValueError("repetition_thresholds dict is empty")
            rep_thresholds = {k: float(v)
                              for k, v in repetition_thresholds.items()}
        else:
            raise ValueError(
                "repetition_thresholds must be the literal 'gopher' or "
                f"a metric->max dict, got {repetition_thresholds!r}")
    gq_rules = None
    if gopher_quality_rules is not None:
        from ..operators.doc_quality import validate_gopher_quality_rules
        gq_rules = validate_gopher_quality_rules(gopher_quality_rules)
    nd_drops = None
    eb_drops = None
    dc_drops = None
    rep_drops = None
    q_drops = None
    p_drops = None
    nd_changed_rows = None
    eb_changed_rows = None
    up_cached = None
    # Outer cache guard: every persisted frame the body creates is
    # released here even when a gate raises BEFORE the write-tail
    # try/finally is entered (model reads, benchmark reads and
    # sidecar writes all sit between a persist and that try) -- a
    # long-lived session must not accumulate dead cache entries.
    # The inner finally keeps its own unpersists; unpersist is
    # idempotent.
    try:
        nd_row = None
        nd_drops = None
        nd_index_action = None  # slice mode: ("create"|"append", kept_df)
        nd_changed_rows = None  # slice rows of changed pre-indexed keys
        # the embedding stage's changed-re-export detection must see the
        # slice BEFORE the MinHash gate anti-joins its committed keys away:
        # a doubly-committed key whose re-export changed text AND embedding
        # is dropped there, and probing only the post-gate rows would freeze
        # its stale vector in the embedding index forever
        df_pre_index = df if (reindex_changed and eb_gate_on) else None
        if near_dedup_threshold is not None:
            if near_dedup_scope not in ("turn", "conversation"):
                raise ValueError(
                    f"near_dedup_scope must be 'turn' or 'conversation', "
                    f"got {near_dedup_scope!r}")
            if near_dedup_index_path is not None:
                (df, nd_row, nd_drops, nd_index_action,
                 nd_changed_rows) = _near_dedup_slice_stage(
                    spark, df, float(near_dedup_threshold),
                    near_dedup_index_path, scope=near_dedup_scope,
                    collect_changed=reindex_changed)
            else:
                df, nd_row, nd_drops = _near_dedup_full_stage(
                    spark, df, float(near_dedup_threshold), output_path, resume,
                    scope=near_dedup_scope)
            # persist the recall-risk counters BEFORE the main write: a run
            # that later trips the retention guard is exactly the run whose
            # capping metrics an operator needs to see
            # (own sidecar: mixed schemas in one parquet dir read unreliably)
            spark.createDataFrame([nd_row]).write.mode("append").parquet(
                f"{output_path}/_lineage_neardup")
        eb_drops = None
        eb_index_action = None  # ("create"|"append", kept_df)
        eb_changed_rows = None
        if embedding_dedup_threshold is not None:
            (df, eb_row, eb_drops, eb_index_action,
             eb_changed_rows) = _embedding_dedup_stage(
                spark, df, float(embedding_dedup_threshold),
                embedding_index_path, embedding_col, int(embedding_n_planes),
                collect_changed=reindex_changed,
                changed_probe_df=(df_pre_index if nd_gate_on else None))
            spark.createDataFrame([eb_row]).write.mode("append").parquet(
                f"{output_path}/_lineage_embdedup")
        # one definition of the sampling key set, shared by the row-sampling
        # gate, the token-mix gate, and the changed-upsert re-check
        sp_keys = (list(sample_key_cols) if sample_key_cols
                   else ["conv_id", "turn_idx"])
        if sample_fraction is not None or sample_n_per_stratum is not None:
            # Sampling runs on the dedup survivors and BEFORE resume_filter,
            # for the same reason the dedup stages do: fraction membership is
            # a pure per-row function of key + seed (placement-independent),
            # but the stratified rank-n keep set depends on the full stratum
            # population -- ranking only the resume-unwritten rows would pick
            # a different top-n than the uninterrupted run.  Lineage counts
            # are computed eagerly from the SAME predicate / rank rule as the
            # filter (one extra narrow agg pass per sub-gate, the price every
            # counted gate here pays) and land in the _lineage_sample sidecar
            # before the main write.
            from ..operators.sampling import (
                deterministic_sample, sample_keep_condition,
                stratified_sample_n)
            sp_rows_in = sp_rows_kept = None
            if sample_fraction is not None:
                cond = sample_keep_condition(sp_keys, float(sample_fraction),
                                             int(sample_seed))
                srow = df.agg(
                    F.count(F.lit(1)).alias("n_in"),
                    F.coalesce(F.sum(cond.cast("long")), F.lit(0))
                     .alias("n_kept")).first()
                sp_rows_in = int(srow["n_in"])
                sp_rows_kept = int(srow["n_kept"])
                df = deterministic_sample(df, sp_keys, float(sample_fraction),
                                          int(sample_seed))
            if sample_n_per_stratum is not None:
                if not sample_strata_cols:
                    raise ValueError(
                        "sample_n_per_stratum requires sample_strata_cols "
                        "(the columns defining each stratum)")
                strata = list(sample_strata_cols)
                # kept count = sum over strata of min(n, stratum_size) --
                # exact, from one groupBy pass, no second ranked scan
                srow = (df.groupBy(*strata).agg(F.count(F.lit(1)).alias("c"))
                        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_in"),
                             F.coalesce(
                                 F.sum(F.least(
                                     F.col("c"),
                                     F.lit(int(sample_n_per_stratum)))),
                                 F.lit(0)).alias("n_kept"))
                        .first())
                if sp_rows_in is None:
                    sp_rows_in = int(srow["n_in"])
                sp_rows_kept = int(srow["n_kept"])
                if resume:
                    # exact-n is a RANK over the full stratum population, so
                    # it is resume-stable only when the rank inputs are
                    # identical: on a grown/changed input (or with a changed
                    # seed / n / strata) a resumed run re-ranks, newly-top-n
                    # rows are written while previously-written rows that
                    # fell out stay -- the output would silently exceed n
                    # per stratum.  The sidecar records each run's full rank
                    # parameters; a mismatch is fatal only if the resume
                    # would actually APPEND rows (a completed prior run
                    # whose rows were all already written -- e.g. an
                    # upstream preindexed-drop gate emptied this re-run's
                    # slice -- is a harmless no-op and passes).
                    from pyspark.errors import AnalysisException
                    this_run = (sp_rows_in, int(sample_seed),
                                int(sample_n_per_stratum), ",".join(sp_keys),
                                ",".join(strata))
                    try:
                        prior = (spark.read.option("mergeSchema", "true")
                                 .parquet(f"{output_path}/_lineage_sample")
                                 .filter(F.col("n_per_stratum").isNotNull())
                                 .select("rows_in", "seed", "n_per_stratum",
                                         "key_cols", "strata_cols").collect())
                    except AnalysisException:
                        prior = []  # first run: no sidecar yet
                    mismatch = [r for r in prior
                                if (int(r["rows_in"]), int(r["seed"]),
                                    int(r["n_per_stratum"]), r["key_cols"],
                                    r["strata_cols"]) != this_run]
                    if mismatch and not resume_filter(
                            df, output_path).isEmpty():
                        r = mismatch[0]
                        raise ValueError(
                            f"sample_n_per_stratum under resume=True requires "
                            f"the SAME input and rank parameters as the "
                            f"original run (prior: rows_in={r['rows_in']}, "
                            f"seed={r['seed']}, n={r['n_per_stratum']}, "
                            f"keys={r['key_cols']}, strata={r['strata_cols']};"
                            f" this run: {this_run}): the rank-n keep set "
                            f"changes and the appended output would exceed n "
                            f"per stratum -- write to a fresh output instead")
                # strict=True: duplicate keys would make the rank-n boundary
                # partitioning-dependent -- fail loudly, pointing at dedup
                df = stratified_sample_n(df, strata,
                                         int(sample_n_per_stratum), sp_keys,
                                         int(sample_seed), strict=True)
            sp_row = {"stage": "sample",
                      "fraction": (float(sample_fraction)
                                   if sample_fraction is not None else None),
                      "seed": int(sample_seed),
                      "key_cols": ",".join(sp_keys),
                      "n_per_stratum": (int(sample_n_per_stratum)
                                        if sample_n_per_stratum is not None
                                        else None),
                      "strata_cols": (",".join(sample_strata_cols)
                                      if sample_strata_cols else None),
                      "rows_in": sp_rows_in, "rows_kept": sp_rows_kept,
                      "n_dropped": sp_rows_in - sp_rows_kept}
            # explicit schema: fraction / n_per_stratum are None when the
            # other sub-gate is active, and inference cannot type all-None
            spark.createDataFrame(
                [sp_row],
                schema="stage string, fraction double, seed long, "
                       "key_cols string, n_per_stratum long, "
                       "strata_cols string, rows_in long, rows_kept long, "
                       "n_dropped long",
            ).write.mode("append").parquet(f"{output_path}/_lineage_sample")
        if sample_token_shares is not None:
            # token-budget mixture gate: like the row-sampling gate it sits
            # BEFORE resume_filter -- the per-stratum fractions are an
            # aggregate of the FULL input, so a resumed run derives the same
            # thresholds and membership stays a pure function of key + seed
            if not sample_token_stratum_col:
                raise ValueError(
                    "sample_token_shares requires sample_token_stratum_col "
                    "(the column whose values the shares key on)")
            import json as _json

            from ..operators.sampling import (
                token_budget_keep_condition, token_budget_sample)
            tok = (F.col(sample_token_col) if sample_token_col
                   else F.length(F.coalesce(F.col("text"), F.lit(""))))
            keyed_tok = df.withColumn("_tok", tok)
            sampled, tm_info = token_budget_sample(
                keyed_tok, sample_token_stratum_col, sample_token_shares,
                sp_keys, "_tok", total_tokens=sample_token_budget,
                seed=int(sample_seed),
                allow_short=bool(sample_token_allow_short))
            df = sampled.drop("_tok")
            # rows_in rides the operator's own stratum aggregate; rows_kept
            # is one agg over the SAME keep condition the filter uses (the
            # fraction gate's single-definition pattern) -- no extra full
            # count passes
            tm_in = int(tm_info["rows_in"])
            cond = token_budget_keep_condition(
                sample_token_stratum_col, tm_info["strata"], sp_keys,
                int(sample_seed))
            tm_kept = int(keyed_tok.agg(
                F.coalesce(F.sum(cond.cast("long")), F.lit(0))).first()[0])
            tm_row = {"stage": "sample_token_mix",
                      "stratum_col": sample_token_stratum_col,
                      "shares": _json.dumps(sample_token_shares,
                                            sort_keys=True),
                      "budget_tokens": float(tm_info["budget_tokens"]),
                      "seed": int(sample_seed),
                      "key_cols": ",".join(sp_keys),
                      "token_col": sample_token_col,
                      "strata": _json.dumps(tm_info["strata"],
                                            sort_keys=True),
                      "rows_in": tm_in, "rows_kept": tm_kept,
                      "n_dropped": tm_in - tm_kept}
            spark.createDataFrame(
                [tm_row],
                schema="stage string, stratum_col string, shares string, "
                       "budget_tokens double, seed long, key_cols string, "
                       "token_col string, strata string, rows_in long, "
                       "rows_kept long, n_dropped long",
            ).write.mode("append").parquet(f"{output_path}/_lineage_token_mix")
        if resume:
            df = resume_filter(df, output_path)
        dc_drops = None
        dc_flagger = None  # the configured contamination rule, reused by
        # the changed-upsert stage after the write
        if decontaminate_against is not None:
            # per-row-independent gate, so it sits AFTER resume_filter (a
            # resumed run only re-checks still-unwritten turns); the flagged
            # key set is small by construction, so persist + count it for
            # lineage, then one anti-join -- the same drop-set pattern as
            # near-dedup.  Runs before the toxicity filter so contaminated
            # turns never pay the toxicity regex either.
            if decontam_scope not in ("turn", "conversation"):
                raise ValueError(
                    f"decontam_scope must be 'turn' or 'conversation', "
                    f"got {decontam_scope!r}")
            if decontam_mode not in ("exact", "fuzzy"):
                raise ValueError(
                    f"decontam_mode must be 'exact' or 'fuzzy', "
                    f"got {decontam_mode!r}")
            from ..operators.decontaminate import (
                benchmark_overlap_report, contaminated_keys,
                flag_benchmark_near_overlap)
            bench_df = spark.read.parquet(decontaminate_against)
            keyed = df.withColumn("_ck", F.struct("conv_id", "turn_idx"))
            # shared by both per-bench-row branches (fuzzy + containment):
            # one definition, the two modes cannot drift
            _bench_ided = bench_df.withColumn(
                "_bid", F.md5(F.coalesce(F.col(decontam_text_col),
                                         F.lit(""))))
            if decontam_mode == "fuzzy":
                # the fuzzy branch's extra parameter contract, validated
                # up-front (the flagger below is also reused by the
                # changed-upsert stage, which must fail here, not there)
                if decontam_min_containment is None:
                    raise ValueError(
                        "decontam_mode='fuzzy' requires "
                        "decontam_min_containment (the containment verify "
                        "threshold)")
                if decontam_ngrams != "char":
                    raise ValueError(
                        "decontam_mode='fuzzy' supports char shingles only "
                        f"(got ngrams={decontam_ngrams!r})")

            def dc_flagger(keyed_df):
                """``_ck``-keyed rows -> distinct flagged ``_ck`` keys.

                One definition of the configured contamination rule, applied
                to the main slice here and to the changed-upsert rows after
                the write -- the two call sites cannot drift."""
                if decontam_mode == "fuzzy":
                    # paraphrase-tolerant rule: windowed MinHash-LSH
                    # candidates + short-shingle containment verify
                    # (flag_benchmark_near_overlap).  decontam_k is the
                    # SHINGLE size here -- keep it SHORT (operator default
                    # 7): short grams survive a light rewording, which is
                    # the whole point; decontam_min_containment is the
                    # required verify threshold.  Word grams have no fuzzy
                    # variant (the windowing is char-positional).
                    rep = flag_benchmark_near_overlap(
                        keyed_df, "_ck", "text", _bench_ided, "_bid",
                        bench_text_col=decontam_text_col,
                        threshold=float(decontam_min_containment),
                        shingle_k=int(decontam_k))
                    # min_hits applies as an absolute floor exactly as in
                    # the exact containment branch: a tiny eval row hits
                    # 100% containment on a handful of shared short grams
                    # otherwise
                    return (rep.filter(F.col("n_hits")
                                       >= F.lit(int(decontam_min_hits)))
                            .select("_ck").distinct())
                if decontam_min_containment is not None:
                    # PaLM-style rule: flag a turn when >= this fraction of
                    # ANY single benchmark row's distinct k-grams appear in
                    # it -- per-row containment needs the attribution
                    # report, not the global-set hit count (a turn grazing
                    # 1 gram from each of 1000 eval rows is noise; 70% of
                    # one row is a quote).  min_hits still applies as a
                    # floor (tiny eval rows would otherwise hit 100%
                    # containment on one shared gram).  The benchmark row
                    # id is derived from the row's TEXT (md5):
                    # deterministic under retries, and duplicate benchmark
                    # texts collapsing into one id is exactly right --
                    # their gram sets are identical.
                    rep = benchmark_overlap_report(
                        keyed_df, "_ck", "text", _bench_ided, "_bid",
                        bench_text_col=decontam_text_col,
                        k=int(decontam_k), min_hits=int(decontam_min_hits),
                        ngrams=decontam_ngrams,
                        min_containment=float(decontam_min_containment))
                    return rep.select("_ck").distinct()
                return contaminated_keys(
                    keyed_df, "_ck", "text", bench_df,
                    bench_text_col=decontam_text_col,
                    k=int(decontam_k), min_hits=int(decontam_min_hits),
                    ngrams=decontam_ngrams)

            if decontam_scope == "conversation":
                # one contaminated turn poisons the whole conversation (a
                # quoted eval question makes the surrounding dialog eval-
                # correlated too -- the standard document-level drop rule);
                # n_dropped then counts CONVERSATIONS, cheap by construction
                # (no extra full-input scan for a turn recount).
                # Changed re-exports' CURRENT content joins the flag source:
                # a changed committed turn quoting a benchmark poisons its
                # conversation, but that turn is not in ``keyed`` (the index
                # gate dropped it as committed) -- without the union the main
                # gate would write the conversation's clean sibling turns
                # while the upsert stage deleted only the changed row.  Only
                # collected under reindex_changed; otherwise the changed
                # content stays counted-not-acted, as documented.
                flag_src = keyed.select("_ck", "text")
                for ch in (nd_changed_rows, eb_changed_rows):
                    if ch is not None:
                        flag_src = flag_src.unionByName(
                            ch.withColumn(
                                "_ck", F.struct("conv_id", "turn_idx"))
                            .select("_ck", "text"))
                flagged = dc_flagger(flag_src)
                dc_drops = flagged.select(F.col("_ck.conv_id").alias(
                    "conv_id")).distinct()
                dc_drops.persist()
                n_contam = dc_drops.count()
                # NULL-SAFE anti-join: a plain equi-join never matches NULL
                # keys, so a contaminated turn with conv_id=NULL would pass
                # straight through the supposedly-stricter conversation
                # scope (the turn-scope struct join is null-safe for
                # embedded fields already)
                base_df = keyed.drop("_ck")
                dc = dc_drops.withColumnRenamed("conv_id", "_dc_conv")
                df = base_df.join(
                    dc, base_df["conv_id"].eqNullSafe(dc["_dc_conv"]),
                    "left_anti")
            else:
                dc_drops = dc_flagger(keyed)
                dc_drops.persist()
                n_contam = dc_drops.count()  # pins the drop set for the write
                df = keyed.join(dc_drops, "_ck", "left_anti").drop("_ck")
            dc_row = {"stage": "decontaminate", "n_dropped": n_contam,
                      "k": int(decontam_k), "min_hits": int(decontam_min_hits),
                      "ngrams": decontam_ngrams, "scope": decontam_scope,
                      "min_containment": (float(decontam_min_containment)
                                          if decontam_min_containment
                                          is not None else None),
                      "mode": decontam_mode,
                      "benchmark_path": decontaminate_against}
            # explicit schema: min_containment is NULL when the hit-count
            # rule is active, and inference cannot type an all-None field
            spark.createDataFrame(
                [dc_row],
                schema="stage string, n_dropped long, k long, min_hits long, "
                       "ngrams string, scope string, min_containment double, "
                       "mode string, benchmark_path string",
            ).write.mode("append").parquet(f"{output_path}/_lineage_decontam")
        if drop_toxic_above is not None:
            from ..operators.toxicity import toxicity_score_col
            df = df.filter(toxicity_score_col(F.col("text"))
                           <= float(drop_toxic_above))
        if gq_rules is not None:
            # Gopher quality battery: row-local column expressions --
            # the cheapest gate in the battery, so it runs before the
            # aggregation-shaped ones (repetition, classifier, LM).
            # The keep verdict is a pure per-row function of text, so
            # counting and filtering in two jobs cannot disagree (no
            # cross-row float accumulation -- unlike the classifier
            # score, which pins its drop keys).
            from ..operators.doc_quality import (
                gopher_quality_keep_condition)
            gq_keep = gopher_quality_keep_condition(F.col("text"),
                                                    gq_rules)
            n_gq = df.filter(~gq_keep).count()
            df = df.filter(gq_keep)
            gq_str = ",".join(
                f"{k}=[{lo},{hi}]" for k, (lo, hi) in
                sorted(gq_rules.items()))
            spark.createDataFrame(
                [("gopher_quality", int(n_gq), gq_str)],
                schema="stage string, n_dropped long, rules string",
            ).write.mode("append").parquet(
                f"{output_path}/_lineage_docquality")
        rep_drops = None
        if rep_thresholds is not None:
            # Gopher repetition battery: per-row-independent like toxicity
            # but costs one explode per gram size, so it runs after the
            # cheap regex gates and before the classifier.  (conv_id,
            # turn_idx) must uniquely key the input (duplicate keys would
            # merge two turns' counters -- run dedup=True first), the same
            # documented requirement as the sampling/index operators.
            from ..operators.repetition import (
                repetition_keep_condition, repetition_stats,
                threshold_gram_sizes)
            r_tn, r_dn = threshold_gram_sizes(rep_thresholds)
            r_keyed = df.withColumn("_rk", F.struct("conv_id", "turn_idx"))
            r_stats = repetition_stats(r_keyed, "text", ["_rk"],
                                       top_ns=r_tn, dup_ns=r_dn)
            rep_drops = (r_stats.filter(
                ~repetition_keep_condition(r_stats, rep_thresholds))
                .select("_rk"))
            rep_drops.persist()
            n_rep = rep_drops.count()  # pins the drop set for the write
            df = r_keyed.join(rep_drops, "_rk", "left_anti").drop("_rk")
            thr_str = ",".join(f"{k}={v}"
                               for k, v in sorted(rep_thresholds.items()))
            spark.createDataFrame(
                [("repetition", int(n_rep), thr_str)],
                schema="stage string, n_dropped long, thresholds string",
            ).write.mode("append").parquet(
                f"{output_path}/_lineage_repetition")
        qc_model = None
        if quality_model_path is not None:
            # Model-based quality filter (CCNet/GPT-3-style): per-row-
            # independent like toxicity, but costs an explode + broadcast
            # join, so it runs LAST among the row gates -- rows the cheaper
            # gates drop never pay the classifier.  (conv_id, turn_idx)
            # must uniquely key the input (the per-row token aggregate is
            # joined back on it -- same documented requirement as the
            # sampling/index operators; run dedup=True first otherwise).
            from ..operators.quality_classifier import (
                read_quality_model, score_quality_classifier)
            qc_model = read_quality_model(spark, quality_model_path)
            scored = score_quality_classifier(
                df.withColumn("_qk", F.struct("conv_id", "turn_idx")),
                qc_model, ["_qk"], output_col="_qscore")
            # persist the drop KEYS and anti-join them, instead of counting
            # and filtering in two independent jobs: the score is a sum of
            # doubles, so a row at the threshold boundary could flip
            # between the two executions and the lineage count would
            # misstate the rows actually dropped (same pinning the
            # decontam/near-dedup drop sets get)
            q_drops = (scored.filter(
                F.col("_qscore") < float(quality_min_score)).select("_qk"))
            q_drops.persist()
            n_lowq = q_drops.count()
            df = (scored.join(q_drops, "_qk", "left_anti")
                  .drop("_qk", "_qscore"))
            spark.createDataFrame(
                [(str("quality_classifier"), int(n_lowq),
                  float(quality_min_score), str(quality_model_path),
                  int(qc_model["meta"]["dim"]),
                  int(qc_model["meta"]["ngram"]))],
                schema="stage string, n_dropped long, min_score double, "
                       "model_path string, dim long, ngram long",
            ).write.mode("append").parquet(f"{output_path}/_lineage_quality")
        lm_model = None
        if perplexity_model_path is not None:
            # CCNet-style LM perplexity gate: same shape and cost class as
            # the classifier (explode + broadcast token join), same
            # unique-key requirement.  A row whose mean token log-prob is
            # worse (higher log-perplexity) than the cutoff drops; rows
            # with NO tokens score NULL and pass, like NULL text in the
            # toxicity gate -- emptiness is the length gates' concern.
            from ..operators.lm_perplexity import (
                read_unigram_lm, score_perplexity)
            lm_model = read_unigram_lm(spark, perplexity_model_path)
            p_scored = score_perplexity(
                df.withColumn("_pk", F.struct("conv_id", "turn_idx")),
                lm_model, ["_pk"], output_col="_ppl")
            # pinned drop keys, for the same float-boundary reason as the
            # classifier gate above (NULL scores never match `>` -> pass)
            p_drops = (p_scored.filter(
                F.col("_ppl") > float(perplexity_max)).select("_pk"))
            p_drops.persist()
            n_hippl = p_drops.count()
            df = (p_scored.join(p_drops, "_pk", "left_anti")
                  .drop("_pk", "_ppl"))
            spark.createDataFrame(
                [(str("lm_perplexity"), int(n_hippl),
                  float(perplexity_max), str(perplexity_model_path),
                  int(lm_model["meta"]["n_tokens"]),
                  int(lm_model["meta"]["vocab_size"]),
                  int(lm_model["meta"]["min_count"]))],
                schema="stage string, n_dropped long, max_log_ppl double, "
                       "model_path string, n_tokens long, vocab_size long, "
                       "min_count long",
            ).write.mode("append").parquet(
                f"{output_path}/_lineage_perplexity")

        in_obs = Observation("retention_in")
        df = df.observe(in_obs, F.count(F.lit(1)).alias("rows_in"))
        scrubbed = scrub_transform(df, **scrub_kwargs)
        out_obs = Observation("retention_out")
        scrubbed = scrubbed.observe(
            out_obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(_nonempty_lines(F.col("text")).cast("long")).alias("lines_in"),
            F.sum(_nonempty_lines(F.col("masked_text")).cast("long"))
             .alias("lines_out"))

        # the finally guards the whole tail -- write, guards, AND index
        # maintenance: the index create/append consumes ``kept``, whose plan
        # anti-joins the persisted drop set, so unpersisting right after the
        # write would make index maintenance recompute the full near-dedup
        # LSH subtree instead of the claimed one signature pass over the
        # kept rows (deterministic either way; this is purely the cost)
        try:
            n = write_with_lineage(ordered(scrubbed), output_path, stage="scrub")

            def _obs(o) -> dict:
                # a fully-empty write (e.g. resume found no new keys) lets AQE
                # empty-propagation prune the observed subtree; the metrics row
                # is then absent and .get raises -- all-zero is correct
                try:
                    return o.get
                except Exception:
                    return {}

            m_in, m_out = _obs(in_obs), _obs(out_obs)
            # Both observations sit BELOW the range exchange, whose
            # boundary-sampling job executes the child plan an extra time --
            # every metric is scaled by the same pass count, so the ==/ratio
            # guards stay exact; normalize the reported numbers back to
            # single-pass values via the true written count (observed once,
            # above the exchange, by write_with_lineage).
            rows_in = int(m_in.get("rows_in") or 0)
            rows_out = int(m_out.get("rows_out") or 0)
            lines_in = int(m_out.get("lines_in") or 0)
            lines_out = int(m_out.get("lines_out") or 0)
            passes = rows_out // n if n and rows_out % n == 0 else 1
            guard_row = _assert_retention(
                "scrub", rows_in // passes, rows_out // passes,
                lines_in // passes, lines_out // passes, min_line_ratio)
            spark.createDataFrame([guard_row]).write.mode("append").parquet(
                f"{output_path}/_lineage_guards")
            if nd_index_action is not None:
                # Index content = dedup-kept turns, BEFORE the toxicity/resume
                # gates: the index answers "what has this corpus already seen",
                # so a toxic turn dropped from the OUTPUT still anchors dedup of
                # its future near-copies (which the toxicity gate would drop
                # anyway -- near-copies of toxic text score toxic).
                # index maintenance runs LAST, only after the write + guards
                # succeeded: a crash anywhere above leaves the index in its
                # pre-slice state, so a resumed run recomputes the same drops
                # against the same index (idempotent restart).  Cost: one extra
                # signature pass over the kept slice rows.
                from ..operators.minhash_index import (
                    append_grouped_to_minhash_index, append_to_minhash_index,
                    write_grouped_minhash_index, write_minhash_index)
                action, kept = nd_index_action
                conv_scope = near_dedup_scope == "conversation"
                if conv_scope:
                    kept_keyed, key_col = kept, "conv_id"
                else:
                    kept_keyed = kept.withColumn(
                        "_nk", F.struct("conv_id", "turn_idx"))
                    key_col = "_nk"
                if action == "create":
                    # gate on the KEPT set, not rows written this call: a
                    # bootstrap that crashed mid-create and RESUMED writes zero
                    # new output rows (resume_filter removed them) but must
                    # still create the index, or the whole bootstrap corpus
                    # silently never enters it and later slices dedup against
                    # nothing
                    if not kept_keyed.isEmpty():  # empty input: no index
                        create = (write_grouped_minhash_index if conv_scope
                                  else write_minhash_index)
                        create(kept_keyed, key_col, "text",
                               near_dedup_index_path,
                               threshold=float(near_dedup_threshold))
                else:
                    # idempotent by construction: the append fns anti-join each
                    # store's already-committed keys, so a completed-slice
                    # re-run appends nothing and a half-crashed append
                    # completes exactly-once
                    append = (append_grouped_to_minhash_index if conv_scope
                              else append_to_minhash_index)
                    append(kept_keyed, key_col, "text", near_dedup_index_path)
            if eb_index_action is not None:
                # same last-step commit protocol as the MinHash index: a
                # crash anywhere above leaves the embedding index in its
                # pre-slice state, and the append functions are idempotent
                from ..operators.embedding_index import (
                    append_to_embedding_index, write_embedding_index)
                eb_action, eb_kept = eb_index_action
                eb_keyed = eb_kept.withColumn(
                    "_ek", F.struct("conv_id", "turn_idx"))
                if eb_action == "create":
                    # the index needs >= 1 non-null vector to pin its dim; a
                    # bootstrap slice without any stays index-less and the
                    # next run bootstraps again
                    if not eb_keyed.filter(
                            F.col(embedding_col).isNotNull()).isEmpty():
                        write_embedding_index(
                            eb_keyed, "_ek", embedding_col,
                            embedding_index_path,
                            threshold=float(embedding_dedup_threshold),
                            n_planes=int(embedding_n_planes))
                else:
                    append_to_embedding_index(
                        eb_keyed, "_ek", embedding_col, embedding_index_path)
            # Processed replacement rows for changed re-exports: the
            # changed keys' CURRENT content run through the same content
            # gates (decontamination, toxicity, near-dedup probes, the pure
            # sampling rule) and the same scrub as the main path, written to
            # ``_changed_upsert`` with an ``_action`` column so the caller's
            # documented MERGE (Iceberg in the nominal deployment) has
            # pipeline-PROCESSED rows to apply -- without this the only
            # route to the new content would bypass the gates entirely, or
            # the content would be lost while the reindexed signature
            # actively blocks its re-ingestion.  Actions:
            #   ``upsert``  replace the matched output row, or insert (a
            #               grown conversation's new turns);
            #   ``update``  replace IF MATCHED, never insert -- emitted
            #               instead of ``upsert`` whenever a rank-based
            #               sampling gate (exact-n stratified / token-budget
            #               mix) is active, because membership in a rank
            #               gate is a property of the original run's full
            #               population and cannot be re-derived per key:
            #               inserting an unmatched key could exceed the
            #               original sample.  The pure fraction gate IS
            #               re-derived (same hash rule, same seed), so
            #               fraction-excluded replacement keys are dropped
            #               from the sidecar outright (``n_sampled_out``);
            #   ``delete``  the NEW content fails a drop gate (contaminated,
            #               toxic, or a near-duplicate of a DIFFERENT
            #               surviving committed key -- the replacement
            #               probes), or the key belongs to a conversation
            #               retroactively poisoned this run: remove the
            #               stale output row.  Retro-delete rows carry only
            #               the key columns (content fields NULL).
            # Written BEFORE the reindex commits: a crash in between makes
            # the re-run redetect the same keys and append byte-identical
            # rows (the MERGE source should dedupe by key), never lose them.
            retro_deletes = None
            # n_contam > 0 gates the whole branch: with zero poisoned
            # conversations the semi-join below is empty by construction,
            # and building it anyway would make retro_deletes a non-None
            # empty frame on EVERY converged steady-state run -- paying a
            # committed-key scan per run and appending a zero-row
            # _changed_upsert parquet (whose first write can be a
            # _SUCCESS-only directory that breaks the caller's documented
            # MERGE-source schema inference) plus a spurious all-zero
            # lineage row
            if (reindex_changed and decontam_scope == "conversation"
                    and dc_drops is not None and n_contam > 0):
                # Retroactive contamination: a conversation poisoned THIS
                # run (by a new or changed turn) may have clean turns in the
                # output from earlier slices; an uninterrupted run over the
                # same content would have dropped the whole conversation.
                # Enumerate the poisoned conversations' committed keys from
                # a turn-keyed index and emit deletes for them.  (A group-
                # granularity index alone cannot enumerate turn keys --
                # documented gap.  Keys the index holds but the output never
                # wrote -- decontam/toxicity-dropped at their own ingest --
                # produce deletes that match nothing; harmless.)
                ck_src = None
                if (nd_gate_on and near_dedup_scope == "turn"
                        and _try_read_first(
                            spark, f"{near_dedup_index_path}/meta") is not None):
                    from ..operators.minhash_index import _committed_doc_ids
                    ck_src = _committed_doc_ids(spark, near_dedup_index_path)
                elif eb_gate_on and _try_read_first(
                        spark, f"{embedding_index_path}/meta") is not None:
                    from ..operators.embedding_index import _committed_ids
                    ck_src = _committed_ids(spark, embedding_index_path)
                if ck_src is not None:
                    dcv_r = dc_drops.withColumnRenamed("conv_id", "_dc_conv")
                    retro_deletes = (
                        ck_src.select(
                            F.col("doc_id.conv_id").alias("conv_id"),
                            F.col("doc_id.turn_idx").alias("turn_idx"))
                        .join(F.broadcast(dcv_r),
                              F.col("conv_id").eqNullSafe(F.col("_dc_conv")),
                              "left_semi"))
            if (nd_changed_rows is not None or eb_changed_rows is not None
                    or retro_deletes is not None):
                from pyspark.sql.window import Window as _W

                from ..operators.minhash_index import incremental_drop_keys
                rank_gated = (sample_n_per_stratum is not None
                              or sample_token_shares is not None)
                srcs = []
                if nd_changed_rows is not None:
                    srcs.append(nd_changed_rows.drop("_nk"))
                if eb_changed_rows is not None:
                    srcs.append(eb_changed_rows.drop("_ek"))
                up = None
                if srcs:
                    up = srcs[0]
                    for s in srcs[1:]:
                        # the sets can overlap (a doubly-committed key whose
                        # text AND embedding changed); the collapse below
                        # dedupes the identical rows
                        up = up.unionByName(s, allowMissingColumns=True)
                    # duplicate keys (reachable with dedup=False) collapse
                    # to the min-text row: asc_nulls_last matches the
                    # null-IGNORING F.min(text) winner the doc index's
                    # _unique_doc_rows applies, so the upsert row carries
                    # the text the reindexed signature describes.  (The
                    # grouped reindex unions ALL duplicate rows' shingles --
                    # strictly more conservative than any single kept row;
                    # the embedding index collapses by min VECTOR.  Both
                    # divergences are reachable only with dedup=False AND
                    # conflicting duplicate content for one key.)
                    up = (up.withColumn(
                              "_rn", F.row_number().over(
                                  _W.partitionBy("conv_id", "turn_idx")
                                    .orderBy(F.col("text").asc_nulls_last())))
                          .filter(F.col("_rn") == 1).drop("_rn"))
                up_cached = None
                if up is not None:
                    # Persist + materialize NOW, at the ROOT frame every
                    # consumer below derives from (the sampling count, the
                    # gates -- the grouped probe alone instantiates it ~8x
                    # -- and the scrub input): its lineage carries the
                    # changed-detection joins over epoch-resolved index
                    # reads, and without the cache each consumer replays
                    # that whole subtree (observed: a toy-fixture
                    # conversation-scope run went from minutes to seconds).
                    # CacheManager substitutes subtrees matching the cached
                    # ANALYZED plan, so every derived frame must be built
                    # on top of THIS object, not re-derived from its
                    # ingredients.  The eager count serializes the
                    # materialization so the gate jobs race against a
                    # built cache, not each other.
                    up_cached = up
                    up_cached.persist()
                    up_cached.count()
                n_sampled_out = 0
                if up is not None and sample_fraction is not None:
                    from ..operators.sampling import sample_keep_condition
                    cond = sample_keep_condition(
                        sp_keys, float(sample_fraction), int(sample_seed))
                    n_sampled_out = up.filter(~cond).count()
                    if n_sampled_out:
                        up = up.filter(cond)
                out_up = None
                if up is not None:
                    up_keyed = up.withColumn(
                        "_ck", F.struct("conv_id", "turn_idx"))
                    del_srcs = []  # one-column ``_ck`` frames to delete
                    if dc_flagger is not None:
                        if decontam_scope == "conversation":
                            # the main gate's poisoned-conversation set
                            # already includes convs flagged by changed rows
                            # (the flag source unions them) -- reuse it, one
                            # rule, no second flagger pass
                            dcv = dc_drops.withColumnRenamed(
                                "conv_id", "_dc_conv")
                            del_srcs.append(
                                up_keyed.join(
                                    F.broadcast(dcv),
                                    up_keyed["conv_id"].eqNullSafe(
                                        F.col("_dc_conv")),
                                    "left_semi").select("_ck"))
                        else:
                            del_srcs.append(dc_flagger(up_keyed))
                    if drop_toxic_above is not None:
                        from ..operators.toxicity import toxicity_score_col
                        # evaluated PRE-scrub like the main gate (the post-
                        # scrub frame's columns belong to scrub_transform; a
                        # grouped transform has no ``text`` column)
                        del_srcs.append(
                            up_keyed.filter(
                                toxicity_score_col(F.col("text"))
                                > float(drop_toxic_above)).select("_ck"))
                    if gq_rules is not None:
                        # same rules as the main gopher-quality gate,
                        # evaluated pre-scrub like the other row gates
                        from ..operators.doc_quality import (
                            gopher_quality_keep_condition)
                        del_srcs.append(
                            up_keyed.filter(
                                ~gopher_quality_keep_condition(
                                    F.col("text"), gq_rules))
                            .select("_ck"))
                    if rep_thresholds is not None:
                        # same thresholds as the main repetition gate
                        from ..operators.repetition import (
                            repetition_keep_condition, repetition_stats,
                            threshold_gram_sizes)
                        u_tn, u_dn = threshold_gram_sizes(rep_thresholds)
                        u_stats = repetition_stats(
                            up_keyed, "text", ["_ck"],
                            top_ns=u_tn, dup_ns=u_dn)
                        del_srcs.append(
                            u_stats.filter(~repetition_keep_condition(
                                u_stats, rep_thresholds))
                            .select("_ck"))
                    if qc_model is not None:
                        # same model, same threshold, evaluated pre-scrub
                        # like the main quality gate
                        from ..operators.quality_classifier import (
                            score_quality_classifier)
                        del_srcs.append(
                            score_quality_classifier(
                                up_keyed, qc_model, ["_ck"],
                                output_col="_qscore")
                            .filter(F.col("_qscore")
                                    < float(quality_min_score))
                            .select("_ck"))
                    if lm_model is not None:
                        # same LM, same cutoff; NULL (token-less) passes
                        from ..operators.lm_perplexity import (
                            score_perplexity)
                        del_srcs.append(
                            score_perplexity(
                                up_keyed, lm_model, ["_ck"],
                                output_col="_ppl")
                            .filter(F.col("_ppl")
                                    > float(perplexity_max))
                            .select("_ck"))
                    # replacement content re-checked against the near-dedup
                    # gates: the incremental operators exclude committed
                    # keys, so without these probes a re-export rewritten
                    # into a near-copy of a DIFFERENT committed doc (or
                    # conversation) would sail in as its replacement
                    if (nd_gate_on and _try_read_first(
                            spark, f"{near_dedup_index_path}/meta")
                            is not None):
                        if near_dedup_scope == "turn":
                            from ..operators.minhash_index import (
                                probe_index_near_duplicates)
                            del_srcs.append(
                                incremental_drop_keys(
                                    probe_index_near_duplicates(
                                        up_keyed, "_ck", "text",
                                        near_dedup_index_path))
                                .withColumnRenamed("doc_id", "_ck"))
                        else:
                            # conversation scope: a dropped gid deletes ALL
                            # of the conversation's replacement rows
                            # (eqNullSafe: a NULL conv_id group must not
                            # slip the drop, same as the decontam drop).
                            # Probe ONLY conversations whose TEXT changed
                            # (gids present in nd_changed_rows, the full-
                            # member changed set): with the embedding gate
                            # on, up_keyed can also carry embedding-changed-
                            # only turn rows -- a PARTIAL member set whose
                            # partial content the grouped probe would treat
                            # as the conversation's full current text,
                            # skewing the probe jaccard and the own-history
                            # carve-out (r6 ADVICE).  An embedding-only
                            # change leaves the text signature valid, so
                            # those conversations need no text probe.
                            from ..operators.minhash_index import (
                                probe_grouped_index_near_duplicates)
                            gprobe_in = up_keyed
                            if eb_changed_rows is not None:
                                if nd_changed_rows is None:
                                    gprobe_in = None
                                else:
                                    nd_gids = (nd_changed_rows
                                               .select(F.col("conv_id")
                                                       .alias("_nd_conv"))
                                               .distinct())
                                    gprobe_in = up_keyed.join(
                                        F.broadcast(nd_gids),
                                        up_keyed["conv_id"].eqNullSafe(
                                            F.col("_nd_conv")),
                                        "left_semi")
                            if gprobe_in is not None:
                                gdrop = incremental_drop_keys(
                                    probe_grouped_index_near_duplicates(
                                        gprobe_in, "conv_id", "text",
                                        near_dedup_index_path)
                                ).withColumnRenamed("doc_id", "_gdrop")
                                del_srcs.append(
                                    up_keyed.join(
                                        F.broadcast(gdrop),
                                        up_keyed["conv_id"].eqNullSafe(
                                            F.col("_gdrop")),
                                        "left_semi").select("_ck"))
                    if eb_gate_on and _try_read_first(
                            spark, f"{embedding_index_path}/meta") is not None:
                        from ..operators.embedding_index import (
                            probe_embedding_index_near_duplicates)
                        del_srcs.append(
                            incremental_drop_keys(
                                probe_embedding_index_near_duplicates(
                                    up_keyed, "_ck", embedding_col,
                                    embedding_index_path))
                            .withColumnRenamed("doc_id", "_ck"))
                    out_up = scrub_transform(up, **scrub_kwargs).withColumn(
                        "_ck", F.struct("conv_id", "turn_idx"))
                    if del_srcs:
                        dset = del_srcs[0]
                        for s in del_srcs[1:]:
                            dset = dset.union(s)
                        dset = (dset.distinct()
                                .withColumn("_del", F.lit(True)))
                        out_up = out_up.join(F.broadcast(dset), "_ck", "left")
                    else:
                        out_up = out_up.withColumn(
                            "_del", F.lit(None).cast("boolean"))
                    out_up = (out_up.withColumn(
                                  "_action",
                                  F.when(F.coalesce(F.col("_del"), F.lit(False)),
                                         F.lit("delete"))
                                   .otherwise(F.lit("update" if rank_gated
                                                    else "upsert")))
                              .drop("_ck", "_del"))
                if retro_deletes is not None:
                    retro_rows = retro_deletes.withColumn(
                        "_action", F.lit("delete"))
                    if out_up is not None:
                        # keys already in the changed set keep their computed
                        # action; retro deletes cover only the REST of the
                        # poisoned conversations' committed keys
                        have = out_up.select(
                            F.struct("conv_id", "turn_idx").alias("_k"))
                        retro_rows = (retro_rows.withColumn(
                                          "_k",
                                          F.struct("conv_id", "turn_idx"))
                                      .join(have, "_k", "left_anti")
                                      .drop("_k"))
                        out_up = out_up.unionByName(
                            retro_rows, allowMissingColumns=True)
                    else:
                        out_up = retro_rows
                out_up.persist()
                try:
                    uc = out_up.agg(*[
                        F.coalesce(F.sum((F.col("_action") == a).cast("long")),
                                   F.lit(0)).alias(f"n_{a}")
                        for a in ("upsert", "update", "delete")]).first()
                    out_up.write.mode("append").parquet(
                        f"{output_path}/_changed_upsert")
                    # additive schema (n_update / n_sampled_out joined the
                    # row): read the sidecar with mergeSchema=true, like
                    # every lineage sidecar here
                    spark.createDataFrame(
                        [{"stage": "changed_upsert",
                          "n_upsert": int(uc["n_upsert"]),
                          "n_update": int(uc["n_update"]),
                          "n_delete": int(uc["n_delete"]),
                          "n_sampled_out": int(n_sampled_out)}],
                        schema="stage string, n_upsert long, n_update long, "
                               "n_delete long, n_sampled_out long",
                    ).write.mode("append").parquet(
                        f"{output_path}/_lineage_upsert")
                finally:
                    out_up.unpersist()
                    if up_cached is not None:
                        up_cached.unpersist()
            # reindex_changed runs LAST, after the appends (disjoint key
            # sets; changed_rows is persisted, so the reindex sees exactly
            # the rows the gate counted).  Delete-action replacements are
            # reindexed TOO: skipping them would leave the stale signature,
            # and every later run would re-detect the key as changed and
            # commit a fresh epoch forever (non-convergent).  The resulting
            # ghost entries (index content for rows the output deleted) are
            # exactly what the replacement probes' predecessor-shadow
            # carve-out accounts for.  Each reindex commits one fresh
            # epoch (meta_eN marker last -- a crash BEFORE the marker leaves
            # the old epoch live and the next run redetects the same changed
            # keys); a completed re-run finds zero changed keys and adds no
            # epoch.  A crash in the window between the marker commit and
            # the _lineage_reindex append loses only the ADVISORY lineage
            # row: the index itself is correct and the append-only meta_eN
            # markers at the index path remain the authoritative record of
            # every committed reindex.
            def _reindex_sidecar(stage, n_keys, epoch):
                spark.createDataFrame(
                    [{"stage": stage, "n_keys": n_keys, "epoch": int(epoch)}],
                    schema="stage string, n_keys long, epoch long",
                ).write.mode("append").parquet(
                    f"{output_path}/_lineage_reindex")
            if nd_changed_rows is not None:
                from ..operators.minhash_index import (
                    reindex_docs, reindex_groups)
                # Every turn contributes >=1 shingle row to the exploded
                # grouped store -- sub-shingle_k texts are padded
                # (``_batch_shingles``: "always >=1 per row") -- so a
                # changed conversation ALWAYS gains epoch-N rows here and
                # the per-gid max-epoch window resolves to them; an
                # all-short re-export cannot strand a key on its stale
                # epoch-0 state.
                if near_dedup_scope == "conversation":
                    ri_meta = reindex_groups(
                        nd_changed_rows, "conv_id", "text",
                        near_dedup_index_path)
                    ri_keys = (nd_changed_rows.select("conv_id")
                               .distinct().count())
                else:
                    ri_meta = reindex_docs(
                        nd_changed_rows, "_nk", "text", near_dedup_index_path)
                    ri_keys = nd_changed_rows.select("_nk").distinct().count()
                _reindex_sidecar("near_dedup_reindex", ri_keys,
                                 ri_meta["epoch"])
            if eb_changed_rows is not None:
                from ..operators.embedding_index import reindex_embeddings
                ri_meta = reindex_embeddings(
                    eb_changed_rows, "_ek", embedding_col,
                    embedding_index_path)
                ri_keys = eb_changed_rows.select("_ek").distinct().count()
                _reindex_sidecar("embedding_reindex", ri_keys,
                                 ri_meta["epoch"])
        finally:
            # the cached drop sets must not outlive the run even when the
            # write or a downstream guard raises (long-lived sessions)
            if nd_drops is not None:
                nd_drops.unpersist()
            if eb_drops is not None:
                eb_drops.unpersist()
            if dc_drops is not None:
                dc_drops.unpersist()
            if rep_drops is not None:
                rep_drops.unpersist()
            if nd_changed_rows is not None:
                nd_changed_rows.unpersist()
            if eb_changed_rows is not None:
                eb_changed_rows.unpersist()
        wall = time.time() - t0
        stats = {"rows": n, "wall_sec": round(wall, 3),
                 "rows_per_sec": round(n / wall, 1) if wall > 0 else None,
                 **{k: v for k, v in guard_row.items() if k != "stage"}}
        if nd_row is not None:
            stats["n_near_dup_dropped"] = nd_row["n_dropped"]
            stats["n_capped_buckets"] = nd_row["n_capped_buckets"]
            stats["n_preindexed_rows_dropped"] = \
                nd_row["n_preindexed_rows_dropped"]
            stats["n_preindexed_changed"] = nd_row["n_preindexed_changed"]
        if embedding_dedup_threshold is not None:
            stats["n_embedding_dup_dropped"] = eb_row["n_dropped"]
            stats["n_emb_preindexed_rows_dropped"] = \
                eb_row["n_preindexed_rows_dropped"]
            stats["n_emb_preindexed_changed"] = eb_row["n_preindexed_changed"]
        if decontaminate_against is not None:
            stats["n_contaminated_dropped"] = n_contam
        if sample_fraction is not None or sample_n_per_stratum is not None:
            stats["n_sample_dropped"] = sp_row["n_dropped"]
        if sample_token_shares is not None:
            stats["n_token_mix_dropped"] = tm_row["n_dropped"]
            stats["token_mix_budget"] = tm_row["budget_tokens"]
        return stats
    finally:
        for _f in (nd_drops, eb_drops, dc_drops, rep_drops, q_drops,
                   p_drops, nd_changed_rows, eb_changed_rows,
                   up_cached):
            if _f is not None:
                _f.unpersist()


# note: run_pipeline's "rows" counts rows written by THIS invocation; under
# --resume that is only the previously-unprocessed keys.


def main() -> None:
    import argparse
    import json

    from ..session import get_spark

    ap = argparse.ArgumentParser(description="sumi-agent-spark scrub pipeline")
    ap.add_argument("--input", required=False, help="input parquet path")
    ap.add_argument("--output", required=True, help="output parquet dir")
    ap.add_argument("--generate", type=int, default=0, metavar="N_CONVS",
                    help="generate a fixture table with N conversations instead of --input")
    add_pipeline_args(ap)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(cores=args.cores)
    if args.generate:
        import tempfile

        from ..sources.transcripts import write_parquet
        tmp = tempfile.mkdtemp(prefix="sumi_fixture_")
        input_path = f"{tmp}/transcripts.parquet"
        write_parquet(input_path, n_convs=args.generate)
    else:
        if not args.input:
            ap.error("--input or --generate required")
        input_path = args.input
    stats = run_pipeline(spark, input_path, args.output,
                         **pipeline_kwargs(args))
    print(json.dumps(stats))


def add_pipeline_args(ap) -> None:
    """The shared pipeline-stage CLI surface, defined ONCE for every
    entry point (the in-package runner above and the spark-submit wrapper
    tools/run_pipeline.py) so the two argparse blocks cannot drift.
    Pair with :func:`pipeline_kwargs`."""
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dedup", action="store_true",
                    help="drop exact-duplicate turns before scrubbing")
    ap.add_argument("--near-dedup-threshold", type=float, default=None,
                    metavar="J", help="drop turns with a MinHash near-"
                    "duplicate (shingle Jaccard >= J) earlier in "
                    "(conv_id, turn_idx) order; capping metrics land in "
                    "the _lineage_neardup sidecar")
    ap.add_argument("--near-dedup-index", default=None, metavar="PATH",
                    help="incremental near-dedup: LSH-join this ingest "
                    "slice against the persisted MinHash index at PATH "
                    "(bootstrap-created on first run, appended after every "
                    "successful write) instead of recomputing the corpus")
    ap.add_argument("--near-dedup-scope", default="turn",
                    choices=("turn", "conversation"),
                    help="near-dedup granularity: drop individual turns "
                    "(default) or whole near-duplicate conversations "
                    "(union-of-turn-shingle Jaccard, keep-first by conv_id)")
    ap.add_argument("--embedding-dedup-threshold", type=float, default=None,
                    metavar="C", help="drop turns whose embedding cosine "
                    ">= C matches an earlier turn (or the corpus, with "
                    "--embedding-index); input must carry the embedding "
                    "column")
    ap.add_argument("--embedding-index", default=None, metavar="PATH",
                    help="incremental embedding dedup against the "
                    "persisted hyperplane index at PATH (bootstrap-created "
                    "on first run, appended after every successful write)")
    ap.add_argument("--embedding-col", default="embedding",
                    help="input embedding column (default: embedding)")
    ap.add_argument("--embedding-n-planes", type=int, default=16,
                    help="hyperplanes for the LSH bucketing (default: 16; "
                    "only used when creating a new index)")
    ap.add_argument("--reindex-changed", action="store_true",
                    help="after the write, rebuild committed index keys "
                    "whose slice content changed (re-crawled doc, grown "
                    "conversation, re-embedded turn) into a fresh index "
                    "epoch instead of only counting them; rows appended "
                    "to the _lineage_reindex sidecar (requires "
                    "--near-dedup-index and/or --embedding-index)")
    ap.add_argument("--sample-fraction", type=float, default=None,
                    metavar="F", help="keep a deterministic hash sample "
                    "of ~F of the dedup survivors (md5 of key cols + "
                    "seed; rerun-stable, nested across fractions at the "
                    "same seed); counts land in the _lineage_sample "
                    "sidecar")
    ap.add_argument("--sample-seed", type=int, default=0,
                    help="sampling seed (default: 0; disjoint seeds give "
                    "independent samples)")
    ap.add_argument("--sample-key-cols", default=None, metavar="C1,C2",
                    help="comma-separated key columns the sampling hash "
                    "is keyed on (default: conv_id,turn_idx)")
    ap.add_argument("--sample-n-per-stratum", type=int, default=None,
                    metavar="N", help="keep exactly min(N, stratum size) "
                    "rows per stratum, by the same deterministic hash "
                    "rank (requires --sample-strata-cols; duplicate keys "
                    "fail loudly -- run with --dedup)")
    ap.add_argument("--sample-strata-cols", default=None, metavar="C1,C2",
                    help="comma-separated stratum columns for "
                    "--sample-n-per-stratum (e.g. role)")
    ap.add_argument("--drop-toxic-above", type=float, default=None,
                    metavar="T", help="drop turns with toxicity score > T")
    ap.add_argument("--gopher-quality-rules", default=None,
                    metavar="GOPHER|JSON",
                    help="drop turns breaching any Gopher quality rule: "
                    "the literal 'gopher' for the full Table A1 catalog "
                    "(English-centric), or a JSON metric->[min,max] dict "
                    "with nulls for unbounded sides (counts land in the "
                    "_lineage_docquality sidecar)")
    ap.add_argument("--repetition-thresholds", default=None,
                    metavar="GOPHER|JSON",
                    help="drop turns breaching any Gopher repetition "
                    "threshold: the literal 'gopher' for the standard "
                    "catalog, or a JSON metric->max dict (counts land "
                    "in the _lineage_repetition sidecar)")
    ap.add_argument("--quality-model-path", default=None, metavar="PATH",
                    help="persisted hashed-NB quality model "
                    "(operators/quality_classifier.py); requires "
                    "--quality-min-score")
    ap.add_argument("--quality-min-score", type=float, default=None,
                    metavar="S", help="drop turns whose classifier "
                    "quality score is below S (counts land in the "
                    "_lineage_quality sidecar)")
    ap.add_argument("--perplexity-model-path", default=None,
                    metavar="PATH",
                    help="persisted unigram LM "
                    "(operators/lm_perplexity.py); requires "
                    "--perplexity-max")
    ap.add_argument("--perplexity-max", type=float, default=None,
                    metavar="P", help="drop turns whose mean negative "
                    "token log-prob (nats) exceeds P (counts land in "
                    "the _lineage_perplexity sidecar)")
    ap.add_argument("--decontaminate-against", default=None, metavar="PATH",
                    help="drop turns sharing exact k-gram shingles with "
                    "the benchmark parquet at PATH (eval-contamination "
                    "gate; counts land in the _lineage_decontam sidecar)")
    ap.add_argument("--decontam-text-col", default="text",
                    help="benchmark text column (default: text)")
    ap.add_argument("--decontam-k", type=int, default=13,
                    help="shingle length in chars (default: 13)")
    ap.add_argument("--decontam-min-hits", type=int, default=1,
                    help="flag a turn at >= this many distinct benchmark "
                    "k-gram hits (default: 1)")
    ap.add_argument("--decontam-ngrams", default="char",
                    choices=("char", "word"),
                    help="k-gram unit: chars (default; right for ja) or "
                    "whitespace tokens (GPT-3-style word n-grams)")
    ap.add_argument("--decontam-scope", default="turn",
                    choices=("turn", "conversation"),
                    help="drop granularity: the flagged turn (default) or "
                    "its whole conversation (document-level rule)")
    ap.add_argument("--decontam-min-containment", type=float, default=None,
                    metavar="C", help="PaLM-style rule: flag when >= C of "
                    "any single benchmark row's distinct k-grams appear "
                    "in the turn (default: off = global-set min-hits rule)")
    ap.add_argument("--sample-token-shares", default=None, metavar="JSON",
                    help="token-budget mixture gate: JSON dict of "
                    "{stratum value: target token share} (requires "
                    "--sample-token-stratum-col)")
    ap.add_argument("--sample-token-stratum-col", default=None,
                    help="column whose values --sample-token-shares keys "
                    "on (e.g. role)")
    ap.add_argument("--sample-token-budget", type=int, default=None,
                    metavar="N", help="total token budget for the mixture "
                    "(default: largest feasible)")
    ap.add_argument("--sample-token-col", default=None,
                    help="precomputed token-count column (default: "
                    "length(text) as the char proxy)")
    ap.add_argument("--sample-token-allow-short", action="store_true",
                    help="accept a skewed mix when --sample-token-budget "
                    "exceeds what a stratum can supply (default: refuse)")
    ap.add_argument("--decontam-mode", default="exact",
                    choices=("exact", "fuzzy"),
                    help="exact k-gram matching (default) or fuzzy: "
                    "windowed MinHash-LSH + short-shingle containment, "
                    "catching lightly paraphrased eval rows (requires "
                    "--decontam-min-containment; --decontam-k is the "
                    "shingle size then -- keep it small, e.g. 7)")


def pipeline_kwargs(args) -> dict:
    """The :func:`run_pipeline` keyword arguments for a parsed
    :func:`add_pipeline_args` namespace."""
    return dict(
        resume=args.resume,
        dedup=args.dedup,
        near_dedup_threshold=args.near_dedup_threshold,
        near_dedup_index_path=args.near_dedup_index,
        near_dedup_scope=args.near_dedup_scope,
        embedding_dedup_threshold=args.embedding_dedup_threshold,
        embedding_index_path=args.embedding_index,
        embedding_col=args.embedding_col,
        embedding_n_planes=args.embedding_n_planes,
        reindex_changed=args.reindex_changed,
        sample_fraction=args.sample_fraction,
        sample_seed=args.sample_seed,
        sample_key_cols=(args.sample_key_cols.split(",")
                         if args.sample_key_cols else None),
        sample_n_per_stratum=args.sample_n_per_stratum,
        sample_strata_cols=(args.sample_strata_cols.split(",")
                            if args.sample_strata_cols else None),
        drop_toxic_above=args.drop_toxic_above,
        repetition_thresholds=(
            args.repetition_thresholds
            if args.repetition_thresholds in (None, "gopher")
            else __import__("json").loads(args.repetition_thresholds)),
        gopher_quality_rules=(
            args.gopher_quality_rules
            if args.gopher_quality_rules in (None, "gopher")
            else __import__("json").loads(args.gopher_quality_rules)),
        quality_model_path=args.quality_model_path,
        quality_min_score=args.quality_min_score,
        perplexity_model_path=args.perplexity_model_path,
        perplexity_max=args.perplexity_max,
        decontaminate_against=args.decontaminate_against,
        decontam_text_col=args.decontam_text_col,
        decontam_k=args.decontam_k,
        decontam_min_hits=args.decontam_min_hits,
        decontam_ngrams=args.decontam_ngrams,
        decontam_scope=args.decontam_scope,
        decontam_min_containment=args.decontam_min_containment,
        decontam_mode=args.decontam_mode,
        sample_token_shares=(__import__("json").loads(
            args.sample_token_shares) if args.sample_token_shares
            else None),
        sample_token_stratum_col=args.sample_token_stratum_col,
        sample_token_budget=args.sample_token_budget,
        sample_token_col=args.sample_token_col,
        sample_token_allow_short=args.sample_token_allow_short,
    )


if __name__ == "__main__":
    main()
