"""Benchmark decontamination: k-gram overlap against an evaluation set.

Every production LLM training pipeline must drop (or at least flag)
documents that overlap an evaluation benchmark, or downstream eval
numbers measure memorization instead of generalization.  The standard
recipe (GPT-3 appendix C, PaLM, Llama: n-gram collision against the
eval sets) is a containment check: a training doc is contaminated when
at least ``min_hits`` of its k-gram shingles appear anywhere in the
benchmark corpus.  (No reference analog -- BoxPistols/sumi-agent is a
single-document scrubber; this operator exists for the training-data
mission the north rule states.)

Spark shape, sized for "100 TB corpus vs a few-MB benchmark":

* the benchmark side collapses to a one-column DISTINCT shingle-hash
  set -- that set is small (eval suites are MBs), so it BROADCASTS and
  the corpus-side probe is a map-side hash join: the O(corpus) exploded
  shingle stream never shuffles;
* the corpus side is one Arrow-batched shingle pass
  (``dedup.make_shingle_udf`` -- the exact machinery the near-dedup
  operators use, same rolling codepoint hash, per-row unique) followed
  by ``explode`` -> broadcast-probe -> ``groupBy(doc)`` count, which
  partial-aggregates map-side to ~1 narrow row per doc before the only
  shuffle;
* ``broadcast=False`` keeps the same plan with a shuffled join for the
  rare huge-benchmark case (e.g. decontaminating against another
  corpus), where the broadcast would not fit.

Hits are counted over DISTINCT doc shingles (the shingle UDF emits each
row's unique set), so a doc repeating one benchmark k-gram 1000x counts
1 -- containment, not frequency.  NULL text shingles to the padded
sentinel like everywhere else in the dedup family and can only match a
NULL/short benchmark row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import make_shingle_udf


def benchmark_shingle_set(benchmark_df: DataFrame, text_col: str,
                          k: int = 13) -> DataFrame:
    """One-column (``s``) DISTINCT shingle-hash set of the benchmark.

    Compute once and reuse (or persist to parquet) when decontaminating
    many corpora against the same eval suite."""
    sh = make_shingle_udf(k)
    return (benchmark_df
            .select(F.explode(sh(F.col(text_col))).alias("s"))
            .distinct())


def flag_benchmark_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_text_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Per-doc benchmark-overlap counts + the contamination verdict.

    Returns one row per input doc: ``(<id_col>, n_shingles,
    n_bench_hits, contaminated)`` where ``n_shingles`` is the doc's
    distinct k-gram count, ``n_bench_hits`` how many of those k-grams
    appear anywhere in ``benchmark_df``'s ``bench_text_col`` (default:
    same name as ``text_col``), and ``contaminated`` is
    ``n_bench_hits >= min_hits``.

    ``k=13`` (chars) is deliberately conservative-by-default: long
    enough that English word-8-gram-style collisions are rare, short
    enough that a quoted benchmark sentence always trips it.  A
    paraphrase shares no exact k-gram and is NOT flagged -- exactness is
    the contract (use the MinHash operators for fuzzy overlap).

    ``broadcast=True`` (default) broadcasts the benchmark shingle set;
    pass False when the benchmark side is itself corpus-sized."""
    bench = (benchmark_shingle_set(benchmark_df,
                                   bench_text_col or text_col, k)
             .withColumn("_hit", F.lit(1)))
    if broadcast:
        bench = F.broadcast(bench)
    sh = make_shingle_udf(k)
    exploded = df.select(F.col(id_col).alias("_doc_id"),
                         F.explode(sh(F.col(text_col))).alias("s"))
    # left join: every shingle row survives, so one groupBy yields both
    # the denominator (row count = distinct shingles) and the hit count
    marked = exploded.join(bench, "s", "left")
    return (marked.groupBy("_doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                  .alias("n_bench_hits"))
            .withColumn("contaminated",
                        F.col("n_bench_hits") >= F.lit(int(min_hits)))
            .withColumnRenamed("_doc_id", id_col))


def contaminated_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_text_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Just the flagged ids, as a one-column (``id_col``) DataFrame --
    the anti-join input for a drop gate (see ``plans.pipeline``'s
    ``decontaminate_against``).  Small by construction (contamination is
    the exception), so callers can cheaply persist + count it for
    lineage before anti-joining."""
    flags = flag_benchmark_overlap(df, id_col, text_col, benchmark_df,
                                   bench_text_col, k, min_hits, broadcast)
    return flags.filter("contaminated").select(id_col)
