"""Classifier evaluation: distributed AUC and precision/recall.

The model-based gates (``operators/quality_classifier.py``,
``operators/lm_perplexity.py``) need an evaluation step before a
threshold goes into ``run_pipeline``: ROC-AUC to pick the model, and
precision/recall at candidate thresholds to pick the cutoff.  Both are
implemented as pure aggregations so they run on a labeled slice of any
size and a DuckDB auditor reproduces them hash-exact.

**AUC** uses the Mann-Whitney identity
``AUC = P(s_pos > s_neg) + 0.5 * P(s_pos = s_neg)`` computed from
per-distinct-score counts, kept in EXACT integers until a single final
division::

    2 * U = sum over distinct scores s of
            n_pos(s) * (2 * n_neg(<s) + n_neg(s))
    AUC   = U / (n_pos * n_neg)            -- one double division

Scale shape: one ``groupBy(score)`` (map-side combinable -- the only
full-data shuffle), then a running sum over DISTINCT scores.  That
cumulative window is intentionally un-partitioned: it runs over one row
per distinct score, not per input row -- a bounded frame for any real
score distribution (a hashed-NB/LM score at round(6) has at most a few
million distinct values regardless of corpus size; quantize scores
coarser if a pathological distribution ever makes it large).  Rows with
a NULL label or NULL score are excluded and counted (``n_null``) -- the
LM legitimately emits NULL for token-less rows.

**Precision/recall** at each threshold is a single pass of conditional
sums (predicted positive = ``score >= t``); all four confusion cells
are exact integers, the two ratios are one division each.

``binary_auc`` is one fully lazy plan (invalid rows ride the same
aggregation as a zero-contribution group, so n_null costs no extra
scan).  ``precision_recall_at`` drives one counts-collect action plus
the returned frame -- and composing BOTH operators over one expensive
upstream (a freshly-fit classifier's scores) still executes it per
action: persist or ``localCheckpoint`` the labeled frame first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """One-row DataFrame: ``auc`` (double, NULL when either class is
    empty), ``n_pos``, ``n_neg``, ``n_null`` (rows excluded for a NULL
    label or score).  ``label_col`` is boolean (true = positive);
    higher scores should mean "more positive"."""
    valid = (F.col(label_col).isNotNull()
             & F.col(score_col).isNotNull())
    base = df.select(F.col(label_col).alias("_y"),
                     F.col(score_col).alias("_s"),
                     valid.alias("_v"))
    # ONE lazy plan, one scan: invalid rows group under their (possibly
    # NULL) score with np = nn = 0 -- a zero contribution wherever the
    # engines order the NULL group -- and are counted into n_null by
    # the same aggregation instead of an eager driver-side count job.
    per_score = (base.groupBy("_s")
                 .agg(F.sum(F.when(F.col("_v") & F.col("_y"), 1)
                            .otherwise(0)).alias("np"),
                      F.sum(F.when(F.col("_v") & ~F.col("_y"), 1)
                            .otherwise(0)).alias("nn"),
                      F.sum(F.when(~F.col("_v"), 1).otherwise(0))
                      .alias("nnull")))
    w = (Window.orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    # decimal(38,0) accumulator: the 2U sum approaches 2*n_pos*n_neg,
    # which outgrows int64 near 2^31 rows per class -- LongType would
    # wrap SILENTLY (session is non-ANSI) while the DuckDB twin sums
    # in HUGEINT; decimal keeps both engines exact
    contrib = (per_score
               .withColumn("nn_below",
                           F.coalesce(F.sum("nn").over(w), F.lit(0)))
               .select((F.col("np").cast("decimal(38,0)")
                        * (2 * F.col("nn_below") + F.col("nn")))
                       .alias("u2"),
                       "np", "nn", "nnull"))
    agg = contrib.agg(F.sum("u2").alias("u2"),
                      F.sum("np").alias("n_pos"),
                      F.sum("nn").alias("n_neg"),
                      F.sum("nnull").alias("n_null"))
    return agg.select(
        F.round(F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                       F.col("u2").cast("double")
                       / (2.0 * F.col("n_pos") * F.col("n_neg"))), 6)
        .alias("auc"),
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long")
        .alias("n_null"))


def precision_recall_at(
    df: DataFrame,
    thresholds: list,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """One row per threshold ``t`` (predicted positive =
    ``score >= t``): the four exact confusion counts plus
    ``precision``/``recall`` rounded to 6 places (NULL when the
    denominator is 0).  NULL-label/score rows are excluded.  Single
    aggregation pass for all thresholds."""
    ts = [float(t) for t in thresholds]
    if not ts:
        raise ValueError("thresholds must be non-empty")
    if len(set(ts)) != len(ts):
        raise ValueError(f"duplicate thresholds: {sorted(ts)}")
    base = df.filter(F.col(label_col).isNotNull()
                     & F.col(score_col).isNotNull())
    y, s = F.col(label_col), F.col(score_col)

    def cell(pred, truth):
        return F.sum(F.when(pred & truth, 1).otherwise(0))

    aggs = []
    for i, t in enumerate(ts):
        pos = s >= F.lit(t)
        aggs += [cell(pos, y).alias(f"tp_{i}"),
                 cell(pos, ~y).alias(f"fp_{i}"),
                 cell(~pos, y).alias(f"fn_{i}"),
                 cell(~pos, ~y).alias(f"tn_{i}")]
    # one bounded driver row (4 counts per threshold), then the ratio
    # divisions + rounding happen SPARK-side: Python's round() is
    # banker's while Spark/DuckDB round half-up -- the twin contract
    # requires the engines', not Python's
    wide = base.agg(*aggs).collect()[0]
    rows = [(t,
             int(wide[f"tp_{i}"] or 0), int(wide[f"fp_{i}"] or 0),
             int(wide[f"fn_{i}"] or 0), int(wide[f"tn_{i}"] or 0))
            for i, t in enumerate(ts)]
    counts = df.sparkSession.createDataFrame(
        rows, "threshold double, tp long, fp long, fn long, tn long")
    ratio = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den.cast("double")), 6)
    return counts.select(
        "*",
        ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"))
