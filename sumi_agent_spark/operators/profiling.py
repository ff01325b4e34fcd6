"""Corpus profiling: per-group distribution statistics for mix design.

Before building a training mix (``operators/sampling.py``) you profile
the corpus: how long are documents per source, how are token counts
distributed, where do the length gates bite.  This operator computes
per-group count / null count / min / max / mean / exact quantiles in
one aggregation.

Exactness contract: Spark's ``percentile`` and DuckDB's
``quantile_cont`` implement the same linear interpolation and agree
BIT-exactly on ``double`` inputs (verified; the earlier-observed
mismatch was DECIMAL typing on the auditor side) -- so the profile is
hash-exact twin-able like every other contract query.  The mean is an
explicit ``sum::double / count`` (one division, round 6), not ``avg``,
so the twin replays the same IEEE steps.

Scale contract (the honest part): EXACT quantiles buffer each group's
values in the aggregation state -- O(group rows) executor memory, fine
for profiling a slice or a sample, wrong for 100 TB.  The intended
full-corpus recipe composes with the sampling operator::

    profile = corpus_profile(deterministic_sample(df, 0.001), ...)

which keeps determinism (md5 membership is partitioning- and
rerun-stable) AND bounded memory.  ``exact=False`` switches to
``percentile_approx`` (Greenwald-Khanna summaries, fixed memory, safe
on the full corpus) -- its results are accuracy-bounded but not
bit-reproducible across engines, so contract twins pin the exact mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANTILES = (0.5, 0.9, 0.99)


def _qname(q: float) -> str:
    """Column name for quantile ``q``: the digits after the decimal
    point, trailing zeros stripped -- 0.5 -> ``q5``, 0.99 -> ``q99``,
    0.00005 -> ``q00005``.  Fixed-point formatting (12 places), never
    scientific notation; quantiles indistinguishable at 12 decimals
    are rejected rather than silently collapsed."""
    s = f"{q:.12f}".rstrip("0")
    if not s.startswith("0.") or s == "0.":
        raise ValueError(
            f"quantile {q!r} cannot be named (needs 12-decimal "
            "fixed-point form strictly between 0 and 1)")
    return "q" + s[2:]


def corpus_profile(
    df: DataFrame,
    value: Column | str,
    group_cols: list | None = None,
    quantiles: tuple = DEFAULT_QUANTILES,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group profile of ``value`` (a column or column name; cast
    to double): ``n`` (non-null), ``n_null``, ``vmin``, ``vmax``,
    ``mean`` (round 6) and one ``q{pct}`` column per requested
    quantile (round 6).  ``group_cols=None`` profiles the whole input
    as one group (a ``_all`` literal key).  See the module docstring
    for the exact-vs-approx memory trade."""
    qs = [float(q) for q in quantiles]
    if not qs or any(not (0.0 < q < 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1), got {quantiles}")
    if len(set(_qname(q) for q in qs)) != len(qs):
        raise ValueError(f"duplicate quantiles: {quantiles}")
    v = F.col(value) if isinstance(value, str) else value
    base = df.withColumn("_v", v.cast("double"))
    if group_cols:
        grouped = base.groupBy(*group_cols)
        keys = list(group_cols)
    else:
        # global aggregation (empty groupBy), NOT groupBy(lit): the
        # former returns one n=0 row on empty input, the latter zero
        # rows -- and the docstring promises one group
        grouped = base.groupBy()
        keys = [F.lit("_all").alias("group")]
    qarr = ", ".join(repr(q) for q in qs)
    if exact:
        pct = F.expr(f"percentile(_v, array({qarr}))")
    else:
        pct = F.expr(f"percentile_approx(_v, array({qarr}), "
                     f"{int(accuracy)})")
    agg = grouped.agg(
        F.count("_v").alias("n"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0))
        .cast("long").alias("n_null"),
        F.min("_v").alias("vmin"),
        F.max("_v").alias("vmax"),
        F.sum("_v").alias("_sum"),
        pct.alias("_q"))
    mean = F.round(F.when(F.col("n") > 0,
                          F.col("_sum") / F.col("n").cast("double")), 6)
    qcols = [F.round(F.col("_q")[i], 6).alias(_qname(q))
             for i, q in enumerate(qs)]
    return agg.select(*keys, "n", "n_null", "vmin", "vmax",
                      mean.alias("mean"), *qcols)
