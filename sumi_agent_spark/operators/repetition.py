"""Repetition signals for quality filtering (the Gopher/MassiveText rules).

Reference anchor: the reference's quality heuristics are length/density
ratios over parsed files (``src/app/RedactPro.tsx:1124-1539`` sparse-page
and text-density checks; re-expressed in ``functions/quality.py``), plus a
distinct-trigram repetition screen (``functions/quality.py:395``).  This
module adds the *web-scale corpus* repetition battery those heuristics do
not cover -- the filter set from Gopher (Rae et al. 2021, "Scaling
Language Models", Table A1) and MassiveText: duplicate line / paragraph
fractions and top/duplicate word-n-gram character fractions, used by
essentially every LLM data pipeline to kill boilerplate, templated spam
and stuck-generation loops.

All metrics are computed JVM-side (split / explode / groupBy counts --
map-side combinable, no Python), per document:

* ``dup_line_frac`` / ``dup_para_frac`` -- fraction of lines (paragraphs)
  whose exact text occurs more than once in the document, occurrence-
  weighted: a line appearing 3x contributes 3 to the numerator.
* ``dup_line_char_frac`` / ``dup_para_char_frac`` -- same, weighted by
  unit character length over the total characters across units.
* ``top{n}_char_frac`` (n = 2..4) -- characters covered by occurrences
  of the single most frequent word n-gram, over ``length(text)``; 0.0
  when the most frequent gram occurs only once (a single occurrence is
  not repetition -- without this guard every short document's one
  4-gram covers a large fraction and the Gopher thresholds would drop
  ordinary prose; the standard reimplementations skip that case too).
  Ties on count break to the lexicographically smallest gram (binary
  collation in both engines) so the metric is deterministic.
* ``dup{n}_char_frac`` (n = 5..10) -- characters covered by all
  occurrences of word n-grams that occur more than once, over
  ``length(text)``, capped at 1.0.  NOTE: occurrences of overlapping
  duplicated grams are counted independently (then capped), not merged
  into character spans as Gopher's exact definition does -- span-merge
  needs per-position state; this proxy is monotone in the same signal,
  cross-engine exact, and stays a pure aggregation.

Tokens are split on the explicit ASCII whitespace class
``[ \\t\\n\\r\\f\\x0B]+`` -- NOT ``str.split`` / ``\\s`` semantics, which
differ between JVM, Python and DuckDB on U+3000/Unicode spaces (the same
trap documented in ``operators/decontaminate.py``).  A gram's character
length counts its tokens joined by single spaces, as written in Gopher.

Scale shape: one explode per requested n plus the line/paragraph
explodes, each followed by a ``groupBy(doc, unit)`` count -- partial
aggregation everywhere, shuffle keys always include the doc id so a hot
document cannot hot-spot a reducer beyond its own rows.  No UDFs, no
windows over the corpus, no driver collects.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit ASCII whitespace: identical semantics in Java regex, DuckDB
# RE2 and Python re (\x0B spelled out -- Java reads \v as a class)
WS_CLASS = r"[ \t\n\r\f\x0B]+"
LINE_SPLIT = r"\n"
PARA_SPLIT = r"\n{2,}"

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

#: Gopher Table A1 thresholds -- a doc breaching ANY is dropped.
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup6_char_frac": 0.14,
    "dup7_char_frac": 0.13,
    "dup8_char_frac": 0.12,
    "dup9_char_frac": 0.11,
    "dup10_char_frac": 0.10,
}


def _tokens(text: Column) -> Column:
    """Whitespace tokens of ``text``, empties removed, NULL-safe."""
    return F.filter(F.split(F.coalesce(text, F.lit("")), WS_CLASS),
                    lambda t: t != "")


def _grams_expr(n: int) -> str:
    """SQL expression string: word ``n``-grams of the ``_toks`` column
    (space-joined), empty array when fewer than ``n`` tokens.  The
    size guard matters: Spark's ``sequence(0, -1)`` DESCENDS instead of
    returning an empty array."""
    parts = ", ".join(f"_toks[i + {j}]" for j in range(n))
    return (f"CASE WHEN size(_toks) >= {n} THEN "
            f"transform(sequence(0, size(_toks) - {n}), "
            f"i -> concat_ws(' ', {parts})) "
            f"ELSE array() END")


def _unit_dup_fracs(units: DataFrame, id_cols: list[str],
                    prefix: str) -> DataFrame:
    """Per-doc duplicate-unit fractions from exploded ``(ids..., unit)``
    rows: ``{prefix}_frac`` (occurrence-weighted) and
    ``{prefix}_char_frac`` (unit-length-weighted)."""
    counts = (units.groupBy(*id_cols, "unit")
              .agg(F.count("*").alias("c"),
                   F.first(F.length("unit")).alias("ulen")))
    dup = F.col("c") >= 2
    agg = (counts.groupBy(*id_cols)
           .agg(F.sum("c").alias("_n"),
                F.sum(F.when(dup, F.col("c")).otherwise(0)).alias("_nd"),
                F.sum(F.col("c") * F.col("ulen")).alias("_ch"),
                F.sum(F.when(dup, F.col("c") * F.col("ulen"))
                      .otherwise(0)).alias("_chd")))
    frac = F.when(F.col("_n") > 0,
                  F.col("_nd").cast("double")
                  / F.col("_n").cast("double")).otherwise(F.lit(0.0))
    cfrac = F.when(F.col("_ch") > 0,
                   F.col("_chd").cast("double")
                   / F.col("_ch").cast("double")).otherwise(F.lit(0.0))
    return agg.select(*id_cols,
                      F.round(frac, 6).alias(f"{prefix}_frac"),
                      F.round(cfrac, 6).alias(f"{prefix}_char_frac"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> DataFrame:
    """Per-document repetition metrics (module docstring has the exact
    definitions).  Returns one row per input row: ``id_cols`` + the
    metric columns, fractions rounded to 6 -- every metric is a single
    division of exact integer counters, so the values are bit-identical
    across engines and partitionings.

    ``id_cols`` must uniquely key ``df`` (like the index/sampling
    operators, duplicate keys would merge two documents' counters)."""
    if id_cols is None:
        id_cols = ["doc_id"]
    for n in (*top_ns, *dup_ns):
        if n < 2:
            raise ValueError(f"n-gram sizes must be >= 2, got {n}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(*id_cols, text.alias("_text"),
                     _tokens(F.col(text_col)).alias("_toks"))

    lines = (base.select(*id_cols,
                         F.explode(F.filter(
                             F.split("_text", LINE_SPLIT),
                             lambda x: x != "")).alias("unit")))
    paras = (base.select(*id_cols,
                         F.explode(F.filter(
                             F.split("_text", PARA_SPLIT),
                             lambda x: x != "")).alias("unit")))
    out = (base.select(*id_cols, F.length("_text").alias("_len"))
           .join(_unit_dup_fracs(lines, id_cols, "dup_line"),
                 id_cols, "left")
           .join(_unit_dup_fracs(paras, id_cols, "dup_para"),
                 id_cols, "left"))

    for n in top_ns:
        gcounts = (base.select(*id_cols,
                               F.explode(F.expr(_grams_expr(n)))
                               .alias("gram"))
                   .groupBy(*id_cols, "gram")
                   .agg(F.count("*").alias("c")))
        # min of (-c, gram): largest count, ties -> lexicographically
        # smallest gram; one map-side-combinable agg, no window
        top = (gcounts.groupBy(*id_cols)
               .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                   F.col("gram").alias("g"))).alias("t"))
               .select(*id_cols,
                       (-F.col("t.nc")).alias("_c"),
                       F.length("t.g").alias("_glen")))
        out = out.join(top, id_cols, "left").withColumn(
            f"top{n}_char_frac",
            F.round(F.when(
                (F.col("_len") > 0) & (F.col("_c") >= 2),
                F.least(F.lit(1.0),
                        (F.col("_c") * F.col("_glen")).cast("double")
                        / F.col("_len").cast("double")))
             .otherwise(F.lit(0.0)), 6)).drop("_c", "_glen")

    for n in dup_ns:
        gcounts = (base.select(*id_cols,
                               F.explode(F.expr(_grams_expr(n)))
                               .alias("gram"))
                   .groupBy(*id_cols, "gram")
                   .agg(F.count("*").alias("c"),
                        F.first(F.length("gram")).alias("glen")))
        dupchars = (gcounts.filter(F.col("c") >= 2)
                    .groupBy(*id_cols)
                    .agg(F.sum(F.col("c") * F.col("glen")).alias("_dch")))
        out = out.join(dupchars, id_cols, "left").withColumn(
            f"dup{n}_char_frac",
            F.round(F.when(
                (F.col("_len") > 0) & F.col("_dch").isNotNull(),
                F.least(F.lit(1.0),
                        F.col("_dch").cast("double")
                        / F.col("_len").cast("double")))
             .otherwise(F.lit(0.0)), 6)).drop("_dch")

    cols = (list(id_cols)
            + ["dup_line_frac", "dup_line_char_frac",
               "dup_para_frac", "dup_para_char_frac"]
            + [f"top{n}_char_frac" for n in top_ns]
            + [f"dup{n}_char_frac" for n in dup_ns])
    out = out.drop("_len")
    # a doc with no units (empty text) got NULL fracs from the left
    # joins -- normalize to 0.0
    for c in cols[len(id_cols):]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return out.select(*cols)


def repetition_keep_condition(
    stats_df: DataFrame,
    thresholds: dict[str, float] | None = None,
) -> Column:
    """Boolean keep column over a :func:`repetition_stats` frame: True
    when NO metric breaches its threshold (Gopher drops on any breach).
    ``thresholds`` defaults to :data:`GOPHER_THRESHOLDS`; keys must be
    metric columns present in ``stats_df``."""
    if thresholds is None:
        thresholds = GOPHER_THRESHOLDS
    missing = [k for k in thresholds if k not in stats_df.columns]
    if missing:
        raise ValueError(
            f"thresholds reference metrics not in the stats frame: "
            f"{missing}; computed: "
            f"{[c for c in stats_df.columns if c.endswith('_frac')]}")
    cond = F.lit(True)
    for k, v in sorted(thresholds.items()):
        cond = cond & (F.col(k) <= F.lit(float(v)))
    return cond


def _py_repetition_metrics(
    text: str | None,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
) -> dict[str, float]:
    """Pure-Python replica of :func:`repetition_stats` for ONE document
    -- the streaming path's kernel, and the parity reference the tests
    pin against the Spark aggregation.  Exactness notes: counters are
    exact ints and each metric is one float division, identical to the
    JVM's double division; rounding replicates Spark's
    ``F.round(x, 6)`` (Java ``BigDecimal(double)`` HALF_UP on the exact
    binary expansion) via ``Decimal(x).quantize(..., ROUND_HALF_UP)``
    -- Python's builtin ``round`` is banker's and would diverge at
    midpoints; string ties compare by code point, which equals the
    JVM's binary UTF-8 collation order."""
    import re as _re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("1e-6"),
                                         rounding=ROUND_HALF_UP))

    text = text or ""
    total = len(text)
    out: dict[str, float] = {}
    for prefix, pattern in (("dup_line", LINE_SPLIT),
                            ("dup_para", PARA_SPLIT)):
        units = [u for u in _re.split(pattern, text) if u != ""]
        c = Counter(units)
        n = sum(c.values())
        nd = sum(v for v in c.values() if v >= 2)
        ch = sum(v * len(u) for u, v in c.items())
        chd = sum(v * len(u) for u, v in c.items() if v >= 2)
        out[f"{prefix}_frac"] = r6(nd / n) if n > 0 else 0.0
        out[f"{prefix}_char_frac"] = r6(chd / ch) if ch > 0 else 0.0
    toks = [t for t in _re.split(WS_CLASS, text) if t != ""]
    for n in top_ns:
        grams = [" ".join(toks[i:i + n])
                 for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        if not c:
            out[f"top{n}_char_frac"] = 0.0
            continue
        c_top = max(c.values())
        if total <= 0 or c_top < 2:
            out[f"top{n}_char_frac"] = 0.0
            continue
        g = min(g for g, v in c.items() if v == c_top)
        out[f"top{n}_char_frac"] = r6(min(1.0, c_top * len(g) / total))
    for n in dup_ns:
        grams = [" ".join(toks[i:i + n])
                 for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        dch = sum(v * len(g) for g, v in c.items() if v >= 2)
        out[f"dup{n}_char_frac"] = (
            r6(min(1.0, dch / total)) if total > 0 and dch > 0 else 0.0)
    return out


def make_repetition_keep_udf(thresholds: dict[str, float] | None = None):
    """Arrow-batched keep/drop predicate over a text column for the
    STATELESS streaming path: the batch operator's explode + groupBy is
    a stateful aggregation under Structured Streaming, so the stream
    gate recomputes the same per-document metrics row-locally
    (:func:`_py_repetition_metrics` -- exact-int counters, one
    division, HALF_UP rounding) and compares them to the same
    thresholds.  Per-row Python, but documents are transcript turns
    (short) and the batch path stays the JVM aggregation."""
    from pyspark.sql.functions import pandas_udf

    if thresholds is None:
        thresholds = GOPHER_THRESHOLDS
    thr = {k: float(v) for k, v in sorted(thresholds.items())}
    known = ({"dup_line_frac", "dup_line_char_frac",
              "dup_para_frac", "dup_para_char_frac"}
             | {f"top{n}_char_frac" for n in range(2, 100)}
             | {f"dup{n}_char_frac" for n in range(2, 100)})
    unknown = [k for k in thr if k not in known]
    if unknown:
        raise ValueError(f"unknown repetition metrics: {unknown}")
    top_ns, dup_ns = threshold_gram_sizes(thr)

    @pandas_udf("boolean")
    def keep(texts: pd.Series) -> pd.Series:
        def one(t):
            m = _py_repetition_metrics(t, top_ns, dup_ns)
            return all(m[k] <= v for k, v in thr.items())
        return texts.map(one)

    return keep


def threshold_gram_sizes(
    thresholds: dict[str, float],
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """The ``(top_ns, dup_ns)`` gram sizes a threshold set needs --
    :func:`repetition_stats` then computes only those (the line/
    paragraph metrics are always computed; they are cheap)."""
    top_ns = tuple(sorted(
        int(k[3:-10]) for k in thresholds
        if k.startswith("top") and k.endswith("_char_frac")))
    dup_ns = tuple(sorted(
        int(k[3:-10]) for k in thresholds
        if k.startswith("dup") and k.endswith("_char_frac")
        and not k.startswith("dup_")))
    return top_ns, dup_ns


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Drop documents breaching any repetition threshold (Gopher rule).
    Returns ``df``'s rows (original columns) whose metrics all pass;
    computes only the metrics the thresholds need."""
    if id_cols is None:
        id_cols = ["doc_id"]
    if thresholds is None:
        thresholds = GOPHER_THRESHOLDS
    top_ns, dup_ns = threshold_gram_sizes(thresholds)
    stats = repetition_stats(df, text_col, id_cols,
                             top_ns=top_ns, dup_ns=dup_ns)
    keep = stats.filter(repetition_keep_condition(stats, thresholds)) \
        .select(*id_cols)
    return df.join(keep, id_cols, "left_semi")
