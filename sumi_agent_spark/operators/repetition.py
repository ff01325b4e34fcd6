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


# ─── row-local duplicate counting over sorted arrays (r7 optimization) ───
#
# Every metric in this module is PER-DOCUMENT, so nothing about it needs a
# shuffle: the pre-r7 implementation exploded each document's units into
# corpus-wide rows and paid 11 groupBy exchanges + 11 joins per call.  The
# same exact integer counters fall out of each row's own sorted unit
# array: after ``array_sort`` (binary UTF8 collation -- the same tie order
# the exploded groupBy used), equal units are adjacent, so
#
# * an occurrence belongs to a duplicated unit  <=>  it equals a sorted
#   neighbor, and
# * the most-frequent unit is the longest equal-run (first such run wins
#   ties = lexicographically smallest, as before).
#
# Both are one ``aggregate`` fold per array, carrying the previous element
# and the current run length in a struct accumulator -- exact integer
# arithmetic, identical values, zero exchanges.


def _dup_run_fold(sorted_arr: Column) -> Column:
    """struct(nd, chd, n, ch) from one fold over a sorted unit array:
    occurrences in runs of length >= 2 (``nd``), their char sum
    (``chd``), total occurrences (``n``) and total chars (``ch``)."""
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("cc"),
        F.lit(0).cast("long").alias("nd"),
        F.lit(0).cast("long").alias("chd"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("ch"))

    def merge(acc, x):
        run_ends = (acc["cc"] > 0) & (x != acc["prev"])
        flush_nd = F.when(run_ends & (acc["cc"] >= 2), acc["cc"]) \
            .otherwise(F.lit(0).cast("long"))
        flush_chd = F.when(run_ends & (acc["cc"] >= 2),
                           acc["cc"] * F.length(acc["prev"]).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        return F.struct(
            x.alias("prev"),
            F.when(run_ends | (acc["cc"] == 0), F.lit(1).cast("long"))
             .otherwise(acc["cc"] + 1).alias("cc"),
            (acc["nd"] + flush_nd).alias("nd"),
            (acc["chd"] + flush_chd).alias("chd"),
            (acc["n"] + 1).alias("n"),
            (acc["ch"] + F.length(x).cast("long")).alias("ch"))

    def finish(acc):
        last_dup = acc["cc"] >= 2
        return F.struct(
            (acc["nd"] + F.when(last_dup, acc["cc"])
             .otherwise(F.lit(0).cast("long"))).alias("nd"),
            (acc["chd"] + F.when(
                last_dup, acc["cc"] * F.length(acc["prev"]).cast("long"))
             .otherwise(F.lit(0).cast("long"))).alias("chd"),
            acc["n"].alias("n"), acc["ch"].alias("ch"))

    return F.aggregate(sorted_arr, zero, merge, finish)


def _top_run_fold(sorted_arr: Column) -> Column:
    """struct(bc, bl) from one fold over a sorted gram array: the count of
    the most frequent gram (``bc``) and that gram's char length (``bl``).
    Strict ``>`` keeps the FIRST maximal run, i.e. the lexicographically
    smallest gram -- the same deterministic tie rule as before."""
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("cc"),
        F.lit(0).cast("long").alias("bc"),
        F.lit(0).cast("long").alias("bl"))

    def merge(acc, x):
        run_ends = (acc["cc"] > 0) & (x != acc["prev"])
        better = run_ends & (acc["cc"] > acc["bc"])
        return F.struct(
            x.alias("prev"),
            F.when(run_ends | (acc["cc"] == 0), F.lit(1).cast("long"))
             .otherwise(acc["cc"] + 1).alias("cc"),
            F.when(better, acc["cc"]).otherwise(acc["bc"]).alias("bc"),
            F.when(better, F.length(acc["prev"]).cast("long"))
             .otherwise(acc["bl"]).alias("bl"))

    def finish(acc):
        better = acc["cc"] > acc["bc"]
        return F.struct(
            F.when(better, acc["cc"]).otherwise(acc["bc"]).alias("bc"),
            F.when(better, F.length(acc["prev"]).cast("long"))
             .otherwise(acc["bl"]).alias("bl"))

    return F.aggregate(sorted_arr, zero, merge, finish)


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
    operators, duplicate keys would merge two documents' counters).

    Execution shape (r7 optimization): every counter is computed
    row-locally by folding the row's own SORTED unit arrays
    (:func:`_dup_run_fold` / :func:`_top_run_fold`) -- the plan has no
    Exchange at all, where the previous explode + groupBy formulation
    paid 11 corpus-wide shuffles and 11 joins for per-document
    metrics.  Counter values are identical exact integers; the division
    and rounding are unchanged."""
    if id_cols is None:
        id_cols = ["doc_id"]
    for n in (*top_ns, *dup_ns):
        if n < 2:
            raise ValueError(f"n-gram sizes must be >= 2, got {n}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(*id_cols, text.alias("_text"),
                     _tokens(F.col(text_col)).alias("_toks"))

    lines_sorted = F.array_sort(F.filter(
        F.split(F.col("_text"), LINE_SPLIT), lambda x: x != ""))
    paras_sorted = F.array_sort(F.filter(
        F.split(F.col("_text"), PARA_SPLIT), lambda x: x != ""))
    proj = [F.length("_text").alias("_len"),
            _dup_run_fold(lines_sorted).alias("_lines"),
            _dup_run_fold(paras_sorted).alias("_paras")]
    for n in top_ns:
        proj.append(_top_run_fold(F.array_sort(F.expr(_grams_expr(n))))
                    .alias(f"_top{n}"))
    for n in dup_ns:
        proj.append(_dup_run_fold(F.array_sort(F.expr(_grams_expr(n))))
                    .alias(f"_dup{n}"))
    agg = base.select(*id_cols, *proj)

    def unit_fracs(s: str, prefix: str) -> list:
        frac = F.when(F.col(f"{s}.n") > 0,
                      F.col(f"{s}.nd").cast("double")
                      / F.col(f"{s}.n").cast("double")).otherwise(F.lit(0.0))
        cfrac = F.when(F.col(f"{s}.ch") > 0,
                       F.col(f"{s}.chd").cast("double")
                       / F.col(f"{s}.ch").cast("double")) \
            .otherwise(F.lit(0.0))
        return [F.round(frac, 6).alias(f"{prefix}_frac"),
                F.round(cfrac, 6).alias(f"{prefix}_char_frac")]

    out_cols = list(id_cols)
    out_cols += unit_fracs("_lines", "dup_line")
    out_cols += unit_fracs("_paras", "dup_para")
    for n in top_ns:
        s = f"_top{n}"
        out_cols.append(F.round(F.when(
            (F.col("_len") > 0) & (F.col(f"{s}.bc") >= 2),
            F.least(F.lit(1.0),
                    (F.col(f"{s}.bc") * F.col(f"{s}.bl")).cast("double")
                    / F.col("_len").cast("double")))
            .otherwise(F.lit(0.0)), 6).alias(f"top{n}_char_frac"))
    for n in dup_ns:
        s = f"_dup{n}"
        out_cols.append(F.round(F.when(
            (F.col("_len") > 0) & (F.col(f"{s}.chd") > 0),
            F.least(F.lit(1.0),
                    F.col(f"{s}.chd").cast("double")
                    / F.col("_len").cast("double")))
            .otherwise(F.lit(0.0)), 6).alias(f"dup{n}_char_frac"))
    return agg.select(*out_cols)


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
