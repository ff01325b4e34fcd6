"""Deterministic, reproducible sampling for training-data mixes.

A training run's data mix must be REPRODUCIBLE (rerun the pipeline,
get byte-identical splits) and CONSISTENT across machines/partitionings
-- which rules out ``df.sample()`` (seeded per-partition RNG: the same
row lands in or out depending on how the scan split) and
``ORDER BY rand()`` entirely.  Everything here keys selection on a
content-derived hash, so membership is a pure function of the row key +
seed:

* :func:`deterministic_sample` -- keep a fraction by hash threshold.
  Plan shape: ONE filter, no shuffle, no state; pushes through scans and
  composes with resume (a row's membership never changes).  The hash is
  md5 of the key columns + seed, compared as a HEX STRING against the
  fraction's threshold -- md5 is identical everywhere (unlike
  xxhash64/crc variants, which differ engine to engine), so the exact
  same rule is expressible in any SQL engine for auditing (the driver's
  DuckDB twin runs it verbatim).
* :func:`stratified_sample_n` -- exactly n rows per stratum (e.g. per
  language, per source), deterministically: rank rows inside each
  stratum by the same md5 hash and keep rank <= n.  One hash-partition
  window; for a pathologically hot stratum at 100 TB, pre-filter with
  :func:`deterministic_sample` at ~(3n / stratum_size) first so the
  window sorts thousands of rows, not billions -- the two compose
  exactly because both rank by the SAME hash (the top-n of a
  hash-prefix is the top-n overall whenever the prefix keeps >= n rows).

Fraction semantics: md5 is uniform on [0, 16^32); ``fraction`` maps to
a 28-hex-digit threshold computed in exact integer arithmetic, so the
expected keep rate is within 16^-28 of the request -- sampling error is
binomial over rows, not threshold rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 28  # threshold resolution; md5 has 32 hex digits total


def sample_hash_col(key_cols: list[str], seed: int = 0) -> F.Column:
    """The selection hash: md5 over the key columns + seed, as lowercase
    hex.

    The hash input is UNAMBIGUOUS by construction: each part is encoded
    length-prefixed (``{len}:{value}``; NULL becomes the bare tag
    ``n:``, which no real value can produce since lengths are digits),
    so distinct multi-column keys can never concatenate to the same
    message the way bare-separator joins can (``('x<sep>y', 'z')`` vs
    ``('x', 'y<sep>z')``), and a literal string equal to a NULL sentinel
    cannot collide with NULL.  NULL keys therefore sample consistently
    instead of vanishing (md5(NULL) is NULL and every comparison against
    it would be NULL-false).  The encoding is plain string arithmetic so
    any SQL engine reproduces it verbatim (the DuckDB contract twin
    does)."""
    encoded = []
    for c in key_cols:
        s = F.col(c).cast("string")
        encoded.append(F.when(s.isNull(), F.lit("n:"))
                        .otherwise(F.concat(F.length(s).cast("string"),
                                            F.lit(":"), s)))
    seed_s = str(int(seed))
    encoded.append(F.lit(f"{len(seed_s)}:{seed_s}"))
    return F.md5(F.concat(*encoded))


def fraction_threshold(fraction: float) -> str:
    """``fraction`` as a ``_HEX_DIGITS``-digit lowercase hex threshold:
    a row is kept iff its hash's first ``_HEX_DIGITS`` hex digits are
    lexicographically below this string.  Exact integer arithmetic -- no
    float rounding beyond the caller's fraction itself.  ``fraction=1.0``
    yields a string above every md5 prefix ("g" > "f"), keeping all."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    scaled = int(round(fraction * (16 ** _HEX_DIGITS)))
    if scaled >= 16 ** _HEX_DIGITS:
        return "g"  # lexicographically above any hex string: keep all
    return format(scaled, f"0{_HEX_DIGITS}x")


def sample_keep_condition(key_cols: list[str], fraction: float,
                          seed: int = 0) -> F.Column:
    """The boolean keep condition of :func:`deterministic_sample`, as a
    column -- usable both as a filter predicate and as a countable
    expression (``sum(cond.cast("long"))``), so a lineage counter and
    the filter itself share ONE definition and cannot drift."""
    thr = fraction_threshold(fraction)
    return (F.substring(sample_hash_col(key_cols, seed), 1, _HEX_DIGITS)
            < F.lit(thr))


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash.

    Membership is a pure function of (key columns, seed): stable across
    reruns, partitionings, engines, and resume -- the property
    ``df.sample()`` does not have.  Disjoint seeds give independent
    samples; the SAME seed at a larger fraction gives a SUPERSET
    (nested samples for scaling-law curves: the 1% mix is contained in
    the 10% mix by construction).  Zero shuffle: one codegen'd filter."""
    return df.filter(sample_keep_condition(key_cols, fraction, seed))


def stratified_sample_n(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    key_cols: list[str],
    seed: int = 0,
    strict: bool = True,
) -> DataFrame:
    """Exactly ``min(n, stratum_size)`` rows per stratum, deterministic.

    Rows rank inside each stratum by the same md5 selection hash.
    ``key_cols`` must uniquely identify rows (the same requirement every
    keyed operator here has): rows DUPLICATING a key hash identically,
    and when such a tie straddles the rank-n boundary the choice among
    the duplicates is partitioning-dependent.  ``strict=True`` (default)
    verifies uniqueness up front with one cheap aggregate (count vs
    hash-distinct count over the input) and raises ``ValueError`` on
    duplicates -- a loud error instead of a silent nondeterminism; the
    check is an eager Spark job, so callers that have ALREADY deduped
    and need a lazy plan can pass ``strict=False`` (run exact dedup
    first if the key is not unique).  The balanced-mix primitive: n per
    language, n per source, n per topic bucket.  One window over a hash
    exchange on the strata; for a hot stratum, pre-thin with
    :func:`deterministic_sample` (same seed) first -- hash-prefix top-n
    equals global top-n while the prefix holds >= n rows."""
    from pyspark.sql.window import Window

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = sample_hash_col(key_cols, seed)
    if strict:
        # distinct-count the HASH, not the key tuple: count_distinct over
        # multiple columns skips rows with any NULL part, while the hash
        # is never NULL (NULLs encode as the 'n:' tag)
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct(h).alias("d")).first()
        if row["n"] != row["d"]:
            raise ValueError(
                f"key_cols {key_cols} do not uniquely identify rows "
                f"({row['n']} rows, {row['d']} distinct keys): duplicate "
                f"keys hash identically and make the rank-n boundary "
                f"partitioning-dependent -- run exact dedup first, or "
                f"pass strict=False to accept the tie nondeterminism")
    w = Window.partitionBy(*strata_cols).orderBy(h.asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= F.lit(int(n)))
            .drop("_rk"))
