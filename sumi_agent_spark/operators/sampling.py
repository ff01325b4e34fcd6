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
    first if the key is not unique).  Cost note (measured r6): the
    guard's count + hash-distinct count pass is the whole reason
    ``stratified_topn`` regressed 0.40 -> 0.56 s in the r6 bench --
    after the first validated run of a static input, pass
    ``strict=False`` in a pipeline gate and keep the guard for new or
    changing inputs.  The balanced-mix primitive: n per
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


_PREFIX_DIGITS = 15   # 60-bit numeric prefix: fits BIGINT in every engine
_PREFIX_SPACE = 16 ** _PREFIX_DIGITS


def normalize_shares(shares: dict) -> dict:
    """Validate + normalize a ``{stratum: share}`` dict to sum 1.0.

    Exposed (rather than inlined in :func:`token_budget_sample`) because
    an auditing twin must reproduce the exact same float division when
    recomputing thresholds -- one shared definition, zero drift."""
    if not shares:
        raise ValueError("shares must be a non-empty {stratum: share} dict")
    if any(v < 0 for v in shares.values()):
        raise ValueError(f"shares must be non-negative, got {shares}")
    tot = float(sum(shares.values()))
    if tot <= 0:
        raise ValueError(f"shares must sum to a positive value: {shares}")
    return {k: float(v) / tot for k, v in shares.items()}


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    shares: dict,
    key_cols: list[str],
    token_col: str,
    total_tokens: int | None = None,
    seed: int = 0,
    allow_short: bool = False,
) -> tuple[DataFrame, dict]:
    """Sample toward a TARGET TOKEN MIXTURE: ``shares`` maps stratum
    value (e.g. source name) to its desired share of the output token
    mass.  Row-fraction sampling approximates a token mix badly when doc
    lengths differ by source (a 10%-of-rows sample of a long-doc source
    is not 10% of its tokens); this derives per-stratum keep FRACTIONS
    from token totals instead.

    Two passes: (1) one small aggregate computes each stratum's
    available tokens ``a_i`` (driver receives one row per stratum --
    bounded metadata, like every other lineage probe here); (2) the data
    path applies :func:`deterministic_sample`'s hash rule per stratum
    with fraction ``f_i = min(1, T*s_i / a_i)`` -- a single codegen'd
    filter, ZERO shuffle.  ``T`` is ``total_tokens``, or when ``None``
    the largest feasible budget: ``min_i(a_i / s_i)``, the point where
    the scarcest stratum is consumed whole (PaLM/Llama mixtures
    oversample scarce high-quality sources exactly this way).
    ``shares`` are normalized to sum 1.  Expected realized tokens per
    stratum are ``f_i * a_i ~= T * s_i``; the error is binomial over
    docs, so the realized MIX tightens as strata grow -- at training
    scale it is exact for all practical purposes.

    Selection rule: the first ``_PREFIX_DIGITS`` hex digits of the
    shared md5 selection hash, READ AS AN INTEGER, must fall below
    ``floor(f_i * 16^15)`` -- numeric, not the 28-hex-string compare of
    :func:`deterministic_sample`, because here fractions are
    data-dependent and an auditing engine must recompute the exact
    thresholds from the same aggregate; integer-vs-integer comparison
    over a 60-bit prefix is expressible in any SQL dialect
    (``('0x' || substr(md5, 1, 15))::BIGINT`` in DuckDB -- the driver
    twin does exactly this), while cross-engine hex FORMATTING of a
    112-bit threshold is not.  60-bit resolution (~9e-19) is far below
    binomial noise.  Same hash, same monotone rule => samples are
    NESTED across budgets at one seed, and membership is
    partitioning/rerun/engine-invariant as everywhere in this module.

    Rows whose stratum is missing from ``shares`` (or NULL) are NOT
    part of the requested mixture and are dropped.  A stratum requested
    with a positive share but absent from ``df`` raises (the mixture is
    unsatisfiable -- deciding to ship a skewed mix anyway should be an
    explicit caller edit, not a silent renormalization).

    An EXPLICIT ``total_tokens`` that some stratum cannot fill raises
    (the realized mix would be silently skewed -- same explicitness
    policy as the missing-stratum check); ``allow_short=True`` opts
    into capping that stratum's fraction at 1.0 instead.

    Returns ``(sampled_df, info)`` where ``info`` carries the budget,
    total ``rows_in``, and per-stratum ``{available_tokens, n_rows,
    fraction, threshold}`` for lineage sidecars;
    :func:`token_budget_keep_condition` rebuilds the exact keep
    predicate from ``info["strata"]`` for counters."""
    import math

    norm = normalize_shares(shares)

    avail_rows = (df.groupBy(stratum_col)
                  .agg(F.sum(F.col(token_col)).alias("_a"),
                       F.count(F.lit(1)).alias("_n")).collect())
    avail = {r[stratum_col]: int(r["_a"] or 0) for r in avail_rows}
    nrows = {r[stratum_col]: int(r["_n"]) for r in avail_rows}
    missing = [k for k, s in norm.items()
               if s > 0 and avail.get(k, 0) <= 0]
    if missing:
        raise ValueError(
            f"strata {missing} have a positive share but no tokens in the "
            f"input -- the requested mixture is unsatisfiable (drop them "
            f"from shares to proceed)")

    if total_tokens is None:
        budget = min(avail[k] / s for k, s in norm.items() if s > 0)
    else:
        budget = float(total_tokens)
        # an explicit budget a stratum cannot fill would silently cap its
        # fraction at 1.0 and ship a SKEWED mix (the scarce source
        # under-delivers while the others fill their shares) -- the same
        # explicitness policy as the missing-stratum check above: raise,
        # unless the caller opts into the skew with allow_short=True.
        # Tolerance absorbs the float wobble of a budget derived from
        # min(a/s) round-tripping through the fraction formula.
        short = {k: round(budget * sv, 1) for k, sv in norm.items()
                 if sv > 0 and (budget * sv) / avail[k] > 1.0 + 1e-9}
        if short and not allow_short:
            raise ValueError(
                f"total_tokens={total_tokens} is infeasible: strata "
                f"{sorted(short)} cannot supply their target token mass "
                f"(targets {short}, available "
                f"{ {k: avail[k] for k in sorted(short)} }) -- the "
                f"realized mix would be silently skewed.  Lower the "
                f"budget (or pass total_tokens=None for the max feasible "
                f"one), adjust shares, or pass allow_short=True to "
                f"accept the skew")

    strata_info = {}
    for k, s in norm.items():
        if s <= 0:
            continue
        # one multiply then one divide, floored against the 60-bit space:
        # plain IEEE double steps an auditing engine reproduces bit-exactly
        f = min(1.0, (budget * s) / avail[k])
        thr = int(math.floor(f * _PREFIX_SPACE))
        strata_info[k] = {"available_tokens": avail[k],
                          "n_rows": nrows.get(k, 0),
                          "fraction": f, "threshold": thr}
    info = {"budget_tokens": budget, "seed": int(seed),
            "rows_in": sum(nrows.values()), "strata": strata_info}
    cond = token_budget_keep_condition(stratum_col, strata_info,
                                       key_cols, seed)
    return df.filter(cond), info


def token_budget_keep_condition(stratum_col: str, strata_info: dict,
                                key_cols: list[str],
                                seed: int = 0) -> F.Column:
    """The boolean keep condition of :func:`token_budget_sample`,
    reconstructable from its ``info["strata"]`` -- shared by the filter
    and any lineage counter (``sum(cond.cast("long"))``), the same
    one-definition discipline as :func:`sample_keep_condition`."""
    if not strata_info:
        raise ValueError("strata_info is empty")
    prefix = F.conv(
        F.substring(sample_hash_col(key_cols, seed), 1, _PREFIX_DIGITS),
        16, 10).cast("long")
    cond = None
    for k, si in strata_info.items():
        this = ((F.col(stratum_col) == F.lit(k))
                & (prefix < F.lit(int(si["threshold"]))))
        cond = this if cond is None else (cond | this)
    return cond
