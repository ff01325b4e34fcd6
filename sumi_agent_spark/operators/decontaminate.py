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

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .dedup import make_shingle_udf

# explicit ASCII whitespace class, NOT str.split(): the DuckDB twin
# tokenizes with RE2's [ \t\n\r\f\v]+ and Python's str.split() would
# additionally split on unicode spaces (U+3000 etc.), silently desyncing
# the two sides on Japanese text
_WS_SPLIT = re.compile(r"[ \t\n\r\f\v]+")
_HASH_BASE = np.uint64(1000003)
# stand-in hashed for a zero-token text's empty window.  NOT a bare
# control char: windows are space-joined tokens and a token CAN be a
# single "\x1f", which would hash-collide with the empty window and
# falsely flag such a doc against an empty benchmark row (and silently
# break DuckDB-twin parity, where '' != '\x1f').  A token equal to this
# exact multi-char string is possible in principle (tokens just exclude
# whitespace) but is the same likelihood class as a 64-bit hash
# collision, which the operator already accepts.
_EMPTY_WINDOW_SENTINEL = "\x00<empty-window>\x00"


_POW_TABLE = np.ones(1, dtype=np.uint64)  # _HASH_BASE powers, grown on demand
_POW_CACHE_MAX = 1 << 16  # cap the per-process cache at 512 KB


def _base_powers(n: int) -> np.ndarray:
    """First ``n`` powers of ``_HASH_BASE`` mod 2^64.

    ``np.power`` with uint64 exponents computes an integer pow PER
    ELEMENT and dominated the window-hash profile; a cumprod table is
    cheap.  Requests up to :data:`_POW_CACHE_MAX` are cached per process
    and amortized across every batch the worker ever sees; a larger
    request (one pathological multi-megabyte token) gets a TRANSIENT
    table instead, so a single outlier row cannot pin an arbitrarily
    large array in every long-lived Python worker."""
    global _POW_TABLE

    def build(m: int) -> np.ndarray:
        t = np.empty(m, dtype=np.uint64)
        t[0] = 1
        t[1:] = np.cumprod(
            np.full(m - 1, _HASH_BASE, dtype=np.uint64))  # wraps mod 2^64
        return t

    if n > _POW_CACHE_MAX:
        return build(n)
    if len(_POW_TABLE) < n:
        _POW_TABLE = build(n)
    return _POW_TABLE


def _hash_windows(flat: list[str]) -> np.ndarray:
    """Vectorized polynomial hash (mod 2^64) of each string in ``flat``.

    One utf-32 encode of the concatenation + one ``add.reduceat``; empty
    strings are sentinel-replaced first (a zero-length reduceat segment
    would return the NEXT segment's first element, not 0)."""
    if not flat:
        return np.empty(0, dtype=np.uint64)
    flat = [w if w else _EMPTY_WINDOW_SENTINEL for w in flat]
    joined = "".join(flat)
    cps = np.frombuffer(joined.encode("utf-32-le"),
                        dtype=np.uint32).astype(np.uint64)
    lens = np.array([len(w) for w in flat], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = (np.arange(len(cps), dtype=np.int64)
           - np.repeat(starts, lens))
    terms = cps * _base_powers(int(lens.max()))[pos]
    return np.add.reduceat(terms, starts)


# hash of a zero-token text's single empty window (the old string path
# hashed the sentinel string; the token-poly path keeps the same value)
_EMPTY_SENTINEL_HASH = None  # filled lazily: _hash_windows must exist first


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants): a
    bijective avalanche over uint64, wrapping mod 2^64 by design."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _empty_sentinel_hash() -> np.uint64:
    global _EMPTY_SENTINEL_HASH
    if _EMPTY_SENTINEL_HASH is None:
        _EMPTY_SENTINEL_HASH = np.uint64(_hash_windows([""])[0])
    return _EMPTY_SENTINEL_HASH


def make_word_shingle_udf(n_tokens: int = 13):
    """Series[str] -> array<long> of the row's unique word-n-gram hashes.

    The GPT-3-style decontamination unit: windows of ``n_tokens``
    whitespace-separated tokens, space-rejoined then hashed.  A text with
    FEWER than ``n_tokens`` tokens contributes its whole token-joined
    text as one window (the standard short-doc rule: compare the full
    document), and NULL/empty texts one sentinel window.  Tokenization is
    the explicit ASCII class ``[ \\t\\n\\r\\f\\v]+`` so the DuckDB twin
    can reproduce it exactly (see ``_WS_SPLIT``)."""

    @pandas_udf(ArrayType(LongType()))
    def word_shingles(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:  # empty Arrow batch (empty partition/stream)
            return pd.Series([], dtype=object)
        # r7 optimization: hash each TOKEN once (vectorized), then form
        # window hashes as a k-token polynomial over the token hashes --
        # the previous shape materialized every window as a space-joined
        # STRING (~k x the corpus bytes) and re-hashed those characters,
        # which dominated the profile ~10x.  Window identity is preserved
        # (a window's token sequence determines its hash; both the
        # benchmark and corpus sides share this UDF, and the DuckDB twin
        # compares the window STRINGS, so the internal hash is free to
        # change) up to 64-bit collisions, the same risk class every
        # hash-keyed operator here accepts.
        n = len(texts)
        tok_lists = [[x for x in _WS_SPLIT.split(t) if x]
                     for t in texts.fillna("")]
        n_toks = np.fromiter((len(tl) for tl in tok_lists),
                             dtype=np.int64, count=n)
        flat = [tok for tl in tok_lists for tok in tl]
        # per-token polynomial hash, then a splitmix64 finalizer: the raw
        # poly has small codepoint coefficients in the SAME base the
        # window combine uses, so unmixed token hashes would alias token
        # sequences exactly the way digit strings alias without a
        # separator -- mixing makes the combine's coefficients
        # effectively random 64-bit values
        tokh = _mix64(_hash_windows(flat))
        k = n_tokens
        long_rows = n_toks >= k
        # rolling big-endian poly over token hashes for full-size windows
        W = max(int(len(tokh)) - k + 1, 0)
        row_of = np.repeat(np.arange(n), n_toks)
        if W > 0:
            acc = np.zeros(W, dtype=np.uint64)
            for i in range(k):
                acc = acc * _HASH_BASE + tokh[i:i + W]
            valid = ((row_of[:W] == row_of[k - 1:k - 1 + W])
                     & long_rows[row_of[:W]])
            wvals, wrows = acc[valid], row_of[:W][valid]
        else:
            wvals = np.empty(0, dtype=np.uint64)
            wrows = np.empty(0, dtype=np.int64)
        # short rows (< k tokens): ONE window over all their tokens,
        # same big-endian poly; empty rows hash the sentinel
        short = ~long_rows
        svals = np.zeros(n, dtype=np.uint64)
        if short.any():
            sel = short[row_of]
            sh_h, sh_rows = tokh[sel], row_of[sel]
            if len(sh_h):
                # per-element weight B^(tokens_after) via pos-from-end
                ends = np.cumsum(n_toks)[sh_rows] - 1
                pos_in_flat = np.nonzero(sel)[0]
                from_end = ends - pos_in_flat
                pw = _base_powers(int(from_end.max()) + 1)
                contrib = sh_h * pw[from_end]
                np.add.at(svals, sh_rows, contrib)
            svals[short & (n_toks == 0)] = _empty_sentinel_hash()
        out = []
        w_starts = np.concatenate(
            [[0], np.cumsum(np.bincount(wrows, minlength=n))])
        h64 = wvals.view(np.int64)
        for r in range(n):
            if long_rows[r]:
                out.append(np.unique(h64[w_starts[r]:w_starts[r + 1]]))
            else:
                out.append(svals[r:r + 1].view(np.int64).copy())
        return pd.Series(out)

    return word_shingles


def make_hit_count_udf(bench_hashes):
    """Series[array<long>] -> int: per row, how many of its shingle
    hashes are in the (captured, sorted) benchmark hash set.

    The streaming-side half of decontamination: the benchmark set rides
    in the UDF closure as one sorted int64 array (eval suites are MBs ->
    ~10^6-10^7 hashes, well inside task-broadcast territory), and each
    Arrow batch is counted with one concatenate + searchsorted + reduceat
    -- no per-row Python, no join, no state."""
    from pyspark.sql.types import IntegerType

    bs = np.sort(np.asarray(bench_hashes, dtype=np.int64))

    @pandas_udf(IntegerType())
    def hit_count(arrs: pd.Series) -> pd.Series:
        n = len(arrs)
        if n == 0:
            return pd.Series([], dtype="int32")
        rows = [np.asarray(a, dtype=np.int64) for a in arrs]
        lens = np.array([len(r) for r in rows], dtype=np.int64)
        flat = (np.concatenate(rows) if len(rows) else
                np.empty(0, dtype=np.int64))
        if len(bs) == 0 or len(flat) == 0:
            return pd.Series(np.zeros(n, dtype=np.int32))
        idx = np.searchsorted(bs, flat)
        hit = (idx < len(bs)) & (bs[np.minimum(idx, len(bs) - 1)] == flat)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        counts = np.zeros(n, dtype=np.int64)
        # pass only nonzero segment starts: reduceat over a zero-length
        # segment returns the next element, not 0 (empty rows contribute
        # no elements, so consecutive nonzero starts still bound exactly
        # one row's span each)
        nz = lens > 0
        if nz.any():
            counts[nz] = np.add.reduceat(hit.astype(np.int64), starts[nz])
        return pd.Series(counts.astype(np.int32))

    return hit_count


def _shingler(k: int, ngrams: str):
    if ngrams == "char":
        return make_shingle_udf(k)
    if ngrams == "word":
        return make_word_shingle_udf(k)
    raise ValueError(f"ngrams must be 'char' or 'word', got {ngrams!r}")


def benchmark_shingle_set(benchmark_df: DataFrame, text_col: str,
                          k: int = 13, ngrams: str = "char") -> DataFrame:
    """One-column (``s``) DISTINCT shingle-hash set of the benchmark.

    Compute once and reuse (or persist to parquet) when decontaminating
    many corpora against the same eval suite."""
    sh = _shingler(k, ngrams)
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
    ngrams: str = "char",
) -> DataFrame:
    """Per-doc benchmark-overlap counts + the contamination verdict.

    Returns one row per input doc: ``(<id_col>, n_shingles,
    n_bench_hits, contaminated)`` where ``n_shingles`` is the doc's
    distinct k-gram count, ``n_bench_hits`` how many of those k-grams
    appear anywhere in ``benchmark_df``'s ``bench_text_col`` (default:
    same name as ``text_col``), and ``contaminated`` is
    ``n_bench_hits >= min_hits``.

    ``ngrams="char"`` (default) shingles ``k`` characters -- robust to
    tokenization and the right unit for Japanese text; ``"word"``
    shingles ``k`` whitespace tokens (``make_word_shingle_udf``), the
    GPT-3-appendix unit for space-delimited languages (k=13 tokens
    there).  A paraphrase shares no exact k-gram under either unit and
    is NOT flagged -- exactness is the contract (use
    :func:`flag_benchmark_near_overlap` for fuzzy/paraphrase overlap).

    ``id_col`` keys must be UNIQUE (the same requirement every keyed
    operator here has): per-row shingle sets are distinct, but duplicate
    keys contribute their shared grams once PER ROW, inflating
    ``n_shingles``/``n_bench_hits`` (and the report's containment) with
    multiplicity -- the ``contaminated`` verdict at ``min_hits=1`` is
    unaffected, but ``min_hits > 1`` can overstate.  Deduplicating the
    exploded ``(id, gram)`` stream would fix the counts but costs a full
    shuffle of the O(corpus) gram stream, destroying the map-side-probe
    plan -- run exact dedup first instead.

    ``broadcast=True`` (default) broadcasts the benchmark shingle set;
    pass False when the benchmark side is itself corpus-sized."""
    from ..parallel import fan_out

    bench = (benchmark_shingle_set(benchmark_df,
                                   bench_text_col or text_col, k, ngrams)
             .withColumn("_hit", F.lit(1)))
    if broadcast:
        bench = F.broadcast(bench)
    sh = _shingler(k, ngrams)
    exploded = fan_out(df).select(F.col(id_col).alias("_doc_id"),
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


def benchmark_overlap_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    broadcast: bool = True,
    ngrams: str = "char",
    min_containment: float | None = None,
) -> DataFrame:
    """Per-(doc, benchmark-row) attribution: WHICH eval doc leaked where.

    Returns ``(<id_col>, <bench_id_col>, n_hits, n_bench_shingles,
    containment)`` for every pair with ``n_hits >= min_hits`` shared
    distinct k-grams -- the audit view behind
    :func:`flag_benchmark_overlap`'s yes/no verdict (a flag without
    attribution cannot tell "GSM8K leaked" from "MMLU leaked", which
    decides what gets re-crawled vs re-split).  ``containment`` is
    ``n_hits / n_bench_shingles`` -- how much of THAT eval row's k-gram
    set appears in the doc, the PaLM-style decontamination statistic
    (asymmetric on purpose: a long training doc quoting a whole short
    eval question scores 1.0 regardless of how much other text it has);
    ``min_containment`` (e.g. 0.7) additionally filters on it.
    ``id_col`` keys must be unique, as in :func:`flag_benchmark_overlap`:
    duplicate keys count shared grams with multiplicity, overstating
    ``n_hits`` and ``containment``.  Same
    plan shape as the flag: the benchmark side keeps its row ids but
    still collapses to (bench_id, shingle) rows and broadcasts (its
    per-row gram counts ride the same broadcast); the corpus-side
    explode probes map-side and the only shuffle carries actual hits,
    which are rare by construction."""
    sh_b = _shingler(k, ngrams)
    bench = (benchmark_df
             .select(F.col(bench_id_col).alias("_bid"),
                     F.explode(sh_b(F.col(bench_text_col or text_col)))
                      .alias("s"))
             .distinct())
    from pyspark.sql.window import Window
    # per-bench-row distinct gram count, computed on the (small) bench
    # side before the broadcast -- never a second corpus pass
    bench = bench.withColumn(
        "_nb", F.count("*").over(Window.partitionBy("_bid")))
    if broadcast:
        bench = F.broadcast(bench)
    sh = _shingler(k, ngrams)
    from ..parallel import fan_out
    exploded = fan_out(df).select(F.col(id_col).alias("_doc_id"),
                                  F.explode(sh(F.col(text_col))).alias("s"))
    out = (exploded.join(bench, "s")
           .groupBy("_doc_id", "_bid")
           .agg(F.count("*").cast("long").alias("n_hits"),
                F.first("_nb").cast("long").alias("n_bench_shingles"))
           .filter(F.col("n_hits") >= F.lit(int(min_hits)))
           .withColumn("containment",
                       F.col("n_hits") / F.col("n_bench_shingles")))
    if min_containment is not None:
        out = out.filter(F.col("containment")
                         >= F.lit(float(min_containment)))
    return (out.withColumnRenamed("_doc_id", id_col)
            .withColumnRenamed("_bid", bench_id_col))


def contaminated_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_text_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    broadcast: bool = True,
    ngrams: str = "char",
) -> DataFrame:
    """Just the flagged ids, as a one-column (``id_col``) DataFrame --
    the anti-join input for a drop gate (see ``plans.pipeline``'s
    ``decontaminate_against``).  Small by construction (contamination is
    the exception), so callers can cheaply persist + count it for
    lineage before anti-joining."""
    flags = flag_benchmark_overlap(df, id_col, text_col, benchmark_df,
                                   bench_text_col, k, min_hits, broadcast,
                                   ngrams)
    return flags.filter("contaminated").select(id_col)


def _window_texts(df: DataFrame, id_col: str, text_col: str,
                  window_chars: int, stride: int) -> DataFrame:
    """Explode each doc into overlapping char windows, JVM-side.

    ``(_did, _wtext)`` rows: window starts are ``1, 1+stride, ...`` up to
    ``len - window + 1``, plus that exact tail start (``array_distinct``
    collapses the overlap) so the final characters are always covered by
    one FULL window -- a benchmark quote at the very end of a doc must
    not see only a truncated window.  ``sequence``/``substr`` are
    whole-stage-codegen expressions; no Python runs here, and window text
    is materialized only inside the signature UDF's Arrow batches, never
    shuffled (the banded rows that leave the stage are narrow)."""
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    last = F.greatest(n - F.lit(window_chars) + F.lit(1), F.lit(1))
    starts = F.array_distinct(F.concat(
        F.sequence(F.lit(1), last, F.lit(stride)), F.array(last)))
    return (df.select(F.col(id_col).alias("_did"),
                      F.explode(starts).alias("_pos"),
                      F.col(text_col).alias("_t"))
            .select("_did",
                    F.col("_t").substr(F.col("_pos"),
                                       F.lit(window_chars)).alias("_wtext")))


def flag_benchmark_near_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str | None = None,
    threshold: float = 0.5,
    shingle_k: int = 7,
    n_hashes: int = 128,
    band_threshold: float = 0.25,
    bands: int | None = None,
    window_chars: int = 400,
    stride: int | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """FUZZY decontamination: per-(doc, benchmark-row) shingle
    containment via windowed MinHash-LSH candidates + exact verify.

    Closes the paraphrase hole :func:`flag_benchmark_overlap` documents:
    exact long-gram matching misses a lightly reworded eval row (one
    changed word kills every k-gram crossing it), while SHORT shingles
    (default 7 chars) mostly survive a light paraphrase -- but a short
    gram is too common to probe as a broadcast hash set (most docs share
    many 7-grams with any same-language benchmark, so the "hit stream is
    rare" property that makes the exact probe map-side collapses).  The
    fix is LSH candidate generation first, containment verify second:

    1. each benchmark row is MinHash-signed and banded; the banded rows
       BROADCAST (eval suites are MBs);
    2. each corpus doc explodes into overlapping ``window_chars`` char
       windows (stride default ``window_chars // 4``; see
       :func:`_window_texts`) and each WINDOW is signed with the same
       geometry.  Windows, not whole docs, because LSH banding is
       jaccard-shaped: a short eval row quoted inside a long doc has
       tiny doc-level jaccard no matter how completely it is contained,
       but window-level jaccard ~ ``L / (W + L)``-scaled survival, which
       the band geometry can catch.  An eval row of length
       ``L <= window_chars - stride`` is fully inside at least one
       window;
    3. window bands probe the broadcast bench bands map-side (no corpus
       shuffle); the only shuffled rows are DISTINCT candidate
       ``(doc, bench-row)`` id pairs, rare by construction;
    4. exact verify on candidates only: ``containment =
       |shingles(bench-row) ∩ shingles(doc)| / |shingles(bench-row)|``
       over the FULL doc's shingle set (PaLM-style asymmetric statistic,
       same convention as :func:`benchmark_overlap_report`), keeping
       pairs ``>= threshold``.

    Returns ``(<id_col>, <bench_id_col>, n_hits, n_bench_shingles,
    containment)``.  Recall is the LSH S-curve over window jaccard
    compounded across the covering windows -- for a quote with gram
    survival ``c`` (1.0 = verbatim) in a ``window_chars = 2L`` window,
    window jaccard is roughly ``c / (3 - c)``; size ``bands`` (default:
    ``resolve_bands(band_threshold, n_hashes)``; explicit ``bands=64``
    with 128 hashes = 2-row bands) so that value sits right of the
    S-curve midpoint.  :func:`benchmark_containment_brute` is the
    recall-1 oracle to validate a geometry against on a sample.
    ``id_col``/``bench_id_col`` keys must be unique (shared requirement
    of every keyed operator here)."""
    from .dedup import _banded, make_minhash_udf, resolve_bands

    from ..parallel import fan_out

    bench_text_col = bench_text_col or text_col
    stride = stride or max(window_chars // 4, 1)
    bands = resolve_bands(band_threshold, n_hashes, bands)
    sig = make_minhash_udf(n_hashes, shingle_k)
    shingle = make_shingle_udf(shingle_k)
    df = fan_out(df)  # the window-signature UDF is the dominant cost

    bench = benchmark_df.select(F.col(bench_id_col).alias("_bid"),
                                F.col(bench_text_col).alias("_btext"))
    bench_banded = (_banded(bench.select(F.col("_bid").alias("doc_id"),
                                         sig("_btext").alias("sig")),
                            "doc_id", bands)
                    .withColumnRenamed("doc_id", "_bid"))
    if broadcast:
        bench_banded = F.broadcast(bench_banded)

    windows = _window_texts(df, id_col, text_col, window_chars, stride)
    wbanded = _banded(windows.select(F.col("_did").alias("doc_id"),
                                     sig("_wtext").alias("sig")),
                      "doc_id", bands)
    cand = (wbanded.join(bench_banded, ["band", "band_key"])
            .select(F.col("doc_id").alias("_did"), "_bid")
            .distinct())

    # broadcast the candidate id set: a shuffled semi-join would exchange
    # the O(corpus) (id, text) stream just to keep the rare flagged docs,
    # while candidates are small by construction (and the broadcast hint
    # also sidesteps Spark's zip-partitions assertion when a semi-join
    # build side shares the signature-UDF subtree with its probe side)
    doc_sh = (df.select(F.col(id_col).alias("_did"),
                        F.col(text_col).alias("_t"))
              .join(F.broadcast(cand.select("_did").distinct()),
                    "_did", "left_semi")
              .select("_did", shingle("_t").alias("_dsh")))
    bench_sh = bench.select("_bid", shingle("_btext").alias("_bsh"))
    if broadcast:
        bench_sh = F.broadcast(bench_sh)
    inter = F.size(F.array_intersect("_dsh", "_bsh"))
    return (cand.join(doc_sh, "_did").join(bench_sh, "_bid")
            .select("_did", "_bid",
                    inter.cast("long").alias("n_hits"),
                    F.size("_bsh").cast("long").alias("n_bench_shingles"))
            .withColumn("containment",
                        F.col("n_hits") / F.col("n_bench_shingles"))
            .filter(F.col("containment") >= F.lit(float(threshold)))
            .withColumnRenamed("_did", id_col)
            .withColumnRenamed("_bid", bench_id_col))


def benchmark_containment_brute(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str | None = None,
    threshold: float = 0.5,
    shingle_k: int = 7,
    broadcast: bool = True,
) -> DataFrame:
    """Recall-1 oracle for :func:`flag_benchmark_near_overlap`: the same
    exact-containment verify over EVERY (doc, benchmark-row) pair, no
    candidate generation.  O(|df| x |benchmark|) array intersections --
    fine for tests, geometry validation on a sample, or a small corpus;
    NOT the 100 TB path (that is the windowed-LSH operator).  Same
    output schema and values: on any input where the LSH pass achieves
    full recall the two results are identical."""
    bench_text_col = bench_text_col or text_col
    shingle = make_shingle_udf(shingle_k)
    doc_sh = df.select(F.col(id_col).alias("_did"),
                       shingle(F.col(text_col)).alias("_dsh"))
    bench_sh = benchmark_df.select(
        F.col(bench_id_col).alias("_bid"),
        shingle(F.col(bench_text_col)).alias("_bsh"))
    if broadcast:
        bench_sh = F.broadcast(bench_sh)
    inter = F.size(F.array_intersect("_dsh", "_bsh"))
    return (doc_sh.crossJoin(bench_sh)
            .select("_did", "_bid",
                    inter.cast("long").alias("n_hits"),
                    F.size("_bsh").cast("long").alias("n_bench_shingles"))
            .withColumn("containment",
                        F.col("n_hits") / F.col("n_bench_shingles"))
            .filter(F.col("containment") >= F.lit(float(threshold)))
            .withColumnRenamed("_did", id_col)
            .withColumnRenamed("_bid", bench_id_col))


def make_fuzzy_flag_udf(
    benchmark_df: DataFrame,
    bench_text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 7,
    n_hashes: int = 128,
    band_threshold: float = 0.25,
    bands: int | None = None,
    window_chars: int = 400,
    stride: int | None = None,
    min_hits: int = 1,
):
    """Series[str] -> bool "fuzzy-contaminated" flag, self-contained for
    STREAMING: the whole benchmark side (per-row sorted gram arrays +
    banded window-LSH probe table) is computed ONCE at definition time
    and rides in the UDF closure, so each micro-batch pays pure numpy --
    no join, no state, no shuffle (the stateless pattern of
    ``make_hit_count_udf``, extended to the windowed-LSH + containment
    semantics of :func:`flag_benchmark_near_overlap`).

    Inside the UDF each row explodes into the SAME overlapping char
    windows as the batch operator (:func:`_window_texts` replicated in
    Python: starts ``0, stride, ...`` plus the exact tail start), window
    signatures come from the SAME fixed-seed hash family
    (``dedup._hash_family``), and band membership is equality of the
    same signature slices -- the probe table keys them by a cheap
    integer mix instead of the batch side's md5 string, which can only
    ADD candidates on a key collision, and candidates get the identical
    exact-containment verify, so flag decisions match the batch
    operator's (same recall characteristics, same verify).  Benchmark
    size bound: per-row gram arrays + probe dict, ~tens of MB for an
    eval-suite-sized benchmark -- the same class as a broadcast."""
    import numpy as np

    from .dedup import (
        _batch_shingles, _hash_family, resolve_bands, signature_matrix)

    stride = stride or max(window_chars // 4, 1)
    # same derive-or-validate geometry rule as every batch MinHash
    # operator (bands > n_hashes raises, unsafe explicit bands warn);
    # the default derives from band_threshold exactly like
    # flag_benchmark_near_overlap, so stream and batch share geometry at
    # every n_hashes, not just the 128-hash default
    bands = resolve_bands(band_threshold, n_hashes, bands)
    rows_per_band = n_hashes // bands
    a_f, b_f = _hash_family(n_hashes)
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def _signatures(texts: list[str]) -> np.ndarray:
        return signature_matrix(texts, shingle_k, n_hashes, a_f, b_f)

    def _band_keys(sig: np.ndarray) -> np.ndarray:
        """(n_texts, bands) integer band keys: a multiplicative mix of
        each band's signature slice (equal slices -> equal keys)."""
        n = sig.shape[0]
        keys = np.zeros((n, bands), dtype=np.uint64)
        for j in range(bands):
            acc = np.full(n, np.uint64(j + 1), dtype=np.uint64)
            for r in range(rows_per_band):
                acc = acc * _MIX + sig[:, j * rows_per_band + r]
            keys[:, j] = acc
        return keys

    def _windows(text: str) -> list[str]:
        n = len(text)
        last = max(n - window_chars, 0)
        starts = list(range(0, last + 1, stride))
        if starts[-1] != last:
            starts.append(last)  # exact tail window, like _window_texts
        return [text[p:p + window_chars] for p in starts]

    # ── definition-time benchmark side (bounded, like a broadcast) ──
    btexts = [t if t is not None else ""
              for t in benchmark_df.select(
                  F.col(bench_text_col).alias("t")).toPandas()["t"]]
    # per-band probe tables (sorted key array + aligned id lists): the
    # per-batch probe becomes one vectorized searchsorted per band over
    # ALL windows, instead of windows x bands Python dict lookups
    band_probe: list = []
    bench_grams: list = []
    if btexts:  # an empty benchmark flags nothing
        bvals, bstarts = _batch_shingles(btexts, shingle_k)
        bench_grams = [bvals[s:e]
                       for s, e in zip(bstarts[:-1], bstarts[1:])]
        bkeys = _band_keys(_signatures(btexts))
        for j in range(bands):
            d: dict = {}
            for bid in range(len(btexts)):
                d.setdefault(int(bkeys[bid, j]), []).append(bid)
            ks = np.array(sorted(d), dtype=np.uint64)
            band_probe.append((ks, [d[int(k)] for k in ks]))

    thr = float(threshold)
    mh = int(min_hits)

    @pandas_udf("boolean")
    def fuzzy_contaminated(texts: pd.Series) -> pd.Series:
        tl = texts.fillna("").tolist()
        if not tl:
            return pd.Series([], dtype=bool)
        wtexts, row_of = [], []
        for i, t in enumerate(tl):
            ws = _windows(t)
            wtexts.extend(ws)
            row_of.extend([i] * len(ws))
        wkeys = _band_keys(_signatures(wtexts))
        cands: list[set] = [set() for _ in tl]
        row_of_a = np.asarray(row_of, dtype=np.int64)
        for j, (ks, ids) in enumerate(band_probe):
            if len(ks) == 0:
                continue
            col = wkeys[:, j]
            idx = np.searchsorted(ks, col)
            m = (idx < len(ks)) & (ks[np.minimum(idx, len(ks) - 1)]
                                   == col)
            for w in np.nonzero(m)[0]:  # rare: only matching windows
                cands[row_of_a[w]].update(ids[idx[w]])
        out = np.zeros(len(tl), dtype=bool)
        need = [i for i, c in enumerate(cands) if c]
        if need:
            gvals, gstarts = _batch_shingles([tl[i] for i in need],
                                             shingle_k)
            for pos, i in enumerate(need):
                dg = gvals[gstarts[pos]:gstarts[pos + 1]]
                for bid in cands[i]:
                    bg = bench_grams[bid]
                    if len(bg) == 0:
                        continue
                    hits = len(np.intersect1d(dg, bg, assume_unique=True))
                    if hits >= mh and hits / len(bg) >= thr:
                        out[i] = True
                        break
        return pd.Series(out)

    return fuzzy_contaminated
