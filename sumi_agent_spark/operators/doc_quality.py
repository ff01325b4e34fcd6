"""Gopher/C4 document-quality heuristics and corpus-level line dedup.

Reference anchor: the reference's quality screens are per-file density /
sparseness checks (``src/app/RedactPro.tsx:1124-1539``, re-expressed in
``functions/quality.py``) plus the Gopher *repetition* battery
(``operators/repetition.py``).  This module adds the remaining two rule
families every web-scale quality-filter pipeline carries, and the one
corpus-level text transform:

* **Gopher quality rules** (Rae et al. 2021, Table A1, non-repetition
  side): word count bounds, mean word length bounds, ``#``/ellipsis
  symbol-to-word ratios, bullet- and ellipsis-line fractions, the
  alphabetic-word fraction, and the famous >= 2-of-8 English stopword
  check.  All eight metrics are ROW-LOCAL column expressions -- one
  select, zero shuffles, zero UDFs; the filter is a single codegen'd
  ``WHERE``.  (Contrast the repetition battery, which genuinely needs
  per-doc unit counting and one groupBy per gram size.)
* **C4 heuristics** (Raffel et al. 2020, the ``c4.py`` cleaning pass):
  keep lines that end in terminal punctuation, have >= 5 words, don't
  contain ``javascript`` or a cookie/terms-of-use policy phrase; drop
  documents with fewer than 3 sentences, a ``{``, or ``lorem ipsum``.
  The line verdicts and the document rebuild are again row-local
  (``filter`` over the split array + ``array_join``) -- no shuffle.
  C4's bad-words list is deliberately NOT duplicated here: the
  toxicity scorer (``operators/toxicity.py``) is this repo's analog.
* **Corpus-level line dedup** (the CCNet move: drop duplicated
  paragraphs/lines ACROSS documents, keeping one global first
  occurrence).  This is the one operator here that must shuffle -- it
  is a word-count-shaped aggregation over exploded lines plus one
  join back, detailed at :func:`corpus_line_dedup`.

Determinism contract (shared with the classifier / repetition twins):
tokens split on the explicit ASCII class ``[ \\t\\n\\r\\f\\x0B]+``
(U+3000 must NOT split; Java reads ``\\v`` as a class), lowercasing for
stopword / substring matching is ASCII-only ``translate`` (JVM vs
utf8proc disagree on U+0130), fractions are one division of exact
integer counters rounded to 6 places, and tie-breaks compare in binary
collation -- so a DuckDB auditor recomputes every value hash-exact.

``\\p{L}`` (any Unicode letter) is used for the alphabetic-word check:
Java regex and RE2 both implement the Unicode ``L`` category and agree
on all assigned codepoints in practice (the category predates both
engines' minimum Unicode versions for the scripts this corpus carries).
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality_classifier import TOKEN_WS_CLASS, token_col

_ASCII_UPPER = string.ascii_uppercase
_ASCII_LOWER = string.ascii_lowercase

#: Gopher's 8-stopword list (Rae et al. 2021 A1.1): a document must
#: contain at least two of these to pass the stopword rule.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")

#: Bullet glyphs for the bullet-line rule: the common typographic
#: bullets plus the ASCII markdown markers.  A line is a bullet line
#: when its first non-(space|tab) character is one of these.  The
#: hyphen stays LAST so the character class ``[{BULLET_CHARS}]`` reads
#: it as a literal, not a range.
BULLET_CHARS = "•‣▪◦*-"

#: Gopher Table A1 quality rules as ``metric -> (min, max)`` (``None``
#: = unbounded on that side).  A document breaching ANY rule is
#: dropped.  NOTE: the stopword and alpha rules are English-centric by
#: construction -- for the ja/en transcript corpus, gate only the
#: metrics that apply (pass a custom dict) or run after a language
#: split.
GOPHER_QUALITY_RULES: dict[str, tuple[float | None, float | None]] = {
    "word_count": (50, 100_000),
    "mean_word_len": (3.0, 10.0),
    "hash_word_ratio": (None, 0.1),
    "ellipsis_word_ratio": (None, 0.1),
    "bullet_line_frac": (None, 0.90),
    "ellipsis_line_frac": (None, 0.30),
    "alpha_word_frac": (0.80, None),
    "stop_word_count": (2, None),
}

GOPHER_QUALITY_METRICS = tuple(GOPHER_QUALITY_RULES)

#: Shared line regexes, interpolated verbatim into the DuckDB twins.
#: End-of-string anchors are ``\z``, NOT ``$``: Java's default ``$``
#: also matches just before a FINAL line terminator (so a CRLF line
#: split on ``\n`` -- leaving a trailing ``\r`` -- would count on the
#: Spark side only), while ``\z`` means end-of-input identically in
#: Java regex and RE2.  ``^`` is safe (both engines: start-of-input
#: without MULTILINE).
BULLET_LINE_RE = f"^[ \t]*[{BULLET_CHARS}]"
ELLIPSIS_END_RE = r"(\.\.\.|…)[ \t]*\z"


def _substr_count(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal ``needle`` --
    implemented as a length delta over ``replace`` (left-to-right
    non-overlapping in Spark, DuckDB and Python alike) so the twin
    can recompute it without regex-escaping worries."""
    return ((F.length(text)
             - F.length(F.replace(text, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))).cast("long")


def _nonempty_lines(text: Column) -> Column:
    """``array<string>`` of the text's non-empty lines (split on
    ``\\n``; empties dropped -- line-FRACTION rules count only lines
    that exist as content)."""
    return F.filter(F.split(F.coalesce(text, F.lit("")), "\n", -1),
                    lambda ln: ln != F.lit(""))


def _frac(num: Column, den: Column) -> Column:
    """``num / den`` as double rounded to 6 places, 0.0 when the
    denominator is 0 -- the shared exact-counters-one-division shape
    every live twin relies on."""
    return F.round(F.when(den > 0, num.cast("double")
                          / den.cast("double")).otherwise(F.lit(0.0)), 6)


def gopher_quality_cols(text: Column) -> dict[str, Column]:
    """The eight Gopher quality metrics as row-local column
    expressions over ``text`` (see module docstring for definitions).
    Zero shuffles, zero UDFs -- usable directly inside a ``select`` or
    a ``filter``."""
    toks = token_col(text)  # ASCII-lowercased, explicit-ws split
    n_words = F.size(toks)
    raw = F.coalesce(text, F.lit(""))
    lines = _nonempty_lines(text)
    n_lines = F.size(lines)
    is_alpha = lambda w: w.rlike(r"\p{L}")  # noqa: E731
    return {
        "word_count": n_words.cast("long"),
        "mean_word_len": _frac(
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w)), n_words),
        "hash_word_ratio": _frac(_substr_count(raw, "#"), n_words),
        "ellipsis_word_ratio": _frac(
            _substr_count(raw, "...") + _substr_count(raw, "…"),
            n_words),
        "bullet_line_frac": _frac(
            F.size(F.filter(lines,
                            lambda ln: ln.rlike(BULLET_LINE_RE))),
            n_lines),
        "ellipsis_line_frac": _frac(
            F.size(F.filter(lines,
                            lambda ln: ln.rlike(ELLIPSIS_END_RE))),
            n_lines),
        "alpha_word_frac": _frac(F.size(F.filter(toks, is_alpha)),
                                 n_words),
        "stop_word_count": F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS])))
        .cast("long"),
    }


def gopher_quality_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """One row per input row: ``id_cols`` + the eight Gopher quality
    metrics.  Pure projection -- the plan contains no Exchange."""
    id_cols = list(id_cols) if id_cols is not None else ["doc_id"]
    cols = gopher_quality_cols(F.col(text_col))
    return df.select(*id_cols,
                     *[c.alias(name) for name, c in cols.items()])


def validate_gopher_quality_rules(
    rules: dict[str, tuple[float | None, float | None]] | str | None,
) -> dict[str, tuple[float | None, float | None]]:
    if rules is None or rules == "gopher":
        return dict(GOPHER_QUALITY_RULES)
    if not isinstance(rules, dict) or not rules:
        raise ValueError("rules must be the literal 'gopher' or a "
                         f"non-empty metric->(min,max) dict, got {rules!r}")
    bad = set(rules) - set(GOPHER_QUALITY_METRICS)
    if bad:
        raise ValueError(f"unknown gopher quality metrics: {sorted(bad)}; "
                         f"known: {list(GOPHER_QUALITY_METRICS)}")
    out = {}
    for k, v in rules.items():
        if (not isinstance(v, (tuple, list)) or len(v) != 2
                or all(b is None for b in v)):
            raise ValueError(
                f"rule {k!r} must be a (min, max) pair with at least one "
                f"bound, got {v!r}")
        lo = None if v[0] is None else float(v[0])
        hi = None if v[1] is None else float(v[1])
        if lo is not None and hi is not None and lo > hi:
            raise ValueError(
                f"rule {k!r} has min > max ({lo} > {hi}) -- the gate "
                "would be unsatisfiable and silently drop every row")
        out[k] = (lo, hi)
    return out


def gopher_quality_keep_condition(
    text: Column,
    rules: dict[str, tuple[float | None, float | None]] | str | None
    = None,
) -> Column:
    """Boolean keep column: ``text`` passes every bound in ``rules``
    (default: the full Gopher catalog).  Row-local -- compose it into
    any ``filter``."""
    rules = validate_gopher_quality_rules(rules)
    cols = gopher_quality_cols(text)
    cond = F.lit(True)
    for metric, (lo, hi) in rules.items():
        if lo is not None:
            cond = cond & (cols[metric] >= F.lit(lo))
        if hi is not None:
            cond = cond & (cols[metric] <= F.lit(hi))
    return cond


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    rules: dict[str, tuple[float | None, float | None]] | str | None
    = None,
) -> DataFrame:
    """``df`` minus rows breaching any Gopher quality rule.  One
    codegen'd filter; no shuffle, no join -- the cheapest gate in the
    battery, so pipelines should run it before the aggregation-shaped
    ones (repetition, classifier)."""
    return df.filter(gopher_quality_keep_condition(F.col(text_col),
                                                   rules))


# ---------------------------------------------------------------------------
# C4 (Raffel et al. 2020) cleaning heuristics


#: A kept line must end with one of these (C4's ``_END_MARKS``); a
#: line ending in an ellipsis is dropped even though it ends in ``.``.
C4_END_MARKS = (".", "!", "?", '"')

#: Lines containing any of these (ASCII-lowercased substring match)
#: are dropped -- C4's ``javascript`` rule plus its cookie/policy
#: phrases.
C4_BAD_LINE_SUBSTRINGS = (
    "javascript",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)

#: Documents containing any of these (first entry lowercased-substring,
#: second raw) are dropped entirely.
C4_LOREM = "lorem ipsum"
C4_BRACE = "{"

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3

# a sentence ends at . ! or ? optionally followed by a closing quote,
# then ASCII whitespace or end-of-string -- a deterministic stand-in
# for C4's NLTK sentence splitter that both engines count identically.
# Raw string: the escapes reach Java regex and RE2 verbatim (same
# convention as TOKEN_WS_CLASS); end-of-string is \z, not $, for the
# same Java-final-terminator reason as ELLIPSIS_END_RE.
SENTENCE_END_RE = r"""[.!?]["']?([ \t\n\r\f\x0B]|\z)"""


def _ascii_lower(c: Column) -> Column:
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


def c4_line_keep_expr(line: Column,
                      min_words: int = C4_MIN_WORDS_PER_LINE) -> Column:
    """C4's per-line verdict: ends in terminal punctuation (not an
    ellipsis), has at least ``min_words`` whitespace words, and
    contains no bad substring."""
    low = _ascii_lower(line)
    ends_ok = F.lit(False)
    for m in C4_END_MARKS:
        ends_ok = ends_ok | line.endswith(F.lit(m))
    ends_ok = ends_ok & ~line.rlike(r"(\.\.\.|…)\z")
    n_words = F.size(F.filter(F.split(line, TOKEN_WS_CLASS),
                              lambda t: t != F.lit("")))
    bad = F.lit(False)
    for s in C4_BAD_LINE_SUBSTRINGS:
        bad = bad | low.contains(F.lit(s))
    return ends_ok & (n_words >= F.lit(int(min_words))) & ~bad


def _c4_exprs(text_col: str, min_words_per_line: int,
              min_sentences: int) -> dict[str, Column]:
    """The C4 column expressions, built ONCE for both :func:`c4_stats`
    and :func:`c4_clean` so their verdicts can never diverge."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = _nonempty_lines(F.col(text_col))
    kept = F.filter(lines,
                    lambda ln: c4_line_keep_expr(ln, min_words_per_line))
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(
        clean, F.lit(SENTENCE_END_RE), F.lit(0))).cast("long")
    keep = (~_ascii_lower(raw).contains(F.lit(C4_LOREM))
            & ~raw.contains(F.lit(C4_BRACE))
            & (n_sent >= F.lit(int(min_sentences))))
    return {"lines": lines, "kept": kept, "clean": clean,
            "n_sentences": n_sent, "keep": keep}


def c4_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """Per-document C4 verdicts: ``n_lines`` (non-empty),
    ``n_kept_lines``, the rebuilt ``clean_text`` (kept lines joined
    with ``\\n``), ``n_sentences`` (sentence-terminator count over the
    KEPT text), and the document verdict ``c4_keep`` (enough
    sentences, no ``lorem ipsum``, no ``{`` -- evaluated on the RAW
    text, as C4 does).  Entirely row-local: no shuffle."""
    id_cols = list(id_cols) if id_cols is not None else ["doc_id"]
    e = _c4_exprs(text_col, min_words_per_line, min_sentences)
    return df.select(
        *id_cols,
        F.size(e["lines"]).cast("long").alias("n_lines"),
        F.size(e["kept"]).cast("long").alias("n_kept_lines"),
        e["clean"].alias("clean_text"),
        e["n_sentences"].alias("n_sentences"),
        e["keep"].alias("c4_keep"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """C4's cleaning pass as a transform: rebuild ``text_col`` from the
    kept lines and drop documents failing the document rules.  All
    other columns pass through unchanged.  Row-local; no shuffle.
    The verdict and rebuild are the SAME expressions :func:`c4_stats`
    reports (one shared builder)."""
    e = _c4_exprs(text_col, min_words_per_line, min_sentences)
    return df.filter(e["keep"]).withColumn(text_col, e["clean"])


# ---------------------------------------------------------------------------
# Corpus-level line dedup (CCNet-style cross-document duplicate removal)


#: Paragraph split for :func:`corpus_line_dedup`'s paragraph mode --
#: a run of 2+ newlines, same definition the repetition battery uses.
PARA_SPLIT_RE = r"\n{2,}"


def ccnet_normalize_expr(c: Column) -> Column:
    """CCNet's dedup normalization, restricted to cross-engine-exact
    pieces: ASCII lowercase (translate -- full Unicode lowercase
    differs between engines), strip ASCII digits and punctuation,
    collapse whitespace runs to one space, trim.  CCNet additionally
    strips accents and Unicode punctuation; those depend on the
    engine's Unicode tables and are deliberately left out so a DuckDB
    auditor reproduces the key byte-exactly."""
    low = F.translate(c, _ASCII_UPPER, _ASCII_LOWER)
    stripped = F.translate(low, string.digits + string.punctuation, "")
    return F.trim(F.regexp_replace(stripped, TOKEN_WS_CLASS, " "))


def corpus_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    min_chars: int = 1,
    unit: str = "line",
    normalize: bool = False,
) -> DataFrame:
    """Remove CORPUS-WIDE duplicate lines or paragraphs, keeping one
    global first occurrence (CCNet's cross-shard dedup): any unit
    whose dedup key appears elsewhere in the corpus survives only at
    the smallest ``(id_cols..., unit_idx)`` position.

    ``unit``: ``"line"`` splits on single newlines and the rebuild is
    byte-identical to the input when nothing was dropped;
    ``"paragraph"`` splits on runs of 2+ newlines and rebuilds with
    the canonical ``\\n\\n`` separator (the run lengths are not
    recoverable -- the same canonicalization CCNet applies).

    ``normalize=True`` deduplicates on :func:`ccnet_normalize_expr`
    of the unit (case/digit/punctuation/whitespace-insensitive, the
    CCNet recipe) while preserving the RAW unit text in the output;
    the default deduplicates on exact unit text.

    Units whose dedup key has fewer than ``min_chars`` non-whitespace
    characters never participate (whitespace-only / empty units are
    structure, not content -- deduping them would splice unrelated
    paragraphs together) and are preserved verbatim.

    ``id_cols`` (default ``["doc_id"]``) must UNIQUELY key the input
    rows -- the keep-first order is ``struct(id_cols..., unit_idx)``
    compared lexicographically, so duplicate keys would make the
    winner partitioning-dependent (same documented requirement as the
    sampling/index operators).

    Returns ``id_cols`` + ``text_col`` (rebuilt from surviving units)
    + ``n_units`` + ``n_dropped_units``.

    Scale shape (the one operator in this module that shuffles, and
    the canonical shape for it): ``posexplode`` units ->
    ``groupBy(key)`` with a map-side-combinable ``min(struct(...))``
    (one shuffle of ``(key, winner-key)`` pairs -- a word count) ->
    one hash join back on the key (the exploded side shuffles once; a
    hot boilerplate unit is N:1 against a single winner row, which
    AQE skew-join splits) -> ``groupBy(id)`` rebuild (one shuffle of
    the surviving units, keyed by document -- no hot reducer beyond a
    document's own rows).  No windows over the corpus, no driver
    collects, no UDFs.
    """
    lines, sep = unit_frame(df, text_col, id_cols, min_chars, unit,
                            normalize)
    id_cols = list(id_cols) if id_cols is not None else ["doc_id"]
    joined = lines.join(dup_unit_winners(lines.filter("_p")),
                        "_key", "left")
    keep = (~F.col("_p")) | F.col("_win").isNull() \
        | (F.col("_ok") == F.col("_win"))
    flagged = joined.withColumn("_keep", keep)
    return rebuild_units(flagged, id_cols, text_col, sep)


def dup_unit_winners(candidates: DataFrame) -> DataFrame:
    """Keep-first winner per DUPLICATED unit key over a unit frame
    subset: ``(_key, _win)`` where ``_win`` is the smallest ``_ok``
    among the key's occurrences -- only for keys occurring >= 2 times.
    Unique units (the overwhelming majority) never consult the join;
    non-winner occurrences are identified by ``_ok != _win``.  ONE
    implementation shared by the batch operator and the incremental
    index so their keep-first decisions cannot drift (the parity test
    depends on it)."""
    return (candidates.groupBy("_key")
            .agg(F.min("_ok").alias("_win"),
                 F.count("*").alias("_n_occ"))
            .filter(F.col("_n_occ") >= 2).drop("_n_occ"))


def unit_frame(
    df: DataFrame,
    text_col: str,
    id_cols: list[str] | None,
    min_chars: int,
    unit: str,
    normalize: bool,
) -> tuple[DataFrame, str]:
    """The exploded unit frame shared by :func:`corpus_line_dedup` and
    the incremental line index: one row per split unit with ``_idx``
    (position), ``_line`` (raw text), ``_key`` (dedup key -- normalized
    when requested), ``_ok`` (the keep-first order struct) and ``_p``
    (participates).  Returns ``(frame, rejoin_separator)``."""
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    if unit not in ("line", "paragraph"):
        raise ValueError(f"unit must be 'line' or 'paragraph', "
                         f"got {unit!r}")
    split_re, sep = (("\n", "\n") if unit == "line"
                     else (PARA_SPLIT_RE, "\n\n"))
    id_cols = list(id_cols) if id_cols is not None else ["doc_id"]
    lines = df.select(
        *id_cols,
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             split_re, -1)).alias("_idx", "_line"))
    key = (ccnet_normalize_expr(F.col("_line")) if normalize
           else F.col("_line"))
    ord_key = F.struct(*[F.col(c) for c in id_cols], F.col("_idx"))
    lines = lines.withColumn("_key", key).withColumn("_ok", ord_key)
    participates = (F.length(F.regexp_replace(
        F.col("_key"), TOKEN_WS_CLASS, "")) >= F.lit(int(min_chars)))
    return lines.withColumn("_p", participates), sep


def rebuild_units(
    flagged: DataFrame,
    id_cols: list[str],
    text_col: str,
    sep: str,
    drop_counts: dict[str, Column] | None = None,
) -> DataFrame:
    """Rebuild per-doc text from a unit frame carrying a boolean
    ``_keep``: surviving units re-joined by ``sep`` in ``_idx`` order,
    plus ``n_units`` and ``n_dropped_units``.  ``drop_counts`` adds
    named counters (``name -> row condition``) for callers that
    distinguish drop reasons."""
    extra = [F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(n)
             for n, cond in (drop_counts or {}).items()]
    return (flagged.groupBy(*id_cols)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.when(
                             F.col("_keep"),
                             F.struct(F.col("_idx"), F.col("_line"))))),
                         lambda s: s["_line"]),
                     sep).alias(text_col),
                 F.count("*").alias("n_units"),
                 F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
                 .cast("long").alias("n_dropped_units"),
                 *extra))
