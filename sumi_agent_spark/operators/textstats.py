"""Text-analysis operators over document tables: token counting, BPE-ish
tokenization, document fingerprinting (rolling-hash winnowing), and a
composite quality score.  Everything that can stay JVM-side does (native
``split``/``regexp_count``/``md5`` expressions inside codegen); only the
winnowing fingerprint needs a pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
# punctuation runs (Java regex, used JVM-side via regexp_count)
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish piece count per row, JVM-side.

    Tokens are counted as ``\\S+`` runs: trim+split would miscount text
    bounded by non-space whitespace (``'a b\\n'`` -> 3, ``'\\t'`` -> 2,
    because F.trim strips ASCII spaces only and split keeps boundary
    empties)."""
    ws = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE))
    return (df.withColumn("n_ws_tokens", ws.cast("long"))
              .withColumn("n_bpe_tokens", bpe.cast("long")))


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whole-content fingerprint: md5 of the whitespace-normalized text.
    SQL-expressible, used for exact dedup across formatting variants.
    Normalize FIRST, then trim single-space ends: trimming first left
    boundary tabs/newlines to become trailing spaces, so formatting
    variants of identical content fingerprinted differently."""
    norm = F.regexp_replace(F.col(text_col), r"\s+", " ")
    return df.withColumn(
        "fingerprint", F.md5(F.regexp_replace(norm, r"^ | $", "")))


def make_winnow_udf(k: int = 8, window: int = 4):
    """Winnowing fingerprints (Schleimer et al.): k-gram rolling hashes,
    keep each window's minimum -> array<long> of selected hashes.  The
    standard local-document fingerprint for near-dup/plagiarism detection."""

    @pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            cps = np.frombuffer(t.lower().encode("utf-32-le"),
                                dtype=np.uint32).astype(np.uint64)
            if len(cps) < k:
                out.append([])
                continue
            base = np.uint64(1000003)
            acc = np.zeros(len(cps) - k + 1, dtype=np.uint64)
            for i in range(k):
                acc = acc * base + cps[i:i + len(acc)]
            h = acc & np.uint64((1 << 61) - 1)
            if len(h) <= window:
                sel = np.array([h.min()])
            else:
                wins = np.lib.stride_tricks.sliding_window_view(h, window)
                sel = np.unique(wins.min(axis=1))
            out.append(np.sort(sel).astype(np.int64).tolist())
        return pd.Series(out)

    return winnow


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score from cheap JVM-side ratios: length,
    alpha ratio, stopword-ish density, mean word length sanity."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z぀-ゟ゠-ヿ一-鿿]", "")) / safe_n
    digits = F.length(F.regexp_replace(t, r"[^0-9]", "")) / safe_n
    ws_tokens = F.regexp_count(t, F.lit(r"\S+")).cast("double")
    mean_wlen = n / F.greatest(ws_tokens, F.lit(1.0))
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 2) & (mean_wlen <= 12), F.lit(1.0)) \
        .otherwise(F.lit(0.3))
    score = (F.lit(0.4) * len_score + F.lit(0.4) * alpha
             + F.lit(0.2) * wlen_score - F.lit(0.2) * digits)
    return df.withColumn(
        "quality_score", F.round(F.greatest(F.least(score, F.lit(1.0)),
                                            F.lit(0.0)), 6))
