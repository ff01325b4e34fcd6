"""Vectorized pandas/Arrow UDFs wrapping the oracle + quality modules.

Per the input-hint contract, there is no per-row *Spark* Python anywhere:
both UDFs are Arrow-batched ``pandas_udf``s.  Inside a batch, the quality
scorer is pure numpy over the concatenated codepoint array; the scrub UDF
necessarily loops over the batch's rows in Python because masking is a
sequential per-document string program (reference semantics:
redaction.ts:41-67 -- later replacements operate on already-masked text),
but every regex is precompiled at import time in executor module scope
(the analog of the reference's module-scope pattern catalog,
detection.ts:34-266).

Config (mask categories, custom keywords, pinned current year, quality
thresholds) is closed over by the UDF factory -- the Spark-idiomatic way to
broadcast small read-only dictionaries to executors.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .oracle import scrub_text
from .quality import DEFAULT_QUALITY_CONFIG, QualityConfig, quality_frame
from .rules import (
    DEFAULT_CURRENT_YEAR,
    DEFAULT_KEEP_PREFECTURE,
    DEFAULT_MASK_CONFIG,
    DEFAULT_NAME_INITIAL,
)

SCRUB_RESULT_TYPE = StructType([
    StructField("masked_text", StringType()),
    StructField("n_detections", IntegerType()),
    StructField("n_regex", IntegerType()),
    StructField("n_dict", IntegerType()),
    StructField("n_heuristic", IntegerType()),
    StructField("n_ai", IntegerType()),
])

# lang/drop_reason cross the Arrow boundary as tiny ints (cheaper columns
# at 10^12-row scale); the pipeline decodes them to strings with a native
# element_at projection (see plans/pipeline.py, codegen'd JVM-side)
LANG_CODES = ["unknown", "ja", "en", "other"]
REASON_CODES = ["", "lang", "too_short", "mojibake", "repetition",
                "symbol_ratio", "perplexity"]
_LANG_ID = {v: i for i, v in enumerate(LANG_CODES)}
_REASON_ID = {v: i for i, v in enumerate(REASON_CODES)}

QUALITY_RESULT_TYPE = StructType([
    StructField("lang_id", ByteType()),
    StructField("nll", DoubleType()),
    StructField("n_chars", IntegerType()),
    StructField("symbol_ratio", DoubleType()),
    StructField("distinct_trigram_ratio", DoubleType()),
    StructField("mojibake", BooleanType()),
    StructField("keep", BooleanType()),
    StructField("reason_id", ByteType()),
])


def make_scrub_udf(
    custom_keywords: Optional[list[str]] = None,
    mask_config: Optional[dict[str, bool]] = None,
    keep_prefecture: bool = DEFAULT_KEEP_PREFECTURE,
    name_initial: bool = DEFAULT_NAME_INITIAL,
    current_year: int = DEFAULT_CURRENT_YEAR,
    ai_caller=None,
    ai_fallback_caller=None,
):
    """Series[str] -> struct(masked_text, n_detections, n_regex, n_dict,
    n_heuristic, n_ai).  Deterministic unless ``ai_caller`` is injected.

    ``ai_caller`` (default None = OFF, the deterministic reference path)
    enables the optional AI-enrichment stage (reference detectWithAI,
    RedactPro.tsx:1715-1722): per row, AI detections are merged into the
    base set with first-wins ``merge_detections`` BEFORE mask config and
    redaction, exactly where the reference merges them.  The callable must
    be picklable (tests inject a deterministic fake; production would close
    over an endpoint client).  AI failures degrade to zero AI detections,
    never an error row."""
    kw = list(custom_keywords) if custom_keywords else None
    cfg = dict(DEFAULT_MASK_CONFIG if mask_config is None else mask_config)

    @pandas_udf(SCRUB_RESULT_TYPE)
    def scrub(texts: pd.Series) -> pd.DataFrame:
        from .batch_detect import detect_all_batch
        from .oracle import apply_mask_config, apply_redaction, merge_detections

        raw = texts.fillna("").tolist()
        all_dets = detect_all_batch(raw, kw, current_year)
        if ai_caller is not None:
            from .ai_detect import detect_with_ai
            all_dets = [
                merge_detections(
                    dets, detect_with_ai(text, ai_caller, ai_fallback_caller)[0])
                for text, dets in zip(raw, all_dets)]
        masked, n_det, n_re, n_di, n_he, n_ai = [], [], [], [], [], []
        for text, dets in zip(raw, all_dets):
            dets = apply_mask_config(dets, cfg)
            m = apply_redaction(text, dets, keep_prefecture, name_initial)
            masked.append(m)
            n_det.append(len(dets))
            n_re.append(sum(1 for d in dets if d.source == "regex"))
            n_di.append(sum(1 for d in dets if d.source == "dict"))
            n_he.append(sum(1 for d in dets if d.source == "heuristic"))
            n_ai.append(sum(1 for d in dets if d.source == "ai"))
        return pd.DataFrame({
            "masked_text": masked,
            "n_detections": pd.array(n_det, dtype="int32"),
            "n_regex": pd.array(n_re, dtype="int32"),
            "n_dict": pd.array(n_di, dtype="int32"),
            "n_heuristic": pd.array(n_he, dtype="int32"),
            "n_ai": pd.array(n_ai, dtype="int32"),
        })

    return scrub


def make_quality_udf(cfg: QualityConfig = DEFAULT_QUALITY_CONFIG):
    """(text, role) -> struct(lang, nll, ..., keep, drop_reason).

    Fully vectorized numpy inside each Arrow batch."""

    @pandas_udf(QUALITY_RESULT_TYPE)
    def quality(texts: pd.Series, roles: pd.Series) -> pd.DataFrame:
        q = quality_frame(texts, roles, cfg)
        return pd.DataFrame({
            "lang_id": q["lang"].map(_LANG_ID).astype("int8"),
            "nll": q["nll"],
            "n_chars": q["n_chars"].astype("int32"),
            "symbol_ratio": q["symbol_ratio"],
            "distinct_trigram_ratio": q["distinct_trigram_ratio"],
            "mojibake": q["mojibake"],
            "keep": q["keep"],
            "reason_id": q["drop_reason"].map(_REASON_ID).astype("int8"),
        })

    return quality
