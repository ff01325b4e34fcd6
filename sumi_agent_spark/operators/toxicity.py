"""Toxicity scoring: deterministic lexicon + pattern heuristic (ja/en).

The north rule names a "PII/toxicity-scrub pipeline"; the reference engine
has no toxicity stage, so this is a north-rule addition in the same spirit
as the quality heuristics: deterministic, explainable, JVM-native (pure
``regexp_count`` expressions inside codegen — no Python, SQL-expressible so
the DuckDB oracle runs the identical computation).

Model: two severity tiers of word/phrase patterns (severe = violent /
threatening language, mild = profanity / insults), counted per text with
word boundaries for Latin terms and plain substring semantics for Japanese
terms (Japanese has no word boundaries).  Score =
``min(1, (2*severe + mild) / max(n_nonspace_runs, 4))`` — normalizing by length
so one mild word in a long document stays low while a short abusive
message saturates.

The lexicon is intentionally small, mild, and embedded (no external data);
a production deployment would swap in a curated list or an ML scorer
behind the same column contract.  Scoring is standalone by default; the
pipeline can gate on it pre-scrub via ``run_pipeline(drop_toxic_above=)``
so toxic turns never pay detection cost (same placement as exact dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Latin terms match on word boundaries over lowercased text; Japanese
# terms match as substrings.  (?-i) not needed: caller lowercases.
SEVERE_EN = ["kill yourself", "go die", "i will kill", "deserve to die"]
SEVERE_JA = ["死ね", "殺す", "殺して", "消えろ"]
MILD_EN = ["idiot", "stupid", "moron", "dumbass", "loser", "shut up",
           "pathetic", "trash human", "worthless", "hate you"]
MILD_JA = ["バカ", "馬鹿", "アホ", "クズ", "ゴミ人間", "うざい", "きもい",
           "無能", "カス"]


def _latin_alt(words: list[str]) -> str:
    return r"\b(?:" + "|".join(w.replace(" ", r"\s+") for w in words) + r")\b"


def _ja_alt(words: list[str]) -> str:
    return "(?:" + "|".join(words) + ")"


SEVERE_RE = _latin_alt(SEVERE_EN) + "|" + _ja_alt(SEVERE_JA)
MILD_RE = _latin_alt(MILD_EN) + "|" + _ja_alt(MILD_JA)


def toxicity_score_col(text: Column) -> Column:
    """0..1 toxicity score as a native column expression (codegen).
    NULL text scores 0 (a gate must never silently drop NULL rows)."""
    text = F.coalesce(text, F.lit(""))
    low = F.lower(text)
    severe = F.regexp_count(low, F.lit(SEVERE_RE)).cast("double")
    mild = F.regexp_count(low, F.lit(MILD_RE)).cast("double")
    tokens = F.regexp_count(text, F.lit(r"\S+")).cast("double")
    score = (2.0 * severe + mild) / F.greatest(tokens, F.lit(4.0))
    return F.least(score, F.lit(1.0))


def toxicity_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``toxicity`` (0..1) and the per-tier hit counts."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    return (df
            .withColumn("n_severe",
                        F.regexp_count(low, F.lit(SEVERE_RE)).cast("long"))
            .withColumn("n_mild",
                        F.regexp_count(low, F.lit(MILD_RE)).cast("long"))
            .withColumn("toxicity",
                        F.round(toxicity_score_col(F.col(text_col)), 6)))
