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
    """One-row DataFrame: n_turns, tp/fp/fn, keep_f1, n_exact, exact_rate,
    n_missing (expected keys absent from the output -- dropped rows) and
    n_extra (output keys absent from expected -- duplicated/fabricated rows).

    The join is FULL OUTER on (conv_id, turn_idx): an inner join would hide
    rows the pipeline silently lost or duplicated, letting exact_rate read
    1.0 over a lossy output.  ``expected`` needs (conv_id, turn_idx, keep,
    masked_text)."""
    exp = expected.select(
        "conv_id", "turn_idx",
        F.col("keep").alias("exp_keep"),
        F.col("masked_text").alias("exp_masked"),
        F.lit(True).alias("_in_exp"))
    got = scrubbed.select(
        "conv_id", "turn_idx",
        F.col("keep").alias("got_keep"),
        F.col("masked_text").alias("got_masked"),
        F.lit(True).alias("_in_got"))
    joined = got.join(exp, ["conv_id", "turn_idx"], "full")
    # presence markers (not payload nullness: a matched row may carry NULLs)
    in_got = F.coalesce(F.col("_in_got"), F.lit(False))
    in_exp = F.coalesce(F.col("_in_exp"), F.lit(False))
    matched = in_got & in_exp
    agg = joined.agg(
        F.sum(matched.cast("long")).alias("n_turns"),
        F.sum((in_exp & ~in_got).cast("long")).alias("n_missing"),
        F.sum((in_got & ~in_exp).cast("long")).alias("n_extra"),
        F.sum((matched & F.col("got_keep") & F.col("exp_keep")).cast("long"))
         .alias("tp"),
        F.sum((matched & F.col("got_keep") & ~F.col("exp_keep")).cast("long"))
         .alias("fp"),
        F.sum((matched & ~F.col("got_keep") & F.col("exp_keep")).cast("long"))
         .alias("fn"),
        F.sum((matched & (F.col("got_masked").eqNullSafe(F.col("exp_masked"))))
              .cast("long")).alias("n_exact"),
    )
    return agg.select(
        "n_turns", "n_missing", "n_extra", "tp", "fp", "fn",
        F.round(2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
                6).alias("keep_f1"),
        "n_exact",
        F.round(F.col("n_exact") / F.col("n_turns"), 6).alias("exact_rate"),
    )


# NOTE: expected labels must come from the PURE per-row oracle (see main()
# below, --n-convs path), never from scrub_transcripts itself -- comparing
# the pipeline to its own output would be vacuously perfect.


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
    assert row["n_missing"] == 0, "pipeline dropped rows present in expected"
    assert row["n_extra"] == 0, "pipeline emitted rows absent from expected"
    assert row["keep_f1"] >= 0.99, "keep/drop F1 below acceptance threshold"
    assert row["exact_rate"] == 1.0, "masked text not byte-exact"


if __name__ == "__main__":
    main()
