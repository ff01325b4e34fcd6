"""spark-submit entry point for the scrub pipeline.

Deployment shape per the north rule:

    tools/build_pyfiles.sh /tmp/sumi_agent_spark.zip
    spark-submit --master <cluster> --py-files /tmp/sumi_agent_spark.zip \
        tools/run_pipeline.py --input <parquet> --output <dir> [--resume]

The --py-files zip lands on every executor's sys.path, so the pandas UDFs
import the package remotely; no cluster-wide install needed.
"""

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False)
    ap.add_argument("--output", required=True)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--drop-toxic-above", type=float, default=None)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("sumi-scrub")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
             .getOrCreate())

    from sumi_agent_spark.plans.pipeline import run_pipeline

    if not args.input and not args.generate:
        ap.error("--input or --generate required")
    input_path = args.input
    if args.generate:
        import tempfile

        from sumi_agent_spark.sources.transcripts import write_parquet
        input_path = tempfile.mkdtemp(prefix="sumi_fx_") + "/t.parquet"
        write_parquet(input_path, n_convs=args.generate)
    stats = run_pipeline(spark, input_path, args.output, resume=args.resume,
                         dedup=args.dedup,
                         drop_toxic_above=args.drop_toxic_above)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
