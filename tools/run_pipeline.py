"""spark-submit entry point for the scrub pipeline.

Deployment shape per the north rule:

    tools/build_pyfiles.sh /tmp/sumi_agent_spark.zip
    spark-submit --master <cluster> --py-files /tmp/sumi_agent_spark.zip \
        tools/run_pipeline.py --input <parquet> --output <dir> [--resume]

The --py-files zip lands on every executor's sys.path, so the pandas UDFs
import the package remotely; no cluster-wide install needed.  All
pipeline-stage flags (dedup, near-dedup, embedding dedup, toxicity,
decontamination) come from the SHARED definition in
``plans.pipeline.add_pipeline_args`` -- this wrapper only owns the
session bootstrap, so the two CLI surfaces cannot drift.
"""

import argparse
import json
import os
import sys

# running the script directly (python tools/run_pipeline.py) puts tools/
# on sys.path, not the repo root; under spark-submit --py-files the zip
# provides the package instead and this insert is a harmless no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    from sumi_agent_spark.plans.pipeline import (
        add_pipeline_args, pipeline_kwargs, run_pipeline)

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False)
    ap.add_argument("--output", required=True)
    ap.add_argument("--generate", type=int, default=0)
    add_pipeline_args(ap)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("sumi-scrub")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
             .getOrCreate())

    if not args.input and not args.generate:
        ap.error("--input or --generate required")
    input_path = args.input
    if args.generate:
        import tempfile

        from sumi_agent_spark.sources.transcripts import write_parquet
        input_path = tempfile.mkdtemp(prefix="sumi_fx_") + "/t.parquet"
        write_parquet(input_path, n_convs=args.generate)
    stats = run_pipeline(spark, input_path, args.output,
                         **pipeline_kwargs(args))
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
