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
    ap.add_argument("--near-dedup-threshold", type=float, default=None)
    ap.add_argument("--near-dedup-index", default=None)
    ap.add_argument("--near-dedup-scope", default="turn",
                    choices=("turn", "conversation"))
    ap.add_argument("--embedding-dedup-threshold", type=float, default=None)
    ap.add_argument("--embedding-index", default=None)
    ap.add_argument("--embedding-col", default="embedding")
    ap.add_argument("--embedding-n-planes", type=int, default=16)
    ap.add_argument("--drop-toxic-above", type=float, default=None)
    ap.add_argument("--decontaminate-against", default=None)
    ap.add_argument("--decontam-text-col", default="text")
    ap.add_argument("--decontam-k", type=int, default=13)
    ap.add_argument("--decontam-min-hits", type=int, default=1)
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
                         near_dedup_threshold=args.near_dedup_threshold,
                         near_dedup_index_path=args.near_dedup_index,
                         near_dedup_scope=args.near_dedup_scope,
                         embedding_dedup_threshold=(
                             args.embedding_dedup_threshold),
                         embedding_index_path=args.embedding_index,
                         embedding_col=args.embedding_col,
                         embedding_n_planes=args.embedding_n_planes,
                         drop_toxic_above=args.drop_toxic_above,
                         decontaminate_against=args.decontaminate_against,
                         decontam_text_col=args.decontam_text_col,
                         decontam_k=args.decontam_k,
                         decontam_min_hits=args.decontam_min_hits)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
