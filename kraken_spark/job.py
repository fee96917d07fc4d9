"""spark-submit entry point for the extraction pipeline.

Packaging (north rule: `spark-submit --py-files` on a multi-executor
cluster):

    cd /root/repo && zip -r /tmp/kraken_spark.zip kraken_spark
    spark-submit --py-files /tmp/kraken_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        kraken_spark/job.py \
        --input  <documents parquet/iceberg path> \
        --output <extractions path> --metrics <metrics path> \
        --run-id run1 [--resume] [--partitions N] [--serialize alto]

The job is idempotent per url: with --resume it anti-joins the committed
output before processing (pipeline.remaining_documents, SURVEY.md §7.4),
so a re-submitted job continues from the last committed snapshot.

On a real cluster, executor env must pin BLAS threads and glibc malloc
thresholds exactly as session.get_spark does locally (see _PIN_ENV there);
the spark-submit conf equivalents are spark.executorEnv.OMP_NUM_THREADS=1
etc. — required for the N->4N scaling behavior measured in BASELINE.md.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kraken_spark extraction job")
    ap.add_argument("--input", required=True, help="documents table path (parquet)")
    ap.add_argument("--output", required=True, help="extractions output path")
    ap.add_argument("--metrics", default=None, help="metrics table path")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true", help="anti-join committed output")
    ap.add_argument(
        "--serialize",
        choices=["alto", "pagexml", "hocr", "json"],
        default=None,
        help="additionally write serialized documents next to the output",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # under spark-submit the session/config comes from the cluster conf;
    # getOrCreate picks it up (session.get_spark is the local/test factory)
    spark = SparkSession.builder.getOrCreate()

    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import (
        plan_extraction,
        remaining_documents,
        run_extraction,
    )

    docs = spark.read.parquet(args.input)
    if args.resume:
        docs = remaining_documents(docs, args.output)
        n = docs.count()
        print(f"[kraken_spark] resume: {n} documents remaining")
        if n == 0:
            return 0
    run_extraction(
        docs,
        out_path=args.output,
        metrics_path=args.metrics,
        run_id=args.run_id,
        num_partitions=args.partitions,
    )
    if args.serialize:
        ext = spark.read.parquet(args.output)
        serialize_extractions(ext, args.serialize).write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}_{args.serialize}"
        )
    done = spark.read.parquet(args.output)
    print(f"[kraken_spark] committed {done.count()} extraction rows -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
