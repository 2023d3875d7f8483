"""spark-submit entry point for the index build (north rule: 'runs via
spark-submit --py-files on multi-executor clusters').

Usage:
    python scripts/package.py                       # → dist/noise_spark.zip
    spark-submit --py-files dist/noise_spark.zip \\
        scripts/submit_build.py \\
        --input  /path/to/pages_parquet \\
        --output /path/to/index \\
        [--analyzer porter] [--block-size 128] [--postings-per-salt 50000]

On a cluster the same invocation plus --master/--num-executors does the
4N-vs-N scaling run the rule describes; in the sandbox the identical
job is exercised at local[2]/local[8] by scripts/scaling_bench.py.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--analyzer", default="porter")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--postings-per-salt", type=int, default=50_000)
    ap.add_argument("--doc-id-col", default=None)
    args = ap.parse_args()

    # under spark-submit the session (master, executors, confs) comes
    # from the submit command line; we only attach to it
    spark = SparkSession.builder.appName("noise_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from noise_spark.index.build import BuildConfig, build_index

    pages = spark.read.parquet(args.input)
    t0 = time.time()
    metrics = build_index(
        spark,
        pages,
        args.output,
        BuildConfig(
            analyzer=args.analyzer,
            block_size=args.block_size,
            postings_per_salt=args.postings_per_salt,
            doc_id_col=args.doc_id_col,
        ),
    )
    wall = time.time() - t0
    print(json.dumps({"wall_sec": round(wall, 2), "n_docs": metrics.get("n_docs"), "stages": {k: v.get("seconds") for k, v in metrics["stages"].items()}}))


if __name__ == "__main__":
    main()
