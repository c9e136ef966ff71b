"""spark-submit entry point for the ER pipeline (north rule: the whole job
runs via ``spark-submit --py-files`` on a multi-executor cluster).

Usage:
    python tools/make_pyfiles.py                       # build blink_spark.zip
    spark-submit --py-files blink_spark.zip \
        tools/submit_pipeline.py <documents_parquet> <out_dir> \
        [--no-checkpoints] [--max-block-size N] [--hard-cap N]

In spark-submit mode the session comes from the cluster manager; this script
only declares app-level SQL conf (AQE, Arrow) and never hardcodes a master.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser(description="blink_spark ER pipeline")
    parser.add_argument("documents", help="input documents parquet path")
    parser.add_argument("out_dir", help="output/checkpoint directory")
    parser.add_argument("--no-checkpoints", action="store_true")
    parser.add_argument("--max-block-size", type=int, default=64)
    parser.add_argument("--hard-cap", type=int, default=4096)
    parser.add_argument("--n-salt", type=int, default=8)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("blink_spark_er")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from blink_spark.pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        max_block_size=args.max_block_size,
        hard_cap=args.hard_cap,
        n_salt=args.n_salt,
        checkpoints=not args.no_checkpoints,
    )
    clusters = run_pipeline(spark, args.documents, args.out_dir, config=cfg)
    n = clusters.count()
    print(f"clusters written: {n} rows -> {args.out_dir}/clusters")
    return 0


if __name__ == "__main__":
    sys.exit(main())
