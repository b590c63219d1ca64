#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north rule:
``spark-submit --py-files`` on a multi-executor cluster).

    spark-submit --py-files dist/document_extractor_spark.zip \\
        scripts/extract_job.py <in_path> <out_path> [--salt-partitions N]

Master/executor topology comes from spark-submit / cluster conf — this
script only declares the job. Prints ONE JSON summary line (docs parsed,
parse failures, bytes in/out, partitions processed/skipped) so schedulers
can scrape run metrics; per-partition lineage lands in
``<out_path>/_manifests/`` for idempotent resume.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_path",
                    help="pages source: a filesystem path (Iceberg-style "
                         "parquet layout) or a catalog table identifier "
                         "(db.pages — binds real Iceberg/Delta when the "
                         "runtime jars are on the cluster)")
    ap.add_argument("out_path")
    ap.add_argument("--salt-partitions", type=int, default=None,
                    help="force a salted pre-extraction repartition "
                         "(skewed/unsplittable source files only; default "
                         "is the narrow zero-shuffle plan)")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("document_extractor_spark.extract")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from document_extractor_spark.pipeline import run_extract_job

    summary = run_extract_job(
        spark, args.in_path, args.out_path,
        num_partitions=args.salt_partitions,
        resume=not args.no_resume,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
