#!/usr/bin/env python
"""spark-submit entrypoint: build (or incrementally extend) an inverted
index from a job spec — the reference's `echo '{spec}' | Runner
JDBCImporter` CLI (README.md:20-34), Spark-native.

Usage (the --py-files ship path the north rule requires):

    python scripts/package.py                       # -> dist/elasticsearch_jdbc_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/elasticsearch_jdbc_spark.zip \
        scripts/submit_index_build.py '<json-spec>'   # or spec file path, or - for stdin

Spec shape: see elasticsearch_jdbc_spark.plans.jobspec. The run prints the
committed manifest JSON (lineage + per-phase metrics) to stdout.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "-"
    if arg == "-":
        raw = sys.stdin.read()
    elif os.path.exists(arg):
        with open(arg) as f:
            raw = f.read()
    else:
        raw = arg

    # under spark-submit the session already exists; standalone we build one
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("index-build").getOrCreate()
    try:
        from elasticsearch_jdbc_spark.plans.jobspec import run_import
    except ImportError:
        # local dev convenience: repo root on path when not shipped via zip
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from elasticsearch_jdbc_spark.plans.jobspec import run_import

    manifest = run_import(spark, raw)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
