"""Cluster entry point for a batch operation-chain run.

    spark-submit --master <cluster-master> --py-files /tmp/arion_spark.zip \
      jobs/run_batch.py --spec examples/chain.json \
      --input <table-dir> --output <result-dir>

Same spec → same result schema as the streaming pipeline (batch↔stream
parity is the oracle-tested contract); use for backfills over historical
partitions of the transcript table.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spec", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from arion_spark.plans.compiler import run_pipeline

    spec = args.spec
    if not spec.lstrip().startswith("{"):
        with open(spec) as f:
            spec = f.read()

    spark = (
        SparkSession.builder.appName("arion_spark_batch")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # multi-format input (json:/csv:/parquet: scheme or extension)
    from arion_spark import sources

    df = sources.read_transcripts(spark, args.input)
    out = run_pipeline(spark, json.loads(spec), df)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"rows": n, "output": args.output}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
