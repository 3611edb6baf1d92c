"""Cluster entry point for the streaming operation-chain pipeline.

Deploy (multi-executor cluster; the sandbox twin is ``local[N]``)::

    cd /root/repo && zip -r /tmp/arion_spark.zip arion_spark
    spark-submit \
      --master <cluster-master> \
      --py-files /tmp/arion_spark.zip \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      --conf spark.sql.streaming.stateStore.providerClass=\
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
      jobs/run_stream.py \
      --spec examples/chain.json \
      --input  <iceberg-table-or-stream-dir> \
      --output <sink-table-dir> \
      --checkpoint <checkpoint-dir> \
      --watermark "1 hour"

The session here sets NO master and no local-only confs — spark-submit
owns cluster sizing, so the same script runs at N and 4N executors
unchanged (the scaling-efficiency contract).  State lives in the
configured state store (RocksDB on clusters); restart with the same
--checkpoint resumes exactly-once.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spec", required=True, help="operation-chain JSON file or inline JSON")
    p.add_argument("--input", required=True, help="replay/stream source directory")
    p.add_argument("--output", required=True, help="MERGE sink table directory")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--watermark", default="1 hour")
    p.add_argument("--session-gap-ms", type=int, default=30 * 60 * 1000)
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument("--once", action="store_true", help="process available data then exit")
    args = p.parse_args(argv)

    from arion_spark.streaming.metrics import ProgressCapture
    from arion_spark.streaming.pipeline import run_stream_pipeline

    spec = args.spec
    if not spec.lstrip().startswith("{"):
        with open(spec) as f:
            spec = f.read()

    spark = (
        SparkSession.builder.appName("arion_spark_stream")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    cap = ProgressCapture()
    spark.streams.addListener(cap)

    # multi-format input: json:/csv:/parquet: scheme or extension
    # resolution (arion_spark.sources) — a JSONL landing zone streams
    # through the same pipeline as the parquet replay
    from arion_spark import sources

    stream = sources.read_transcripts_stream(
        spark, args.input, args.max_files_per_trigger
    )
    query, sink = run_stream_pipeline(
        spark,
        json.loads(spec),
        None,
        args.output,
        args.checkpoint,
        watermark=args.watermark,
        session_gap_ms=args.session_gap_ms,
        max_files_per_trigger=args.max_files_per_trigger,
        stream=stream,
    )

    def stop(*_a):
        query.stop()

    signal.signal(signal.SIGTERM, stop)
    if args.once:
        query.processAllAvailable()
        query.stop()
    else:
        query.awaitTermination()
    print(json.dumps({"progress": cap.summary(), "lineage_batches": len(sink.lineage())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
