"""Cluster entry point for the streaming corpus-admission pipeline
(quality gate → exact-md5 fast path → LSH/Jaccard near-dup keep-first).

Deploy (multi-executor cluster; the sandbox twin is ``local[N]``)::

    cd /root/repo && zip -r /tmp/arion_spark.zip arion_spark
    spark-submit \
      --master <cluster-master> \
      --py-files /tmp/arion_spark.zip \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      jobs/run_dedup.py \
      --input  <doc-stream-dir> \
      --output <guard-table-dir> \
      --checkpoint <checkpoint-dir> \
      --full-admission \
      --compact-every 200

Same contract as jobs/run_stream.py: no master / local confs here —
spark-submit owns cluster sizing.  The guard keeps all state in its
commit-logged index (no Spark-managed state), so restart with the same
--checkpoint + --output resumes exactly-once.  ``--compact-every N``
folds the index every N committed batches and vacuums — the maintenance
cadence that keeps the per-batch history probe at a bounded file count.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="document stream directory")
    p.add_argument("--output", required=True, help="guard table directory")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument(
        "--full-admission",
        action="store_true",
        help="enable the quality gate and exact-md5 fast path",
    )
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument(
        "--compact-every",
        type=int,
        default=0,
        help="fold the index + vacuum every N committed batches (0 = never)",
    )
    p.add_argument("--once", action="store_true", help="drain available data then exit")
    p.add_argument(
        "--maintain-clusters",
        action="store_true",
        help="also maintain the near-dup cluster map incrementally "
        "(ClusterMaintainer; forces the quality/exact gates OFF — "
        "cluster parity needs every doc indexed)",
    )
    args = p.parse_args(argv)

    from arion_spark.streaming.clusters import ClusterMaintainer
    from arion_spark.streaming.dedup import DedupGuard, read_doc_stream

    spark = (
        SparkSession.builder.appName("arion_spark_dedup")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    if args.maintain_clusters:
        guard = ClusterMaintainer(args.output, args.threshold)
    else:
        guard = DedupGuard(
            args.output,
            args.threshold,
            quality_gate=args.full_admission,
            exact_fast_path=args.full_admission,
        )

    # safe to attach after a bootstrap ingest; epoch-bound to the
    # checkpoint so a recreated checkpoint can't silently re-process
    off = guard.stream_offset(args.checkpoint)

    def handle(batch_df, batch_id):
        guard.process(batch_df, batch_id + off)
        if args.compact_every and (batch_id + 1) % args.compact_every == 0:
            guard.compact(spark)
            guard.vacuum()

    query = (
        read_doc_stream(spark, args.input, args.max_files_per_trigger)
        .writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", args.checkpoint)
        .start()
    )

    def stop(*_a):
        query.stop()

    signal.signal(signal.SIGTERM, stop)
    if args.once:
        query.processAllAvailable()
        query.stop()
    else:
        query.awaitTermination()
    lin = guard.lineage()
    print(
        json.dumps(
            {
                "batches": len(lin),
                "n_in": sum(r["n_in"] for r in lin),
                "n_kept": sum(r["n_kept"] for r in lin),
                "n_dropped": sum(r["n_dropped"] for r in lin),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
