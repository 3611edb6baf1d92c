"""SparkSession factory with scale-aware defaults.

Local mode is a stand-in for a multi-executor cluster: every conf here is
chosen to also be correct on 1000 executors reading 100 TB (AQE, skew-join
handling, Arrow batches, UTC determinism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Default shuffle parallelism ~= local cores. On a real cluster this is
#: overridden (or left to AQE coalescing) — AQE is on, so an over-provisioned
#: value only costs empty-partition bookkeeping, never a spill.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "arion_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Confs mirror what a cluster deployment sets via spark-submit:
      * AQE + skew-join: runtime re-plan for hot conv_ids at scale.
      * Arrow: all pandas UDF traffic is columnar Arrow batches.
      * UTC session timezone: deterministic timestamps vs external oracles.
      * shuffle.partitions ~ cores here; AQE coalesces at runtime.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Size the heap to the working set, not the machine: an oversized
        # heap (48g was tried) leaves cold pages the host's proactive
        # reclaim (DAMON) takes back, causing intermittent 5-10× job
        # stalls on re-touch; 12g is stable and never spills at bench
        # scale.  Cluster deployments set this via spark-submit.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
