"""Deterministic replay stream source.

The reference is driven by one process invocation per record; the driver
of our streaming engine is a micro-batch replay of a transcript table:
the input is split into K timestamp-ordered parquet chunks and consumed
with ``maxFilesPerTrigger=1`` so every run observes the same micro-batch
boundaries — the determinism the exactly-once tests need.

At production scale the same code points at an Iceberg/Kafka source; the
schema contract is identical (see SKILL note in README §streaming).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arion_spark.transcripts import TRANSCRIPT_SCHEMA


def write_replay_chunks(
    df: DataFrame, out_dir: str, n_chunks: int = 8, files_per_chunk: int = 1
) -> list[str]:
    """Split ``df`` into ``n_chunks`` ts-ordered parquet chunk dirs.

    Chunking is by ts-rank so arrival order ≈ event-time order with the
    controlled out-of-orderness already present in the data (the
    within-watermark jitter the generator plants).

    ``files_per_chunk=1`` (default) gives byte-deterministic micro-batch
    boundaries with ``maxFilesPerTrigger=1`` — what the exactly-once /
    restart tests need.  For THROUGHPUT runs set ``files_per_chunk`` ≈
    cores and ``maxFilesPerTrigger=files_per_chunk``: a single-file
    chunk makes every micro-batch's scan+watermark stage one task — a
    serial stage that caps scaling no matter how many cores the
    stateful stage has (the production source is a many-partition
    Iceberg/Kafka stream, which this models)."""
    ranked = df.withColumn(
        "_chunk",
        F.ntile(n_chunks).over(Window.orderBy("ts", "conv_id", "turn_idx")),
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(1, n_chunks + 1):
        chunk_dir = f"{out_dir}/chunk={i:04d}"
        chunk = ranked.where(F.col("_chunk") == i).drop("_chunk")
        if files_per_chunk == 1:
            chunk = chunk.coalesce(1)
        else:
            chunk = chunk.repartition(files_per_chunk)
        chunk.write.mode("overwrite").parquet(chunk_dir)
        paths.append(chunk_dir)
    return paths


def read_replay_stream(
    spark: SparkSession, replay_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(replay_dir)
    )


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Source-side exactly-once guard: drop duplicate turns within the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state per key
    is evicted once the watermark passes, so unlike ``dropDuplicates``
    the dedup state does NOT grow without bound on an infinite stream).

    This is the first line of defense against at-least-once upstreams
    (Kafka replays, Iceberg re-planned files); the MERGE sink
    (streaming/sink.py) and the stateful operators' stale-replay drops
    stay as the end-to-end guarantees.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
