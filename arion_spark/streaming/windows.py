"""Streaming window aggregates: tumbling / sliding / session windows with
watermarks, plus the salted two-stage variant for hot-key skew.

These are thin, *tested* compositions of Spark's built-in event-time
windowing — no custom state.  Each has a batch twin in
arion_spark/queries.py so the DuckDB oracle indirectly checks the
aggregation logic; the streaming tests check watermark/lateness behavior
specifically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_role_counts(
    stream: DataFrame, size: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "role")
        .agg(
            F.count("*").cast("int").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(F.col("w.start").alias("window_start"), "role", "n_turns", "approx_convs")
    )


def sliding_turn_rate(
    stream: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").cast("int").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_turns")
    )


def session_turn_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows per conversation (event-time gap close)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(
            F.count("*").cast("int").alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).cast("int").alias("n_user"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id",
            "n_turns",
            "n_user",
        )
    )


def salted_windowed_conv_counts(
    stream: DataFrame,
    size: str = "1 hour",
    watermark: str = "30 minutes",
    salt_buckets: int = 8,
) -> DataFrame:
    """Hot-conversation-safe windowed aggregation: two stateful stages,
    partial agg on (window, conv_id, salt) then merge on (window, conv_id).

    A conversation receiving a large share of the stream would otherwise
    hammer one state partition; salting spreads the partial aggregation
    across ``salt_buckets`` tasks (north-star skew handling).  Requires
    multiple-stateful-operator support (Spark ≥ 3.4, append mode).
    """
    salt = F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets))
    partial = (
        stream.withWatermark("ts", watermark)
        .withColumn("_salt", salt)
        .groupBy(F.window("ts", size).alias("w"), "conv_id", "_salt")
        .agg(F.count("*").alias("c"))
    )
    return (
        partial.groupBy("w", "conv_id")
        .agg(F.sum("c").cast("int").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "conv_id", "n_turns")
    )
