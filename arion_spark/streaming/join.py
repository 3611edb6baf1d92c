"""Watermark-bounded stateful stream-stream join: correlate user turns
with the assistant/tool turns that answer them inside the horizon
(north rule; absent from the single-record reference — SURVEY.md §2.5).

Spark's built-in stream-stream interval join keeps both sides in state
until the watermark passes the interval bound, then evicts — the state
size is bounded by (horizon × arrival rate), independent of stream
length.  Hot conversations are pre-spread with a salted repartition so
one conv_id cannot pin the join to a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_response_join(
    stream: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
    responder_roles: tuple[str, ...] = ("assistant", "tool"),
) -> DataFrame:
    """user turn → every responder turn within [u.ts, u.ts + horizon)."""
    users = (
        stream.where(F.col("role") == "user")
        .select(
            F.col("conv_id").alias("u_conv"),
            F.col("turn_idx").alias("u_turn_idx"),
            F.col("ts").alias("u_ts"),
        )
        .withWatermark("u_ts", watermark)
    )
    resp = (
        stream.where(F.col("role").isin(*responder_roles))
        .select(
            F.col("conv_id").alias("r_conv"),
            F.col("turn_idx").alias("r_turn_idx"),
            F.col("role").alias("r_role"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("u_conv") == F.col("r_conv"))
        & (F.col("r_ts") >= F.col("u_ts"))
        & (F.col("r_ts") < F.col("u_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return users.join(resp, cond, "inner").select(
        F.col("u_conv").alias("conv_id"),
        "u_turn_idx",
        "r_turn_idx",
        "r_role",
        "u_ts",
        "r_ts",
        (F.unix_timestamp("r_ts") - F.unix_timestamp("u_ts")).cast("int").alias(
            "latency_s"
        ),
    )


def salt_repartition(stream: DataFrame, buckets: int = 32) -> DataFrame:
    """Spread a hot conv_id over ``buckets`` partitions ahead of stateless
    per-row stages (UDF-heavy normalize etc.).  NOT for keyed state —
    state operators must see one partition per key; use
    salted_windowed_conv_counts for skewed aggregation instead."""
    return stream.repartition(
        F.pmod(
            F.xxhash64("conv_id") * 31 + F.xxhash64("turn_idx"), F.lit(buckets)
        )
    )
