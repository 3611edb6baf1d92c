"""Multi-resolution time rollup with re-aggregation (hypertable analog).

TimescaleDB-style continuous aggregates keep minute/hour/day rollups
where each coarser grain is computed FROM the next finer aggregate, not
from the raw table.  That is the only shape that survives 100 TB: the
base table is scanned once to build the finest grain (the expensive
shuffle touches raw rows exactly once), and every coarser grain
re-aggregates rows that are already ~10^3-10^4× smaller — in a streaming
deployment the finest grain is the sink of the windowed agg and coarser
grains are cheap follow-up batch queries over it.

Only decomposable aggregates participate (sum↦sum, count↦sum, min↦min,
max↦max); COUNT DISTINCT deliberately does not appear (it is not
re-aggregatable without a sketch — see dedup.py for the exact-count
path, and approx_count_distinct/HLL for the mergeable sketch path).

Reference analog: arion emits per-operation summary blocks that callers
fold into job-level stats (reference: src/arion.cpp:750-834); the rollup
cascade is that fold as a first-class relational operator.

Physical-plan note: the three grains union three copies of the minute
subtree, but Spark's exchange reuse (on by default) collapses them — the
executed plan shows the hour/day branches reading a ``ReusedExchange``
of the minute shuffle, so the raw table is scanned and shuffled exactly
once at runtime (asserted in tests/test_relational_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (grain label, timestamp-truncation unit) — finest first.
GRAINS = (("minute", "minute"), ("hour", "hour"), ("day", "day"))


#: measure column names, in output order
MEASURES = ("n_turns", "n_user_turns", "sum_chars", "max_text_len")


def measure_aggs() -> list:
    """The decomposable finest-grain measures — shared by the batch base
    aggregate and the streaming windowed aggregate
    (streaming/rollup.minute_rollup_stream), so both grains are
    definitionally identical."""
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("bigint")).alias("n_user_turns"),
        F.sum(F.length("text").cast("bigint")).alias("sum_chars"),
        F.max(F.length("text")).alias("max_text_len"),
    ]


def _base(t: DataFrame) -> DataFrame:
    """Finest-grain aggregate: the ONLY pass over raw rows."""
    return t.groupBy(F.date_trunc("minute", "ts").alias("bucket_ts")).agg(
        *measure_aggs()
    )


def _reagg(finer: DataFrame, unit: str) -> DataFrame:
    """Coarser grain FROM the finer aggregate: sums of sums, max of maxes."""
    return (
        finer.groupBy(F.date_trunc(unit, "bucket_ts").alias("bucket_ts"))
        .agg(
            F.sum("n_turns").alias("n_turns"),
            F.sum("n_user_turns").alias("n_user_turns"),
            F.sum("sum_chars").alias("sum_chars"),
            F.max("max_text_len").alias("max_text_len"),
        )
    )


def cascade_from_minute(minute: DataFrame) -> DataFrame:
    """Hour/day grains re-aggregated from an existing minute grain —
    shared by the batch cascade and the streaming continuous aggregate
    (streaming/rollup.py), whose minute table is the MERGE sink of the
    windowed agg."""
    hour = _reagg(minute, "hour")
    day = _reagg(hour, "day")
    out = None
    for label, df in (("minute", minute), ("hour", hour), ("day", day)):
        tagged = df.select(F.lit(label).alias("grain"), "*")
        out = tagged if out is None else out.unionByName(tagged)
    return out


def cascade(t: DataFrame) -> DataFrame:
    """Minute→hour→day cascade as one DataFrame with a ``grain`` column."""
    return cascade_from_minute(_base(t))


def spike_islands(
    m: DataFrame,
    ts_col: str = "bucket_ts",
    n_col: str = "n_turns",
    factor: float = 1.5,
) -> DataFrame:
    """Gaps-and-islands spike intervals FROM a minute grain — one row per
    contiguous run of hot minutes (> ``factor`` × the mean per-minute
    rate): (start, end, spike_turns).

    Shared by the batch query (queries.spike_intervals, whose oracle
    pins the semantics) and the continuous detector
    (streaming/spikes.py), which feeds it the MERGE-sink minute table —
    so streamed and batch island sets are definitionally identical once
    every event is within watermark.  Scale shape: day-partitioned
    island window (no task ever sorts the full minute history), global
    mean via per-day partials, cross-midnight stitch over ISLAND
    SUMMARIES only (two islands inside one day always have a gap, so
    adjacency can only occur at a day boundary)."""
    from pyspark.sql import Window

    m = m.select(
        F.col(ts_col).alias("m"), F.col(n_col).cast("long").alias("n")
    ).withColumn("day", F.date_trunc("day", "m"))
    day_stats = m.groupBy("day").agg(
        F.sum("n").alias("dn"), F.count(F.lit(1)).alias("dc")
    )
    w_all = Window.partitionBy()
    day_avg = day_stats.select(
        "day",
        (F.sum("dn").over(w_all).cast("double") / F.sum("dc").over(w_all)).alias(
            "avg_n"
        ),
    )
    hot = m.join(day_avg, "day").where(
        F.col("n").cast("double") > factor * F.col("avg_n")
    )
    w_day = Window.partitionBy("day").orderBy("m")
    grp = (
        F.col("m").cast("timestamp").cast("long")
        - 60 * F.row_number().over(w_day)
    ).alias("grp")
    day_islands = (
        hot.select("day", "m", "n", grp)
        .groupBy("day", "grp")
        .agg(
            F.min("m").alias("start"),
            (F.max("m") + F.expr("INTERVAL 1 MINUTE")).alias("end"),
            F.sum("n").alias("spike_turns"),
        )
    )
    # cross-midnight stitch over island summaries (tiny by construction)
    w_isl = Window.orderBy("start")
    prev_end = F.lag("end").over(w_isl)
    stitched = day_islands.select("start", "end", "spike_turns").withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (prev_end != F.col("start")), 1).otherwise(0),
    )
    return (
        stitched.withColumn(
            "isl",
            F.sum("new_isl").over(
                w_isl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("isl")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.sum("spike_turns").alias("spike_turns"),
        )
        .drop("isl")
    )
