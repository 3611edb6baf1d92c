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
