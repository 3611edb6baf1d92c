"""Skew-defusing equi-join: salted fact×dim join for hot keys.

Skew taxonomy this engine applies at 100 TB (measured in
``tools/bench_skew.py``, numbers in BASELINE.md):

* **Algebraic aggregates** (count/sum/max — ``q_salted_conv_stats`` and
  the rollup measures) are already skew-immune: Spark's partial
  HashAggregate combines map-side, so the hot key's reduce task receives
  one partial per map task, not the raw rows.  Salting an algebraic agg
  buys ~nothing; the bench proves this too.
* **Holistic aggregates** (exact ``percentile``, ``collect_list``) ship
  every raw value of the hot key to one task.  The scalable replacement
  is not salting — it is the mergeable sketch
  (``functions/sketch.histogram_quantiles``), which turns the holistic
  agg back into an algebraic one.
* **Shuffle equi-joins** carry raw fact rows keyed on the join key; a
  hot key pins its entire fact volume to a single task.  Broadcast is
  the first fix, but a per-conversation dim at 100 TB (billions of
  conversations) exceeds any broadcast threshold — then this operator
  applies: replicate the dim row ``buckets`` ways and spread the fact
  side with a deterministic per-row salt, so the hot key fans out over
  ``buckets`` tasks.  AQE's skew-join handles the same case adaptively
  when statistics catch it; this is the explicit, planner-independent
  form (and the bench measures both).

The salt is ``xxhash64(fact cols) % buckets`` — deterministic, so the
join stays reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_skew_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 32,
    salt_from: tuple[str, ...] = ("turn_idx",),
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on``, hot-key-safe.

    ``dim`` rows are replicated ``buckets``× and ``fact`` rows get a
    deterministic salt from ``salt_from`` columns; the join key becomes
    ``(on, salt)`` so one hot ``on`` value spreads over ``buckets``
    reduce tasks.  Result is row-identical to the plain join (pytest +
    oracle prove it).

    ``hot_keys`` — **targeted salting**, the form that wins at scale:
    only the listed hot key values are salted/replicated; every other
    key keeps salt 0, so the dim-side blow-up is ``len(hot_keys) ×
    buckets`` extra rows instead of ``|dim| × buckets``.  Hot keys come
    from a cheap skew-immune stats pass (top-N count — itself an
    algebraic agg), exactly how AQE's skew detector finds them from
    shuffle-block sizes.  Without ``hot_keys`` every key is salted —
    correct, but the replicated dim shuffle dominates unless the dim is
    tiny (tools/bench_skew.py measures both regimes).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        # right/full outer would emit `buckets` null-extended rows for an
        # unmatched hot dim key (the dim side is replicated), silently
        # breaking the row-identical-to-plain-join contract
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — the replicated dim side makes right/full "
            "outer emit one row per salt bucket for unmatched dim keys"
        )
    salt_expr = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets)
    ).cast("int")
    all_buckets = F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>")
    if hot_keys is None:
        fact_salt = salt_expr
        dim_salts = all_buckets
    else:
        is_hot = F.col(on).isin(*hot_keys)
        fact_salt = F.when(is_hot, salt_expr).otherwise(F.lit(0))
        dim_salts = F.when(is_hot, all_buckets).otherwise(
            F.array(F.lit(0)).cast("array<int>")
        )
    fact_s = fact.withColumn(SALT_COL, fact_salt)
    dim_s = dim.withColumn(SALT_COL, F.explode(dim_salts))
    return fact_s.join(dim_s, [on, SALT_COL], how).drop(SALT_COL)
