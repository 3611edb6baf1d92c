"""Deterministic synthetic transcript inputs.

The engine's authoritative input shape (BASELINE.json ``input_hint``)::

    conv_id: string, turn_idx: int, role: string,
    text: string, tool: string, ts: timestamp

Three generators, all fully deterministic (no wall clock, no RNG state):

1. :data:`TRANSCRIPTS_SQL_TEMPLATE` — derives a transcripts table from the
   driver-provided ``events`` parquet with *one* SQL text rendered for both
   the Spark and DuckDB dialects, so driver-side oracle comparison is
   comparing two executions of the same relational program.
2. :func:`generate_transcripts` — Spark-native generator at arbitrary
   scale (``spark.range`` + hash-derived columns; no Python in the loop),
   with controlled hot-key skew and bounded out-of-order timestamps; used
   by streaming tests and the benchmark.  This is the 100 TB-shaped path:
   generation is embarrassingly parallel, one narrow stage.
3. :func:`py_rows` — tiny pure-Python fixture for golden/unit tests
   (mirrors the reference's checked-in fixture images,
   reference: tests/functional/test.py:18-28).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

#: One relational program, two dialects.  ``{STR}`` is the string type name
#: (Spark: STRING, DuckDB: VARCHAR).  Deterministic: role/tool/marker columns
#: are pure functions of event_id; turn ordering ties broken by event_id.
#: Markers mirror the reference's IPTC release-flag phrases
#: (reference: src/models/read_meta.cpp:206-219) and its comma-split keyword
#: and unicode test cases (reference: tests/functional/test.py:1053-1090).
TRANSCRIPTS_SQL_TEMPLATE = """
SELECT
  concat('conv-', lpad(cast(user_id AS {STR}), 6, '0')) AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
    AS turn_idx,
  CASE cast(event_id % 4 AS INT)
    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
    WHEN 2 THEN 'tool' ELSE 'system' END AS role,
  concat(
    event_type, ' ', props,
    CASE WHEN event_id % 7  = 0 THEN ', Model Released (MR) confirmed' ELSE '' END,
    CASE WHEN event_id % 11 = 0 THEN ' property released (pr)' ELSE '' END,
    CASE WHEN event_id % 13 = 0 THEN ', keywords, alpha, beta , gamma' ELSE '' END,
    CASE WHEN event_id % 17 = 0 THEN ' Splitsko-dalmatinska županija' ELSE '' END,
    CASE WHEN event_id % 19 = 0 THEN ' [copyright: (c) 2024 Arion Labs]' ELSE '' END,
    CASE WHEN event_id % 23 = 0
      THEN ' [city: Split] [province_state: Splitsko-dalmatinska] [country_name: Croatia] [country_code: HR]'
      ELSE '' END,
    CASE WHEN event_id % 29 = 0
      THEN ' [byline: Ada Lovelace] [byline: Grace Hopper]' ELSE '' END,
    CASE WHEN event_id % 31 = 0
      THEN ' [subject: 01005000] [subject: 15073001]' ELSE '' END,
    CASE WHEN event_id % 41 = 0
      THEN ' [special_instructions: hold for release]' ELSE '' END
  ) AS text,
  CASE WHEN cast(event_id % 4 AS INT) = 2 THEN event_type ELSE NULL END AS tool,
  ts
FROM events
"""

TRANSCRIPTS_SQL_SPARK = TRANSCRIPTS_SQL_TEMPLATE.format(STR="STRING")
TRANSCRIPTS_SQL_DUCKDB = TRANSCRIPTS_SQL_TEMPLATE.format(STR="VARCHAR")


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts view derived from the driver's events parquet."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_SQL_SPARK)


# ---------------------------------------------------------------------------
# Spark-native scalable generator
# ---------------------------------------------------------------------------

_WORDS = (
    "query plan shuffle merge window state stream batch join filter "
    "agg scan sort hash skew salt watermark checkpoint sink source turn"
).split()


def generate_transcripts(
    spark: SparkSession,
    n_turns: int,
    avg_turns_per_conv: int = 20,
    hot_convs: int = 2,
    hot_fraction_mod: int = 25,
    late_mod: int = 997,
    base_ts: str = "2024-01-01 00:00:00",
    partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_turns`` transcript rows, deterministic in ``n_turns``.

    Scale design: a single narrow ``spark.range`` stage computes every
    column as a hash of ``id`` — no shuffle except the final per-conv
    ``turn_idx`` ranking, which is the one semantic that genuinely needs
    key-grouping.  ~``1/hot_fraction_mod`` of rows land on ``hot_convs``
    hot conversations (skew fixture for salting / AQE skew-join), and
    every ``late_mod``-th row gets a timestamp pulled far backwards
    (beyond-watermark late-data fixture).
    """
    rng = spark.range(n_turns, numPartitions=partitions)
    h = F.xxhash64(F.col("id"))  # deterministic 64-bit mix per row

    conv_id = F.when(
        h % hot_fraction_mod == 0,
        F.concat(F.lit("conv-hot-"), (F.col("id") % hot_convs).cast("string")),
    ).otherwise(
        F.concat(
            F.lit("conv-"),
            F.lpad((F.col("id") / avg_turns_per_conv).cast("long").cast("string"), 8, "0"),
        )
    )

    word = lambda k: _WORDS[k % len(_WORDS)]  # noqa: E731
    text = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                (((h + i) % len(_WORDS) + len(_WORDS)) % len(_WORDS) + 1).cast("int"),
            )
            for i in range(8)
        ],
    )
    text = F.concat(
        text,
        F.when(F.col("id") % 31 == 0, F.lit(", model released (mr)")).otherwise(F.lit("")),
        F.when(F.col("id") % 37 == 0, F.lit(" property released (pr)")).otherwise(F.lit("")),
    )

    role = (
        F.when(F.col("id") % 4 == 0, "user")
        .when(F.col("id") % 4 == 1, "assistant")
        .when(F.col("id") % 4 == 2, "tool")
        .otherwise("system")
    )
    tool = F.when(role == "tool", F.element_at(
        F.array(F.lit("search"), F.lit("calc"), F.lit("code")), (F.col("id") % 3 + 1).cast("int")
    )).otherwise(F.lit(None).cast("string"))

    # Event time: ~1 row/sec globally, with in-conv jitter (out-of-order but
    # watermark-recoverable) and sparse far-late rows (beyond watermark).
    jitter = (h % 30 + 30) % 30  # [0, 30) seconds
    late = F.when(F.col("id") % late_mod == 0, F.lit(86400)).otherwise(F.lit(0))
    ts = (
        F.lit(base_ts).cast("timestamp")
        + F.make_interval(secs=(F.col("id") - jitter - late).cast("double"))
    )

    df = rng.select(
        conv_id.alias("conv_id"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        F.col("id").alias("_gen_id"),
    )
    from pyspark.sql import Window as W

    turn_idx = (
        F.row_number().over(W.partitionBy("conv_id").orderBy("_gen_id")) - 1
    ).cast("int")
    return df.select(
        "conv_id", turn_idx.alias("turn_idx"), "role", "text", "tool", "ts"
    )


# ---------------------------------------------------------------------------
# Pure-Python micro-fixture (for golden tests; no Spark involved)
# ---------------------------------------------------------------------------

def py_rows(n_convs: int = 4, turns_per_conv: int = 6) -> list[dict]:
    """Small deterministic fixture, seeded by hashlib only."""
    base = datetime(2024, 1, 1)
    roles = ["user", "assistant", "tool", "system"]
    rows = []
    for c in range(n_convs):
        conv = f"conv-{c:06d}"
        for t in range(turns_per_conv):
            seed = hashlib.md5(f"{conv}/{t}".encode()).hexdigest()
            words = [_WORDS[int(seed[i : i + 2], 16) % len(_WORDS)] for i in range(0, 12, 2)]
            text = " ".join(words)
            if (c + t) % 5 == 0:
                text += ", Model Released (MR)"
            if (c + t) % 7 == 0:
                text += " property released (pr), alpha, beta , gamma"
            role = roles[t % 4]
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": "search" if role == "tool" else None,
                    "ts": base + timedelta(seconds=c * 1000 + t * 10),
                }
            )
    return rows
