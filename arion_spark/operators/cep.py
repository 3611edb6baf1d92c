"""CEP sequence-pattern detection over keyed, ordered turn streams.

MATCH_RECOGNIZE analog (Spark has none): detect the variable-length
pattern ``user → tool+ → assistant`` — a user turn, one or more
consecutive tool turns, then an assistant turn — inside each
conversation, in ``turn_idx`` order.

The NFA-free relational encoding: ``turn_idx`` is dense per conversation
(row_number-derived), so "the run of tool turns after me ends at the
next non-tool turn" collapses to two window expressions over the frame
``1 FOLLOWING .. UNBOUNDED FOLLOWING``:

* ``nxt_idx``  = MIN(turn_idx)            over non-tool following rows
* ``nxt_role`` = FIRST(role IGNORE NULLS) over non-tool following rows
  (ordered by turn_idx, these name the same row)

A user turn at ``i`` starts a match iff ``nxt_idx > i + 1`` (at least
one tool between) and ``nxt_role = 'assistant'``.  Every emitted match
is maximal and the whole thing is ONE shuffle on conv_id + an
in-partition sort — all JVM expressions, no Python, no self-join.
Longer patterns compose the same way (k-th following non-X row).

This is the batch form of the CEP stage in the north-star DAG; the
streaming twin runs inside the per-conversation ordered fold
(streaming/stateful.py), which sees turns in exactly this order.

Reference analog: arion's ordered operation chain fires each operator on
the record sequence in fixed order (reference: src/arion.cpp:560-616);
pattern detection generalizes "operator fires when its input shape
appears" to cross-record shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_user_tools_assistant(t: DataFrame) -> DataFrame:
    """All maximal ``user → tool+ → assistant`` matches per conversation.

    Output: one row per match —
    ``conv_id, user_turn_idx, user_ts, n_tools, resp_turn_idx, resp_ts,
    latency_s``.
    """
    fol = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    non_tool_idx = F.when(F.col("role") != "tool", F.col("turn_idx"))
    non_tool_role = F.when(F.col("role") != "tool", F.col("role"))
    non_tool_ts = F.when(F.col("role") != "tool", F.col("ts"))
    m = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        F.min(non_tool_idx).over(fol).alias("nxt_idx"),
        F.first(non_tool_role, ignorenulls=True).over(fol).alias("nxt_role"),
        F.first(non_tool_ts, ignorenulls=True).over(fol).alias("nxt_ts"),
    )
    return m.where(
        (F.col("role") == "user")
        & (F.col("nxt_role") == "assistant")
        & (F.col("nxt_idx") > F.col("turn_idx") + 1)
    ).select(
        "conv_id",
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("ts").alias("user_ts"),
        (F.col("nxt_idx") - F.col("turn_idx") - 1).cast("int").alias("n_tools"),
        F.col("nxt_idx").alias("resp_turn_idx"),
        F.col("nxt_ts").alias("resp_ts"),
        # fractional seconds survive (unix_timestamp would truncate millis);
        # NTZ → TZ (session is UTC) → double, NTZ has no direct double cast
        (
            F.col("nxt_ts").cast("timestamp").cast("double")
            - F.col("ts").cast("timestamp").cast("double")
        ).alias("latency_s"),
    )
