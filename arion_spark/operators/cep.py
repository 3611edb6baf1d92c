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


# ---------------------------------------------------------------------------
# Generic pattern API: MATCH_RECOGNIZE-style (role, quantifier) sequences


#: pattern element: (role, quantifier); quantifier "1" = exactly one,
#: "+" = one or more (greedy), "?" = zero or one (greedy).  Compiled /
#: validated by compile_pattern(); matches always consume ≥1 row.
DEFAULT_PATTERN = (("user", "1"), ("tool", "+"), ("assistant", "1"))


def compile_pattern(pattern) -> tuple[tuple[str, str], ...]:
    """Validate a pattern for the deterministic single-scan NFA.

    Constraint: a ``+`` element's role must differ from the next
    element's role — otherwise "stay in the run" vs "advance" is
    ambiguous and the single-partial NFA below would need backtracking.
    (MATCH_RECOGNIZE imposes the analogous greedy-determinism rule.)

    A trailing ``+`` element is legal: its run is maximal-greedy and the
    match completes when a non-matching role breaks the run (the breaker
    is NOT part of the match and may start a new partial) or when the
    conversation ends (batch: end of the sorted group; streaming:
    event-time flush) — see ``_completable``.
    """
    pat = tuple((str(r), str(q)) for r, q in pattern)
    if not pat:
        raise ValueError("cep: empty pattern")
    for r, q in pat:
        if q not in ("1", "+", "?"):
            raise ValueError(f"cep: unknown quantifier {q!r}")
    for i, (r, q) in enumerate(pat[:-1]):
        if q in ("+", "?") and pat[i + 1][0] == r:
            raise ValueError(
                f"cep: ambiguous pattern — {q!r} element {r!r} followed by "
                "the same role needs backtracking"
            )
    if all(q == "?" for _, q in pat):
        raise ValueError(
            "cep: all-optional pattern would admit empty matches"
        )
    return pat


def _nfa_step(pat, pos: int, cnt: int, role: str):
    """One transition of the single-partial NFA.

    Returns (new_pos, new_cnt) on progress or None on failure.  A ``+``
    element with ≥1 match falls through to the next element when the
    incoming role stops the run (recursion depth ≤ pattern length).
    """
    if pos >= len(pat):
        return None
    r, q = pat[pos]
    if role == r:
        # '1' advances; '?' consumes its one allowed row (greedy) and
        # advances; '+' stays in the run
        return (pos, cnt + 1) if q == "+" else (pos + 1, 0)
    if q == "+" and cnt >= 1:
        return _nfa_step(pat, pos + 1, 0, role)
    if q == "?":
        return _nfa_step(pat, pos + 1, 0, role)  # skip the optional
    return None


def _completable(pat, pos: int, cnt: int) -> bool:
    """True when the active partial needs no further input to be a match:
    the CURRENT element is satisfied (a ``+`` run with ≥1 row, or a
    ``?``) and every element after it is optional.  Such a partial
    completes (ending at the last consumed row) when the run breaks or
    the conversation ends — the only way a trailing-``+``/``?`` pattern
    can ever finish, since ``_nfa_step`` cannot advance past the end."""
    if pos >= len(pat):
        return False
    r, q = pat[pos]
    satisfied = (q == "+" and cnt >= 1) or q == "?"
    return satisfied and all(q2 == "?" for _, q2 in pat[pos + 1 :])


def _run_nfa(pat, rows):
    """Run the NFA over in-order (turn_idx, role, ts) tuples; yields
    (start_idx, start_ts, end_idx, end_ts, n_turns) per match.

    Restart semantics (same as detect_user_tools_assistant): at most one
    active partial; a failing turn resets it and may itself start a new
    partial.  Matches therefore never overlap.  A completable trailing-
    ``+`` partial is emitted on break (ending at the last matched row —
    the breaker is excluded and may start a new partial) and at
    end-of-input.
    """
    pos, cnt, start, last = 0, 0, None, None
    for idx, role, ts in rows:
        if start is not None:
            nxt = _nfa_step(pat, pos, cnt, role)
            if nxt is not None:
                pos, cnt = nxt
                last = (idx, ts)
                if pos == len(pat):
                    yield (start[0], start[1], idx, ts, idx - start[0] + 1)
                    pos, cnt, start = 0, 0, None
                continue
            if _completable(pat, pos, cnt):
                yield (start[0], start[1], last[0], last[1], last[0] - start[0] + 1)
            pos, cnt, start = 0, 0, None
        nxt = _nfa_step(pat, 0, 0, role)
        if nxt is not None:
            pos, cnt = nxt
            start = last = (idx, ts)
            if pos == len(pat):  # single-element pattern
                yield (idx, ts, idx, ts, 1)
                pos, cnt, start = 0, 0, None
    if start is not None and _completable(pat, pos, cnt):
        yield (start[0], start[1], last[0], last[1], last[0] - start[0] + 1)


def match_pattern(t: DataFrame, pattern=DEFAULT_PATTERN) -> DataFrame:
    """Batch pattern matching for ANY compiled (role, quantifier)
    sequence: ``repartition(conv_id) → sortWithinPartitions → mapInPandas``
    running the same NFA the streaming twin keeps in state — one shuffle,
    O(n) per partition, per-PARTITION (not per-group) Python cost, the
    exact plan shape of operators.fingerprint.rolling.

    Output: conv_id, start_turn_idx, start_ts, end_turn_idx, end_ts,
    n_turns, latency_s.  For DEFAULT_PATTERN this equals
    detect_user_tools_assistant (asserted in tests) — that window-
    expression form stays the oracle-checked fast path; this is the
    general operator.
    """
    import pandas as pd

    pat = compile_pattern(pattern)

    def scan(batches):
        # rows within a partition arrive sorted by (conv_id, turn_idx);
        # carry the partial across Arrow batches, reset per conversation
        # (flushing any completable trailing-'+' partial at the boundary)
        cur = None
        pos, cnt, start, last = 0, 0, None, None
        out_rows = []

        def flush_partial():
            if start is not None and _completable(pat, pos, cnt):
                out_rows.append(
                    (cur, start[0], start[1], last[0], last[1],
                     last[0] - start[0] + 1)
                )

        for pdf in batches:
            for conv, idx, role, ts in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["ts"]
            ):
                if conv != cur:
                    flush_partial()
                    cur, pos, cnt, start = conv, 0, 0, None
                if start is not None:
                    nxt = _nfa_step(pat, pos, cnt, role)
                    if nxt is not None:
                        pos, cnt = nxt
                        last = (idx, ts)
                        if pos == len(pat):
                            out_rows.append(
                                (cur, start[0], start[1], idx, ts, idx - start[0] + 1)
                            )
                            pos, cnt, start = 0, 0, None
                        continue
                    if _completable(pat, pos, cnt):
                        out_rows.append(
                            (cur, start[0], start[1], last[0], last[1],
                             last[0] - start[0] + 1)
                        )
                    pos, cnt, start = 0, 0, None
                nxt = _nfa_step(pat, 0, 0, role)
                if nxt is not None:
                    pos, cnt = nxt
                    start = last = (idx, ts)
                    if pos == len(pat):
                        out_rows.append((cur, idx, ts, idx, ts, 1))
                        pos, cnt, start = 0, 0, None
        flush_partial()
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "conv_id", "start_turn_idx", "start_ts",
                    "end_turn_idx", "end_ts", "n_turns",
                ],
            )

    schema = (
        "conv_id string, start_turn_idx int, start_ts timestamp, "
        "end_turn_idx int, end_ts timestamp, n_turns int"
    )
    parts = t.select("conv_id", "turn_idx", "role", "ts").repartition(
        "conv_id"
    ).sortWithinPartitions("conv_id", "turn_idx")
    out = parts.mapInPandas(scan, schema)
    lat = (
        F.col("end_ts").cast("timestamp").cast("double")
        - F.col("start_ts").cast("timestamp").cast("double")
    )
    return out.withColumn("latency_s", lat)
