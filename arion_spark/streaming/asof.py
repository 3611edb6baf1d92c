"""Streaming as-of enrichment: each user turn picks up the most recent
PRIOR assistant turn of its conversation, as the stream flows.

Turn-order semantics (this is the natural streaming contract): "prior"
means lower ``turn_idx``, processed through the same out-of-order buffer
discipline as the ordered fold, so arrival order never changes the
answer.  The batch twin is one window expression —
``last(assistant fields, ignorenulls) OVER (PARTITION BY conv_id ORDER
BY turn_idx ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`` — asserted equal
in tests.  (The *event-time* as-of, with equal-ts tie rules and the
union-merge plan, is the batch operator in ``operators/asof.py``; in a
transcript stream turn order and event time agree by construction, ties
broken by turn_idx.)

State per conversation: the (idx, ts) register of the latest folded
assistant turn + the OOO buffer — O(out-of-orderness), constant
registers.  One shuffle on conv_id; emission is immediate on fold, no
window wait.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from arion_spark.streaming.stateful import DEFAULT_SESSION_GAP_MS

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, asof_turn_idx int, "
    "asof_ts timestamp, lag_s double, flushed boolean"
)

STATE_SCHEMA = (
    "next_idx int, a_idx int, a_ts long, "
    "buf_idx array<int>, buf_role array<string>, buf_ts array<long>, "
    "max_ts long"
)

_NONE = -1


def _processor(tolerance_s: int | None, session_gap_ms: int):
    tol_ms = None if tolerance_s is None else int(tolerance_s) * 1000

    def fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            next_idx, a_idx, a_ts, bi, br, bts, max_ts = state.get
            buf = {int(i): (r, t) for i, r, t in zip(bi, br, bts)}
        else:
            next_idx, a_idx, a_ts = 0, _NONE, 0
            buf, max_ts = {}, 0

        flush = bool(state.hasTimedOut)
        if not flush:
            wm_ms = state.getCurrentWatermarkMs()
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    ts_ms = int(row.ts.value // 1_000_000)
                    if wm_ms > 0 and ts_ms < wm_ms:
                        continue
                    max_ts = max(max_ts, ts_ms)
                    if row.turn_idx >= next_idx and row.turn_idx not in buf:
                        buf[int(row.turn_idx)] = (row.role, ts_ms)

        out: list[tuple] = []
        for idx in sorted(buf):
            if not flush and idx != next_idx:
                if idx < next_idx:
                    buf.pop(idx)
                    continue
                break
            role, ts_ms = buf.pop(idx)
            if role == "user":
                matched = a_idx != _NONE and (
                    tol_ms is None or ts_ms - a_ts <= tol_ms
                )
                out.append(
                    (idx, ts_ms, a_idx if matched else None,
                     a_ts if matched else None)
                )
            elif role == "assistant":
                a_idx, a_ts = idx, ts_ms
            next_idx = idx + 1

        if flush and not buf:
            state.remove()
        else:
            items = sorted(buf.items())
            state.update(
                (
                    int(next_idx), int(a_idx), int(a_ts),
                    [i for i, _ in items],
                    [v[0] for _, v in items],
                    [v[1] for _, v in items],
                    int(max_ts),
                )
            )
            state.setTimeoutTimestamp(max_ts + session_gap_ms)

        if out:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": [o[0] for o in out],
                    "ts": [pd.Timestamp(o[1], unit="ms") for o in out],
                    "asof_turn_idx": [o[2] for o in out],
                    "asof_ts": [
                        None if o[3] is None else pd.Timestamp(o[3], unit="ms")
                        for o in out
                    ],
                    "lag_s": [
                        None if o[3] is None else (o[1] - o[3]) / 1000.0
                        for o in out
                    ],
                    "flushed": flush,
                }
            )

    return fn


def asof_stream(
    stream: DataFrame,
    tolerance_s: int | None = 3600,
    watermark: str = "1 hour",
    session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
) -> DataFrame:
    """Watermarked transcript stream → append stream of user turns
    enriched with their latest prior assistant turn."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _processor(tolerance_s, session_gap_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
