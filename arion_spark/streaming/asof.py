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


FIRST_RESPONSE_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, u_ts timestamp, first_r_ts timestamp, "
    "flushed boolean"
)

#: pending = user turns still awaiting their first responder (bounded by
#: horizon × per-conv user rate); buf = the usual OOO fold buffer.
#: Timestamps are microseconds (pandas .value // 1000) so the batch
#: twin's fractional-second latencies survive the round trip.
FIRST_RESPONSE_STATE_SCHEMA = (
    "next_idx int, p_idx array<int>, p_ts array<long>, "
    "buf_idx array<int>, buf_role array<string>, buf_ts array<long>, "
    "max_ts long"
)

_RESPONDERS = ("assistant", "tool")


def _first_response_processor(horizon_s: int, session_gap_ms: int):
    horizon_us = int(horizon_s) * 1_000_000

    def fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            next_idx, pi, pt, bi, br, bts, max_us = state.get
            pending = {int(i): int(t) for i, t in zip(pi, pt)}
            buf = {int(i): (r, int(t)) for i, r, t in zip(bi, br, bts)}
        else:
            next_idx, max_us = 0, 0
            pending, buf = {}, {}

        flush = bool(state.hasTimedOut)
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        if not flush:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    ts_us = int(row.ts.value // 1000)
                    if wm_ms > 0 and ts_us < wm_us:
                        continue
                    max_us = max(max_us, ts_us)
                    if row.turn_idx >= next_idx and row.turn_idx not in buf:
                        buf[int(row.turn_idx)] = (row.role, ts_us)

        out: list[tuple] = []
        for idx in sorted(buf):
            if not flush and idx != next_idx:
                if idx < next_idx:
                    buf.pop(idx)
                    continue
                break
            role, ts_us = buf.pop(idx)
            if role == "user":
                pending[idx] = ts_us
            elif role in _RESPONDERS:
                # in-order fold ⇒ this is the FIRST at-or-after responder
                # for every pending user turn; outside-horizon pendings
                # are thereby proven unanswerable (batch drops them too)
                for u_idx in sorted(pending):
                    u_ts = pending[u_idx]
                    if ts_us - u_ts < horizon_us:
                        out.append((u_idx, u_ts, ts_us))
                pending.clear()
            next_idx = idx + 1

        # horizon expiry: once the watermark passes u_ts + horizon no
        # in-horizon responder can still arrive — retire the pending row
        # (batch emits nothing for it either).  This is why flush does
        # NOT clear pending: a conversation may resume after the session
        # gap with a responder still inside the horizon.
        if wm_ms > 0:
            for u_idx in [
                i for i, t in pending.items() if wm_us >= t + horizon_us
            ]:
                pending.pop(u_idx)

        if flush and not buf and not pending:
            state.remove()
        else:
            items = sorted(buf.items())
            pitems = sorted(pending.items())
            state.update(
                (
                    int(next_idx),
                    [i for i, _ in pitems],
                    [t for _, t in pitems],
                    [i for i, _ in items],
                    [v[0] for _, v in items],
                    [v[1] for _, v in items],
                    int(max_us),
                )
            )
            # wake at the session gap or the earliest pending expiry,
            # whichever first — but strictly beyond the current watermark
            cands = [max_us // 1000 + session_gap_ms] + [
                (t + horizon_us) // 1000 + 1 for _, t in pitems
            ]
            state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))

        if out:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": [o[0] for o in out],
                    "u_ts": [pd.Timestamp(o[1], unit="us") for o in out],
                    "first_r_ts": [pd.Timestamp(o[2], unit="us") for o in out],
                    "flushed": flush,
                }
            )

    return fn


def first_response_stream(
    stream: DataFrame,
    horizon_s: int = 3600,
    watermark: str = "1 hour",
    session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
) -> DataFrame:
    """FORWARD as-of: each user turn paired with its first at-or-after
    assistant/tool turn within ``horizon_s`` — the streaming twin of
    queries.first_response (which runs on the batch union-merge as-of).

    Emission is exactly-once per answered user turn, which is what lets
    downstream bin-count sketches (streaming/rollup.run_latency_hist_
    stream) merge by addition.  In a transcript stream turn order and
    event time agree by construction (ts strictly increases with
    turn_idx — verified on the generator tables), so the in-order fold
    computes exactly the batch earliest-at-or-after match.  State per
    conversation: pending user turns (bounded by horizon × user-turn
    rate) + the OOO buffer; both evicted by responder arrival, horizon
    expiry, or session close."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _first_response_processor(horizon_s, session_gap_ms),
            FIRST_RESPONSE_OUTPUT_SCHEMA,
            FIRST_RESPONSE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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
