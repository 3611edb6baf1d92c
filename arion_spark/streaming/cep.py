"""Streaming CEP: ``user → tool+ → assistant`` detection per conversation.

The streaming twin of ``operators.cep.detect_user_tools_assistant``.
Where the batch form uses next-non-tool window frames, the stream runs a
constant-size NFA per conversation inside ``applyInPandasWithState``:

    state: (pending user turn, #tools seen since) — two ints + a long

plus the same out-of-order buffer discipline as the ordered fold
(``streaming.stateful``): turns are applied to the NFA strictly in
``turn_idx`` order, buffering gaps until they fill, so arrival order
never changes the matches.  A match is emitted the moment its closing
assistant turn folds — no window wait, which is the point of CEP over
windowed aggregation.

NFA transition for the in-order turn (idx, role, ts)::

    tool      → if pending: n_tools += 1
    assistant → if pending and n_tools ≥ 1: EMIT(match); pending = None
    user      → pending = (idx, ts); n_tools = 0
    other     → pending = None            (any non-tool breaks the run)

which is exactly the batch predicate "next non-tool turn after a user
turn is an assistant with ≥1 tool between" unrolled.

Scale: state is O(out-of-orderness) per open conversation (the NFA
itself is constant), the only shuffle is hash(conv_id) into the state
operator — same profile as the ordered fold, so the scaling-efficiency
evidence for the fold pipeline carries over.

On event-time timeout the remaining buffer is drained in order (gaps
accepted — a watermark-dropped turn may hide a run-breaking non-tool
turn; flush is best-effort by construction) and state is removed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from arion_spark.streaming.stateful import DEFAULT_SESSION_GAP_MS

OUTPUT_SCHEMA = (
    "conv_id string, user_turn_idx int, user_ts timestamp, n_tools int, "
    "resp_turn_idx int, resp_ts timestamp, latency_s double, flushed boolean"
)

#: NFA registers + out-of-order buffer (role/ts only — CEP ignores text)
STATE_SCHEMA = (
    "next_idx int, pend_idx int, pend_ts long, n_tools int, "
    "buf_idx array<int>, buf_role array<string>, buf_ts array<long>, "
    "max_ts long"
)

_NO_PENDING = -1


def _advance(
    pend_idx: int,
    pend_ts: int,
    n_tools: int,
    idx: int,
    role: str,
    ts_ms: int,
) -> tuple[int, int, int, tuple | None]:
    """One NFA step; returns new registers + an emitted match or None."""
    match = None
    if role == "tool":
        if pend_idx != _NO_PENDING:
            n_tools += 1
        return pend_idx, pend_ts, n_tools, None
    if role == "assistant" and pend_idx != _NO_PENDING and n_tools >= 1:
        match = (pend_idx, pend_ts, n_tools, idx, ts_ms)
    if role == "user":
        return idx, ts_ms, 0, match
    return _NO_PENDING, 0, 0, match


def _processor(session_gap_ms: int):
    def fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            next_idx, pend_idx, pend_ts, n_tools, bi, br, bts, max_ts = state.get
            buf = {int(i): (r, t) for i, r, t in zip(bi, br, bts)}
        else:
            next_idx, pend_idx, pend_ts, n_tools = 0, _NO_PENDING, 0, 0
            buf, max_ts = {}, 0

        flush = bool(state.hasTimedOut)
        if not flush:
            # same manual watermark-drop as the ordered fold: Spark does
            # not late-filter inputs to arbitrary stateful ops
            wm_ms = state.getCurrentWatermarkMs()
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    ts_ms = int(row.ts.value // 1_000_000)
                    if wm_ms > 0 and ts_ms < wm_ms:
                        continue
                    max_ts = max(max_ts, ts_ms)
                    if row.turn_idx >= next_idx and row.turn_idx not in buf:
                        buf[int(row.turn_idx)] = (row.role, ts_ms)

        matches: list[tuple] = []
        for idx in sorted(buf):
            if not flush and idx != next_idx:
                if idx < next_idx:
                    buf.pop(idx)  # stale replay duplicate
                    continue
                break
            role, ts_ms = buf.pop(idx)
            pend_idx, pend_ts, n_tools, m = _advance(
                pend_idx, pend_ts, n_tools, idx, role, ts_ms
            )
            if m is not None:
                matches.append(m)
            next_idx = idx + 1

        if flush and not buf:
            state.remove()
        else:
            items = sorted(buf.items())
            state.update(
                (
                    int(next_idx),
                    int(pend_idx),
                    int(pend_ts),
                    int(n_tools),
                    [i for i, _ in items],
                    [v[0] for _, v in items],
                    [v[1] for _, v in items],
                    int(max_ts),
                )
            )
            state.setTimeoutTimestamp(max_ts + session_gap_ms)

        if matches:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "user_turn_idx": [m[0] for m in matches],
                    "user_ts": [pd.Timestamp(m[1], unit="ms") for m in matches],
                    "n_tools": [m[2] for m in matches],
                    "resp_turn_idx": [m[3] for m in matches],
                    "resp_ts": [pd.Timestamp(m[4], unit="ms") for m in matches],
                    "latency_s": [(m[4] - m[1]) / 1000.0 for m in matches],
                    "flushed": flush,
                }
            )

    return fn


def cep_stream(
    stream: DataFrame,
    watermark: str = "1 hour",
    session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
) -> DataFrame:
    """Watermarked transcript stream → append stream of pattern matches."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _processor(session_gap_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Generic pattern stream: any compiled (role, quantifier) sequence


GENERIC_OUTPUT_SCHEMA = (
    "conv_id string, start_turn_idx int, start_ts timestamp, "
    "end_turn_idx int, end_ts timestamp, n_turns int, latency_s double, "
    "flushed boolean"
)

#: NFA registers (pos/cnt/start/last) + the same OOO buffer; last_* track
#: the newest row consumed into the partial so a trailing-'+' match can
#: complete on break/flush at the right end row
GENERIC_STATE_SCHEMA = (
    "next_idx int, pos int, cnt int, start_idx int, start_ts long, "
    "last_idx int, last_ts long, "
    "buf_idx array<int>, buf_role array<string>, buf_ts array<long>, "
    "max_ts long"
)


def _generic_processor(pattern, session_gap_ms: int):
    from arion_spark.operators.cep import _completable, _nfa_step, compile_pattern

    pat = compile_pattern(pattern)
    plen = len(pat)

    def fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            (next_idx, pos, cnt, start_idx, start_ts,
             last_idx, last_ts, bi, br, bts, max_ts) = state.get
            buf = {int(i): (r, t) for i, r, t in zip(bi, br, bts)}
        else:
            next_idx, pos, cnt, start_idx, start_ts = 0, 0, 0, -1, 0
            last_idx, last_ts = -1, 0
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

        matches: list[tuple] = []

        def feed(idx, role, ts_ms):
            # identical control flow to operators.cep._run_nfa
            nonlocal pos, cnt, start_idx, start_ts, last_idx, last_ts
            if start_idx >= 0:
                nxt = _nfa_step(pat, pos, cnt, role)
                if nxt is not None:
                    pos, cnt = nxt
                    last_idx, last_ts = idx, ts_ms
                    if pos == plen:
                        matches.append((start_idx, start_ts, idx, ts_ms))
                        pos, cnt, start_idx, start_ts = 0, 0, -1, 0
                    return
                if _completable(pat, pos, cnt):
                    matches.append((start_idx, start_ts, last_idx, last_ts))
                pos, cnt, start_idx, start_ts = 0, 0, -1, 0
            nxt = _nfa_step(pat, 0, 0, role)
            if nxt is not None:
                pos, cnt = nxt
                start_idx, start_ts = idx, ts_ms
                last_idx, last_ts = idx, ts_ms
                if pos == plen:
                    matches.append((idx, ts_ms, idx, ts_ms))
                    pos, cnt, start_idx, start_ts = 0, 0, -1, 0

        for idx in sorted(buf):
            if not flush and idx != next_idx:
                if idx < next_idx:
                    buf.pop(idx)
                    continue
                break
            role, ts_ms = buf.pop(idx)
            feed(idx, role, ts_ms)
            next_idx = idx + 1

        if flush and start_idx >= 0 and _completable(pat, pos, cnt):
            # end-of-conversation: a trailing-'+' run is maximal here
            matches.append((start_idx, start_ts, last_idx, last_ts))
            pos, cnt, start_idx, start_ts = 0, 0, -1, 0

        if flush and not buf:
            state.remove()
        else:
            items = sorted(buf.items())
            state.update(
                (
                    int(next_idx), int(pos), int(cnt),
                    int(start_idx), int(start_ts),
                    int(last_idx), int(last_ts),
                    [i for i, _ in items],
                    [v[0] for _, v in items],
                    [v[1] for _, v in items],
                    int(max_ts),
                )
            )
            state.setTimeoutTimestamp(max_ts + session_gap_ms)

        if matches:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "start_turn_idx": [m[0] for m in matches],
                    "start_ts": [pd.Timestamp(m[1], unit="ms") for m in matches],
                    "end_turn_idx": [m[2] for m in matches],
                    "end_ts": [pd.Timestamp(m[3], unit="ms") for m in matches],
                    "n_turns": [m[2] - m[0] + 1 for m in matches],
                    "latency_s": [(m[3] - m[1]) / 1000.0 for m in matches],
                    "flushed": flush,
                }
            )

    return fn


def pattern_stream(
    stream: DataFrame,
    pattern,
    watermark: str = "1 hour",
    session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
) -> DataFrame:
    """Streaming twin of ``operators.cep.match_pattern`` for ANY compiled
    (role, quantifier) pattern — same NFA step function, same restart
    semantics, so batch and stream emit identical matches for on-time
    data (asserted in tests across two patterns)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _generic_processor(pattern, session_gap_ms),
            GENERIC_OUTPUT_SCHEMA,
            GENERIC_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
