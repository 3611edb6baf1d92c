"""Per-conversation ordered-fold state — the streaming heart of the engine.

The reference holds one in-memory working context per invocation
(reference: src/arion.hpp:96-123) and relies on EXIF-orientation
canonicalization for deterministic output (src/arion.cpp:325-405).  The
streaming transposition: per-``conv_id`` state in
``applyInPandasWithState`` that **buffers out-of-order turns and folds
them strictly in turn_idx order**, so arrival order never affects the
rolling fingerprint — the same invariant the batch twin
(operators.fingerprint.rolling) gets from its sort.

Semantics:
  * input: watermarked transcript stream; rows older than the watermark
    are dropped by Spark before they reach the state function.
  * a turn is *folded* (emitted) once every turn 0..i-1 of its
    conversation has been folded — turn_idx is dense per conversation
    (input contract, BASELINE.json input_hint).
  * out-of-order turns wait in the buffer until the gap fills.
  * on event-time timeout (conversation idle past ``session_gap`` in
    event time), remaining buffered turns are flushed in order —
    accepting gaps left by watermark-dropped late rows — and the state
    is removed (session close).  Emitted rows carry ``flushed=true``.

Output rows match the batch twin bit-for-bit for on-time data:
(conv_id, turn_idx, role, text, tool, ts, turn_md5, conv_fp).

Scale: state per key is O(buffered turns) — bounded by the
out-of-orderness horizon, not conversation length (folded turns leave
the buffer immediately; only the 32-hex fold accumulator persists).
Hot conversations therefore do NOT accumulate state; key-skew on the
shuffle into the stateful operator is bounded by per-conv arrival rate.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, turn_md5 string, conv_fp string, flushed boolean"
)

#: buffered out-of-order turns (parallel arrays) + fold accumulator
STATE_SCHEMA = (
    "next_idx int, fp string, buf_idx array<int>, buf_role array<string>, "
    "buf_text array<string>, buf_tool array<string>, buf_ts array<long>, "
    "max_ts long"
)

DEFAULT_SESSION_GAP_MS = 30 * 60 * 1000


def _fold_step(fp: str, text: str) -> tuple[str, str]:
    m = hashlib.md5(text.encode("utf-8")).hexdigest()
    return hashlib.md5((fp + m).encode("ascii")).hexdigest(), m


def _emit_ready(
    next_idx: int,
    fp: str,
    buf: dict[int, tuple],
    flush: bool,
) -> tuple[int, str, list[tuple]]:
    """Fold every contiguously-ready turn (or everything, if flushing).

    Null-text contract (shared with the batch twins, see
    operators.fingerprint): a null-text turn emits NULL turn_md5/conv_fp
    and is SKIPPED by the fold — the accumulator is unchanged, later
    turns fold as if the null turn were absent."""
    out = []
    for idx in sorted(buf):
        if not flush and idx != next_idx:
            if idx < next_idx:
                # stale duplicate of an already-folded turn — drop
                # (idempotence under source replay)
                continue
            break
        role, text, tool, ts = buf[idx]
        if text is None:
            out.append((idx, role, None, tool, ts, None, None))
        else:
            fp, m = _fold_step(fp, text)
            out.append((idx, role, text, tool, ts, m, fp))
        next_idx = idx + 1
    for idx, *_ in out:
        buf.pop(idx, None)
    # also drop stale duplicates below the fold point
    for idx in [i for i in buf if i < next_idx]:
        buf.pop(idx)
    return next_idx, fp, out


def _conv_processor(session_gap_ms: int):
    def fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            next_idx, fp, bi, br, bt, btool, bts, max_ts = state.get
            buf = {
                int(i): (r, t, tl, s)
                for i, r, t, tl, s in zip(bi, br, bt, btool, bts)
            }
        else:
            next_idx, fp, buf, max_ts = 0, "", {}, 0

        emitted: list[tuple] = []
        flush = bool(state.hasTimedOut)
        if not flush:
            # Spark late-filters inputs for aggregations/joins but NOT for
            # arbitrary stateful ops — enforce the watermark drop semantics
            # here so late turns can never rewrite an already-folded prefix.
            wm_ms = state.getCurrentWatermarkMs()
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    ts_ms = int(row.ts.value // 1_000_000)
                    if wm_ms > 0 and ts_ms < wm_ms:
                        continue  # late beyond watermark: dropped
                    max_ts = max(max_ts, ts_ms)
                    if row.turn_idx >= next_idx and row.turn_idx not in buf:
                        buf[int(row.turn_idx)] = (
                            row.role,
                            row.text,
                            row.tool,
                            ts_ms,
                        )
            next_idx, fp, ready = _emit_ready(next_idx, fp, buf, flush=False)
            emitted.extend(ready)
        else:
            next_idx, fp, ready = _emit_ready(next_idx, fp, buf, flush=True)
            emitted.extend(ready)

        if flush and not buf:
            state.remove()
        else:
            items = sorted(buf.items())
            state.update(
                (
                    int(next_idx),
                    fp,
                    [i for i, _ in items],
                    [v[0] for _, v in items],
                    [v[1] for _, v in items],
                    [v[2] for _, v in items],
                    [v[3] for _, v in items],
                    int(max_ts),
                )
            )
            # session closes session_gap past the latest event seen
            state.setTimeoutTimestamp(max_ts + session_gap_ms)

        if emitted:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": [e[0] for e in emitted],
                    "role": [e[1] for e in emitted],
                    "text": [e[2] for e in emitted],
                    "tool": [e[3] for e in emitted],
                    "ts": [pd.Timestamp(e[4], unit="ms") for e in emitted],
                    "turn_md5": [e[5] for e in emitted],
                    "conv_fp": [e[6] for e in emitted],
                    "flushed": flush,
                }
            )

    return fn


def ordered_fold_stream(
    stream: DataFrame,
    watermark: str = "1 hour",
    session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
) -> DataFrame:
    """Watermarked stream → per-turn folded output (append mode).

    The shuffle into the state operator is hash(conv_id); the state store
    (RocksDB on a cluster) holds one entry per open conversation.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _conv_processor(session_gap_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Bucketed state: many conversations per state key
# ---------------------------------------------------------------------------

BUCKET_STATE_SCHEMA = "blob binary"
DEFAULT_N_BUCKETS = 256


def _bucket_processor(session_gap_ms: int):
    """State fn keyed on a conversation BUCKET.

    Semantics are identical to :func:`_conv_processor` per conversation;
    only the *physical* state key changes: ``applyInPandasWithState``
    pays ~5-10 ms of per-key machinery (Arrow group framing + state
    get/ser/de) per key per batch, so one key per conversation costs
    O(active conversations) fixed overhead — measured 640 core-seconds
    for 80k conversations over 1.6M turns.  Packing ~(convs/buckets)
    conversations into one pickled dict per bucket amortizes it ~100×,
    which is the difference between viable and non-viable at 10^10
    conversations.

    Timeout handling: a bucket that keeps receiving data never fires its
    event-time timeout, so expired conversations (deadline = max_ts +
    session_gap ≤ watermark) are flushed during DATA invocations too —
    exactly the per-conversation-timeout semantics, evaluated lazily.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pickle

        md5 = hashlib.md5
        convs: dict[str, list] = (
            pickle.loads(bytes(state.get[0])) if state.exists else {}
        )
        # conv state: [next_idx, fp, buf{idx: (role,text,tool,ts_ms)}, max_ts]
        wm_ms = state.getCurrentWatermarkMs()
        # emitted rows as parallel columns (one list append per field —
        # a tuple-per-row representation measured ~2× slower end-to-end)
        o_conv: list = []
        o_idx: list = []
        o_role: list = []
        o_text: list = []
        o_tool: list = []
        o_ts: list = []
        o_md5: list = []
        o_fp: list = []
        o_fl: list = []

        def emit(cid, idx, role, text, tool, ts_ms, m, fp, flushed):
            o_conv.append(cid)
            o_idx.append(idx)
            o_role.append(role)
            o_text.append(text)
            o_tool.append(tool)
            o_ts.append(ts_ms)
            o_md5.append(m)
            o_fp.append(fp)
            o_fl.append(flushed)

        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                # bulk column extraction: itertuples + per-row Timestamp
                # attribute access was the hot spot (~5× slower loop)
                ts_l = (
                    pdf["ts"].to_numpy("datetime64[ns]").astype("int64")
                    // 1_000_000
                ).tolist()
                conv_l = pdf["conv_id"].tolist()
                idx_l = pdf["turn_idx"].tolist()
                role_l = pdf["role"].tolist()
                text_l = pdf["text"].tolist()
                tool_l = pdf["tool"].tolist()
                # per-turn md5 is precomputed JVM-side (_m, codegen'd) so
                # Python pays only the inherently sequential fold step
                m_l = (
                    pdf["_m"].tolist()
                    if "_m" in pdf.columns
                    else [None] * len(conv_l)
                )
                for i in range(len(conv_l)):
                    t_ms = ts_l[i]
                    if wm_ms > 0 and t_ms < wm_ms:
                        continue  # late beyond watermark: dropped
                    cid = conv_l[i]
                    st = convs.get(cid)
                    if st is None:
                        st = convs[cid] = [0, "", {}, 0]
                    if t_ms > st[3]:
                        st[3] = t_ms
                    ti = idx_l[i]
                    if ti == st[0] and not st[2]:
                        # fast path: in-order arrival, empty buffer → fold now
                        text = text_l[i]
                        if text is None:
                            # null-text contract: NULL md5/fp, fold skips
                            st[0] = ti + 1
                            emit(cid, ti, role_l[i], None, tool_l[i], t_ms,
                                 None, None, False)
                            continue
                        m = m_l[i]
                        if m is None:
                            m = md5(text.encode("utf-8")).hexdigest()
                        fp = md5((st[1] + m).encode("ascii")).hexdigest()
                        st[0] = ti + 1
                        st[1] = fp
                        emit(cid, ti, role_l[i], text, tool_l[i], t_ms, m, fp, False)
                    elif ti >= st[0] and ti not in st[2]:
                        st[2][int(ti)] = (role_l[i], text_l[i], tool_l[i], t_ms)

        # drain buffers where out-of-order gaps have filled
        for cid, st in convs.items():
            if st[2]:
                next_idx, fp, ready = _emit_ready(st[0], st[1], st[2], flush=False)
                st[0], st[1] = next_idx, fp
                for r in ready:
                    emit(cid, *r, False)

        # flush conversations whose session closed (event-time gap passed)
        closed = [
            c for c, st in convs.items() if wm_ms > 0 and st[3] + session_gap_ms <= wm_ms
        ]
        for cid in closed:
            st = convs[cid]
            _, _, ready = _emit_ready(st[0], st[1], st[2], flush=True)
            for r in ready:
                emit(cid, *r, True)
            del convs[cid]

        if convs:
            state.update((bytearray(pickle.dumps(convs)),))
            next_deadline = min(st[3] + session_gap_ms for st in convs.values())
            state.setTimeoutTimestamp(max(next_deadline, wm_ms + 1))
        elif state.exists:
            state.remove()

        if o_conv:
            yield pd.DataFrame(
                {
                    "conv_id": o_conv,
                    "turn_idx": o_idx,
                    "role": o_role,
                    "text": o_text,
                    "tool": o_tool,
                    "ts": pd.to_datetime(o_ts, unit="ms"),
                    "turn_md5": o_md5,
                    "conv_fp": o_fp,
                    "flushed": o_fl,
                }
            )

    return fn


def ordered_fold_stream_bucketed(
    stream: DataFrame,
    watermark: str = "1 hour",
    session_gap_ms: int = DEFAULT_SESSION_GAP_MS,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Bucketed variant of :func:`ordered_fold_stream` — identical output
    rows, O(n_buckets) state keys instead of O(conversations).

    ``n_buckets`` sizes the state-key population: ≥ 4-8× total cores for
    load balance; each bucket's per-batch Python work is
    O(rows-in-bucket).  Hot conversations occupy one bucket but their
    state stays O(out-of-orderness), so skew is bounded by arrival rate
    exactly as in the per-conversation layout."""
    from pyspark.sql import functions as F

    # NOTE: precomputing the per-turn md5 JVM-side (an extra `_m` column
    # into the state op) was measured SLOWER end-to-end — the 32 B/row of
    # extra Arrow traffic costs more than the Python md5 it saves; the
    # state fn still honors `_m` if a caller provides it.
    bucketed = stream.withColumn(
        "_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )
    return (
        bucketed.withWatermark("ts", watermark)
        .groupBy("_bucket")
        .applyInPandasWithState(
            _bucket_processor(session_gap_ms),
            OUTPUT_SCHEMA,
            BUCKET_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
