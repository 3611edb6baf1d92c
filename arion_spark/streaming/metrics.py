"""StreamingQueryListener metrics capture.

The reference emits ``total_operations`` / ``failed_operations`` counters
per invocation (reference: src/arion.cpp:816-830); the streaming analog is
query-progress telemetry: rows/sec, per-batch durations, p95 micro-batch
latency, state-store rows — captured per progress event and summarized
for BENCH reporting.
"""

from __future__ import annotations

import json
import math
import threading

from pyspark.sql.streaming import StreamingQueryListener


def _p95(xs: list[float]) -> float:
    if not xs:
        return float("nan")
    s = sorted(xs)
    k = max(0, math.ceil(0.95 * len(s)) - 1)
    return s[k]


class ProgressCapture(StreamingQueryListener):
    """Thread-safe accumulator of query progress events."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: list[dict] = []

    # -- listener callbacks ---------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        with self._lock:
            self.batches.append(
                {
                    "batch_id": p.get("batchId"),
                    "num_input_rows": p.get("numInputRows", 0),
                    "input_rows_per_sec": p.get("inputRowsPerSecond", 0.0),
                    "process_rows_per_sec": p.get("processedRowsPerSecond", 0.0),
                    "batch_duration_ms": (p.get("durationMs") or {}).get(
                        "triggerExecution", 0
                    ),
                    "state_rows": sum(
                        s.get("numRowsTotal", 0)
                        for s in p.get("stateOperators", [])
                    ),
                }
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- summary --------------------------------------------------------------

    def summary(self) -> dict:
        with self._lock:
            rows = [b for b in self.batches if b["num_input_rows"] > 0]
            durs = [b["batch_duration_ms"] for b in rows]
            total_rows = sum(b["num_input_rows"] for b in rows)
            total_ms = sum(durs)
        return {
            "n_batches": len(rows),
            "total_input_rows": total_rows,
            "rows_per_sec_overall": (
                total_rows / (total_ms / 1000.0) if total_ms else float("nan")
            ),
            "p95_batch_ms": _p95(durs),
            "max_state_rows": max((b["state_rows"] for b in rows), default=0),
        }
