"""Structured Streaming layer: the CEP re-imagining of the reference's
per-invocation operation chain (north rule, BASELINE.json).

Modules:
  source   — deterministic file-replay stream source
  stateful — per-conversation ordered-fold state (applyInPandasWithState)
  windows  — tumbling / sliding / session window aggregates + salted skew agg
  join     — watermark-bounded stream-stream interval join
  sink     — exactly-once foreachBatch MERGE sink (parquet + commit log)
  metrics  — StreamingQueryListener capture (throughput, p95 batch latency)
  pipeline — wires the operation chain into readStream → state → sink
"""
