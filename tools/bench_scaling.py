"""Scaling-efficiency evidence: the same job at two parallelism levels.

The north rule requires ≥0.8 throughput scaling efficiency between N and
4N executors at cluster scale.  No real cluster exists in this sandbox,
so (per the task brief) we evidence it by running the identical job at
``local[8]`` and ``local[32]`` on the same pre-materialized input and
reporting throughput at both plus ``efficiency = tp_32 / (4 × tp_8)``.

Two jobs are measured:
  * **batch**: the full operation chain (read_meta → normalize →
    per-turn md5 → rolling conversation fold) over the prepared
    transcript parquet, executed into a noop sink.  One wide shuffle
    (conv_id window), everything else narrow JVM codegen.
  * **streaming**: the north-rule pipeline (watermark → ordered-fold
    state → stateless chain → exactly-once MERGE sink) replaying the
    same rows as timestamp-ordered micro-batches.

Each measurement runs in a SUBPROCESS so every parallelism level gets a
fresh JVM (no executor-thread reuse across levels).  Usage::

    python tools/bench_scaling.py                 # full matrix → JSON
    python tools/bench_scaling.py --child batch 8 /path  # one cell
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", "1600000"))
#: the batch chain is ~20x lighter per row than the stateful stream;
#: give it proportionally more rows so compute (not fixed cost) is measured
BATCH_TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_BATCH_TURNS", str(TURNS * 3)))
#: best-of-N per cell: the sandbox host shows intermittent multi-second
#: stalls (proactive memory reclaim) that poison single-shot walls; the
#: minimum wall measures the engine, not the host
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
LEVELS = (8, 32)


def prepare(work: str, turns: int) -> None:
    """Materialize the input once: flat parquet + replay chunks."""
    from arion_spark import get_spark
    from arion_spark.streaming.source import write_replay_chunks
    from arion_spark.transcripts import generate_transcripts

    spark = get_spark("scaling_prepare", cpus=32)
    df = generate_transcripts(spark, turns)
    generate_transcripts(spark, BATCH_TURNS).write.mode("overwrite").parquet(
        f"{work}/flat"
    )
    # multi-file chunks: the per-batch scan stage must parallelize
    # (single-file chunks = one-task scan = serial floor; see source.py)
    write_replay_chunks(df, f"{work}/replay", n_chunks=4, files_per_chunk=32)
    write_replay_chunks(
        generate_transcripts(spark, 2000), f"{work}/warm_replay", n_chunks=1
    )
    spark.stop()


def run_batch(cpus: int, work: str) -> float:
    from pyspark.sql import functions as F

    from arion_spark import get_spark
    from arion_spark.operators import fingerprint as op_fp
    from arion_spark.operators import normalize as op_norm
    from arion_spark.operators import read_meta as op_meta

    spark = get_spark(f"scaling_batch_{cpus}", cpus=cpus)
    df = spark.read.parquet(f"{work}/flat")

    def job(frame):
        out = op_meta.extract(frame)
        out = op_norm.apply(out, {"width": 64, "type": "fill", "gravity": "center"})
        out = op_fp.per_turn(out)
        out = op_fp.rolling(out)
        out.write.format("noop").mode("overwrite").save()

    # warmup: identical plan over a tiny slice spread across all cores —
    # pays codegen compile + forks every Python worker outside the timed
    # region (steady-state throughput is the metric, not cold start)
    job(df.limit(2000).repartition(cpus))

    wall = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        job(df)
        wall = min(wall, time.perf_counter() - t0)
    spark.stop()
    return wall


def run_streaming(cpus: int, work: str) -> float:
    from arion_spark import get_spark
    from arion_spark.streaming.pipeline import run_stream_pipeline

    spark = get_spark(f"scaling_stream_{cpus}", cpus=cpus)
    spec = {
        "operations": [
            {"type": "read_meta", "params": {"info": True}},
            {"type": "normalize", "params": {"width": 64, "type": "fill", "gravity": "center"}},
            {"type": "fingerprint", "params": {"type": "md5"}},
        ]
    }
    out = tempfile.mkdtemp(prefix=f"scaling_out_{cpus}_")
    # warmup query: same plan on a tiny replay — codegen + Python worker
    # forks + state-store init happen outside the timed region
    wq, _ = run_stream_pipeline(
        spark, spec, f"{work}/warm_replay", f"{out}/warm_table", f"{out}/warm_ckpt",
        watermark="10 minutes",
    )
    wq.processAllAvailable()
    wq.stop()

    wall = float("inf")
    for rep in range(max(REPEATS - 1, 1)):
        t0 = time.perf_counter()
        query, _sink = run_stream_pipeline(
            spark, spec, f"{work}/replay", f"{out}/table_{rep}", f"{out}/ckpt_{rep}",
            watermark="10 minutes", max_files_per_trigger=32,
        )
        query.processAllAvailable()
        query.stop()
        wall = min(wall, time.perf_counter() - t0)
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return wall


def child(mode: str, cpus: int, work: str) -> None:
    if mode == "prepare":
        prepare(work, TURNS)
        print(json.dumps({"prepared": TURNS}))
        return
    wall = run_batch(cpus, work) if mode == "batch" else run_streaming(cpus, work)
    n = BATCH_TURNS if mode == "batch" else TURNS
    print(json.dumps({"mode": mode, "cpus": cpus, "wall_sec": round(wall, 3),
                      "turns": n, "turns_per_sec": round(n / wall, 1)}))


def spawn(mode: str, cpus: int, work: str) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", mode, str(cpus), work],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if r.returncode != 0:
        raise RuntimeError(f"{mode}@{cpus} failed:\n{r.stderr[-4000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return

    work = tempfile.mkdtemp(prefix="arion_scaling_")
    try:
        spawn("prepare", 0, work)
        result: dict = {"turns": TURNS, "levels": list(LEVELS), "jobs": {}}
        for mode in ("batch", "streaming"):
            cells = {c: spawn(mode, c, work) for c in LEVELS}
            tp = {c: cells[c]["turns_per_sec"] for c in LEVELS}
            eff = tp[LEVELS[1]] / ((LEVELS[1] / LEVELS[0]) * tp[LEVELS[0]])
            result["jobs"][mode] = {
                f"local[{c}]": cells[c] for c in LEVELS
            } | {"scaling_efficiency": round(eff, 3)}
            print(f"# {mode}: tp@8={tp[8]}/s tp@32={tp[32]}/s eff={eff:.3f}",
                  file=sys.stderr)
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
