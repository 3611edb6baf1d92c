"""spark-submit job entry points, driven as black-box subprocesses
(the local twin of `spark-submit jobs/...` — same argv surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_run_dedup_job_once(spark, tmp_path):
    """--once drains the staged chunks, prints the lineage JSON line,
    leaves a committed kept table, and --compact-every folds the index."""
    from arion_spark.streaming.dedup import write_doc_chunks

    corpus = spark.createDataFrame(
        [(i, " ".join(f"tok{i}x{j}" for j in range(25))) for i in range(24)]
        + [(1000 + i, " ".join(f"tok{i}x{j}" for j in range(20))) for i in range(6)],
        "doc_id long, text string",
    )
    replay = str(tmp_path / "replay")
    write_doc_chunks(corpus, replay, n_chunks=2)

    env = dict(os.environ, PYTHONPATH=str(ROOT))
    p = subprocess.run(
        [
            sys.executable,
            str(ROOT / "jobs" / "run_dedup.py"),
            "--input", replay,
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--once",
            "--compact-every", "1",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=ROOT,
        env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    line = json.loads(p.stdout.strip().splitlines()[-1])
    assert line["batches"] == 2 and line["n_in"] == 30
    assert line["n_kept"] + line["n_dropped"] == 30
    # near-dup mutants (1000+) were dropped against their originals
    assert line["n_dropped"] >= 6
    # compaction ran: bases exist, folded batch dirs vacuumed
    assert os.path.isdir(tmp_path / "out" / "buckets_base")
    assert not any(  # vacuum after the final compact removed every folded dir
        d.startswith("batch=") for d in os.listdir(tmp_path / "out" / "docs")
    )
    # kept table readable by the guard API
    from arion_spark.streaming.dedup import DedupGuard

    g = DedupGuard(str(tmp_path / "out"))
    kept = {r["doc_id"] for r in g.read_kept(spark).collect()}
    assert len(kept) == line["n_kept"] and all(k < 1000 for k in kept)


def test_run_batch_job_multiformat_input(spark, tmp_path):
    """run_batch accepts a JSONL input URL (arion_spark.sources
    resolution) and produces the same chain output as a parquet input
    of the same corpus."""
    import sys as _sys

    from datetime import datetime, timedelta

    from arion_spark import sources
    from arion_spark.transcripts import TRANSCRIPT_SCHEMA

    _sys.path.insert(0, str(ROOT / "jobs"))
    import run_batch

    t0 = datetime(2024, 1, 1)
    rows = [
        ("c1", i, "user", f"turn text {i}", None, t0 + timedelta(minutes=i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    sources.write_transcripts(df, f"json:{tmp_path}/in_json")
    df.write.mode("overwrite").parquet(f"{tmp_path}/in_parquet")

    spec = json.dumps(
        {"operations": [{"type": "fingerprint", "params": {"type": "md5"}}]}
    )
    assert run_batch.main([
        "--spec", spec,
        "--input", f"json:{tmp_path}/in_json",
        "--output", f"{tmp_path}/out_json",
    ]) == 0
    assert run_batch.main([
        "--spec", spec,
        "--input", f"{tmp_path}/in_parquet",
        "--output", f"{tmp_path}/out_parquet",
    ]) == 0
    a = spark.read.parquet(f"{tmp_path}/out_json")
    b = spark.read.parquet(f"{tmp_path}/out_parquet")
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    cols = sorted(set(a.columns) & set(b.columns))
    ra = sorted(a.select(*cols).collect(), key=key)
    rb = sorted(b.select(*cols).collect(), key=key)
    assert ra == rb and len(ra) == 6


def test_run_dedup_job_maintains_clusters(spark, tmp_path):
    """--maintain-clusters deploys the ClusterMaintainer: same argv
    surface, and the committed cluster map equals batch CC semantics
    (mutants labeled by their originals, canonical flags consistent)."""
    from arion_spark.streaming.dedup import write_doc_chunks

    corpus = spark.createDataFrame(
        [(i, " ".join(f"tok{i}x{j}" for j in range(25))) for i in range(24)]
        + [(1000 + i, " ".join(f"tok{i}x{j}" for j in range(20))) for i in range(6)],
        "doc_id long, text string",
    )
    replay = str(tmp_path / "replay")
    write_doc_chunks(corpus, replay, n_chunks=2)

    env = dict(os.environ, PYTHONPATH=str(ROOT))
    p = subprocess.run(
        [
            sys.executable,
            str(ROOT / "jobs" / "run_dedup.py"),
            "--input", replay,
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--once",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=ROOT,
        env=env,
    )
    # the plain run above exercises the default path; now the cluster run
    p2 = subprocess.run(
        [
            sys.executable,
            str(ROOT / "jobs" / "run_dedup.py"),
            "--input", replay,
            "--output", str(tmp_path / "out2"),
            "--checkpoint", str(tmp_path / "ckpt2"),
            "--once",
            "--maintain-clusters",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=ROOT,
        env=env,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    assert p2.returncode == 0, p2.stderr[-3000:]

    from arion_spark.streaming.clusters import ClusterMaintainer

    m = ClusterMaintainer(str(tmp_path / "out2"))
    rows = m.read_clusters(spark).collect()
    labels = {r.doc_id: r.cluster_id for r in rows}
    assert len(labels) == 30  # every doc is in the map (gates forced off)
    for i in range(6):
        assert labels[1000 + i] == labels[i] == i  # mutant joins original
    assert all(
        r.is_canonical == (r.cluster_id == r.doc_id) for r in rows
    )
