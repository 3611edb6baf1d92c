"""One-shot CLI contract tests (subprocess, black-box) — the analog of
the reference's functional suite shelling out to the binary per case
(reference: tests/functional/test.py:35-54, negative tests
:1122-1161, main contract src/main.cpp:75-132)."""

from __future__ import annotations

import json
import subprocess
import sys


def run_cli(*args: str) -> tuple[int, str, str]:
    p = subprocess.run(
        [sys.executable, "-m", "arion_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    return p.returncode, p.stdout, p.stderr


def last_json(stdout: str) -> dict:
    return json.loads(stdout.strip().splitlines()[-1])


def test_version_flag():
    rc, out, _ = run_cli("--version")
    doc = last_json(out)
    assert rc == 0 and set(doc) == {"version"}


def test_missing_input_shows_usage():
    rc, out, err = run_cli()
    assert rc == 1 and "input operations" in err


def test_malformed_json_is_error_doc():
    rc, out, _ = run_cli("--input", "{not json")
    doc = last_json(out)
    assert rc != 0 and doc["result"] is False and "error_message" in doc


def test_unknown_operation_type_is_error_doc():
    spec = json.dumps({"operations": [{"type": "rezize", "params": {}}]})
    rc, out, _ = run_cli("--input", spec)
    doc = last_json(out)
    assert rc != 0 and doc["result"] is False
    assert "rezize" in doc["error_message"]


def test_end_to_end_chain_and_failed_op(spark, transcripts_df, tmp_path):
    src = str(tmp_path / "in.parquet")
    transcripts_df.write.parquet(src)
    n = transcripts_df.count()

    spec = json.dumps(
        {
            "input_table": src,
            "operations": [
                {"type": "read_meta", "params": {}},
                {"type": "normalize", "params": {"width": 16, "type": "fill"}},
                {"type": "fingerprint", "params": {}},
            ],
        }
    )
    rc, out, _ = run_cli("--input", spec, "--cpus", "2")
    doc = last_json(out)
    assert rc == 0 and doc["result"] is True
    assert doc["rows"] == n
    assert [e["type"] for e in doc["info"]] == ["read_meta", "normalize", "fingerprint"]
    assert doc["failed_operations"] == 0

    # per-op logical failure: chain continues, doc reports it, exit != 0
    bad = json.dumps(
        {
            "input_table": src,
            "operations": [
                {"type": "normalize", "params": {"width": 0}},
                {"type": "fingerprint", "params": {}},
            ],
        }
    )
    rc2, out2, _ = run_cli("--input", bad, "--cpus", "2")
    doc2 = last_json(out2)
    assert rc2 != 0 and doc2["result"] is False
    assert doc2["failed_operations"] == 1
    assert doc2["info"][0]["result"] is False and doc2["info"][1]["result"] is True
