"""Run every example chain against the sf0.001 fixture — the analog of
the reference's examples/examples.sh smoke script.

    python examples/run_examples.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from arion_spark import get_spark
    from arion_spark.plans.compiler import run_pipeline
    from arion_spark.transcripts import transcripts_from_events

    spark = get_spark("examples", cpus=8)
    df = transcripts_from_events(spark, sf_dir)
    here = os.path.dirname(os.path.abspath(__file__))
    rc = 0
    for path in sorted(glob.glob(f"{here}/*.json")):
        with open(path) as f:
            spec = json.load(f)
        out = run_pipeline(spark, spec, df)
        head = out.select("result", "total_operations", "failed_operations").head()
        ok = head["failed_operations"] == 0
        print(
            f"{'ok  ' if ok else 'FAIL'} {os.path.basename(path)}: "
            f"rows={out.count()} ops={head['total_operations']} "
            f"failed={head['failed_operations']}"
        )
        rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
