"""Holistic physical-plan guard over the ENTIRE query registry.

The cosine_near_dup incident (a silent O(N²) BroadcastNestedLoopJoin
behind a passing correctness gate) motivates this: every registered
query's physical plan is asserted free of the two joins that stop
scaling — BroadcastNestedLoopJoin and CartesianProduct — except where
the broadcast nested loop IS the design (exact brute-force baselines and
tiny broadcast centroid/query tables, whitelisted below with reasons).

Plans are built against sf0.001 without executing (sparkPlan, pre-AQE),
so the whole registry checks in seconds.
"""

from __future__ import annotations

import pytest

from arion_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"

#: queries whose broadcast nested-loop is intentional: the broadcast side
#: is a tiny constant-size table (query set / centroid table), so the
#: "loop" is O(N·k) with k ≤ a few dozen — the correct exact baseline
#: shape, not an accident.
BNLJ_OK = {
    "ann_topk",        # exact brute-force baseline: corpus × broadcast queries
    "ivf_ann",         # broadcast centroid assignment (4 rows)
    "ivf_kmeans_ann",  # ditto, trained centroids
    "ivf_probe_ann",   # ditto, multi-probe
    "srp_ann",         # broadcast query-side bucket table
    "pq_ann",          # ADC scan: codes × broadcast tiny query set
}


@pytest.mark.parametrize("name", sorted(q.queries()))
def test_no_accidental_quadratic_join(spark, name):
    df = q.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct in plan"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — quadratic join "
            "sneaked in"
        )


def test_chain_queries_prune_scan_columns(spark):
    """Column pruning reaches the parquet scan (SURVEY §2 S6): a
    metadata-only projection over events must not read the full row."""
    from arion_spark.transcripts import transcripts_from_events
    from pyspark.sql import functions as F

    t = transcripts_from_events(spark, SF_DIR).select("conv_id", "turn_idx")
    plan = t._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, "no parquet scan with ReadSchema found"
    # transcripts derive from (user_id, ts, event_id [+ text columns for
    # role/turn derivation]); a projection to ids must drop props/event_type
    assert "props" not in scan[0].split("ReadSchema")[1]


def test_cohort_analytics_has_no_global_window(spark):
    """The scale-safe population analytics must not funnel the whole
    user population through one task: every WindowExec in its plan is
    partitioned (the global variant q_event_user_analytics keeps its
    documented single-task contract and is exempt)."""
    df = q.queries()["event_user_cohorts"](spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "Window" in plan  # the ranking is really a window
    for ln in plan.splitlines():
        if "Window" in ln:
            assert "No Partition Defined" not in ln
    # Spark renders unpartitioned windows with an empty partition spec;
    # assert the cohort key is in every window's partition clause
    import re

    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        assert "cohort" in m.group(0)
