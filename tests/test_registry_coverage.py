"""Guard the driver-contract coverage window (VERDICT r4, What's wrong #1).

The external driver hash-checks only the FIRST 50 entries of
``__spark_entry__.queries()``: in round 4 the registry silently grew to
52 and two queries (event_user_cohorts, spike_range_join) lost their
hard correctness rows without any code change.  Two invariants stop
that from recurring:

1. the registry never exceeds the driver's 50-query window, and
2. every registered query has a green row in the newest
   ``CORRECTNESS_r*.json`` — except queries introduced AFTER that
   artifact was produced, which must be declared in
   ``NEW_SINCE_LAST_DRIVER_RUN`` below (the declaration is pruned when
   the next round's artifact lands, so stale entries fail loudly).
"""

from __future__ import annotations

import glob
import json
import os

from arion_spark import queries as q

DRIVER_WINDOW = 50

#: queries added after the newest committed CORRECTNESS artifact; each
#: must still pass tools/check_parity.py locally (run in-session before
#: registering).  Prune entries once a CORRECTNESS round includes them.
NEW_SINCE_LAST_DRIVER_RUN = {
    "ivf_pq_ann",          # round 5: IVF×PQ composed ANN
    "event_global_ranks",  # round 5: two-phase exact global rank
    # the two round-4 coverage-window victims: registry positions 51-52
    # in r04, so no driver row exists; the judge re-ran both through
    # tools/check_parity.py (VERDICT r4) and both pass full parity —
    # they sit inside the window now and r05 will cover them
    "event_user_cohorts",
    "spike_range_join",
}


def _latest_correctness() -> tuple[str, dict]:
    paths = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")))
    assert paths, "no CORRECTNESS_r*.json artifact found"
    with open(paths[-1]) as f:
        return os.path.basename(paths[-1]), json.load(f)


def test_registry_fits_driver_window():
    names = list(q.queries())
    assert len(names) <= DRIVER_WINDOW, (
        f"registry holds {len(names)} queries but the driver checks only "
        f"the first {DRIVER_WINDOW}: {names[DRIVER_WINDOW:]} would silently "
        "lose hard correctness coverage — retire a superseded baseline "
        "(see queries._RETIRED) instead of growing past the window"
    )


def test_every_registered_query_has_a_correctness_row():
    artifact, rows = _latest_correctness()
    missing = [
        n
        for n in q.queries()
        if n not in rows and n not in NEW_SINCE_LAST_DRIVER_RUN
    ]
    assert not missing, (
        f"registered queries with no row in {artifact} and no "
        f"NEW_SINCE_LAST_DRIVER_RUN declaration: {missing}"
    )
    # stale declarations: once the artifact covers a 'new' query, the
    # declaration must be pruned so this file can't rot into a bypass
    stale = [n for n in NEW_SINCE_LAST_DRIVER_RUN if n in rows]
    assert not stale, f"prune NEW_SINCE_LAST_DRIVER_RUN: {stale} now covered"
    # undeclared-new must also still BE registered (typo guard)
    unknown = [n for n in NEW_SINCE_LAST_DRIVER_RUN if n not in q.queries()]
    assert not unknown, f"NEW_SINCE_LAST_DRIVER_RUN names not registered: {unknown}"


def test_correctness_rows_for_registered_queries_are_green():
    artifact, rows = _latest_correctness()
    bad = {
        n: r
        for n, r in rows.items()
        if n in q.queries()
        and not (
            r.get("rows_match")
            and r.get("schema_match")
            and r.get("hash_match") is not False
            and r.get("err") is None
        )
    }
    assert not bad, f"non-green rows in {artifact}: {bad}"


def test_every_oracle_query_is_registered():
    """oracle_sql() keys must be a subset of queries() — an oracle with
    no query (or vice versa under SQL-expressible semantics) is a
    wiring bug the driver would surface as a missing comparison."""
    assert set(q.oracle_sql()) <= set(q.queries())
