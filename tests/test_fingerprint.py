"""Fingerprint golden tests — per-turn MD5 and the ordered rolling
conversation fold, checked against hashlib (the analog of the reference's
exact-golden pixel-MD5 test, tests/functional/test.py:1165-1180)."""

from __future__ import annotations

import collections
import random

from arion_spark import oracle
from arion_spark.operators import fingerprint as op_fp
from arion_spark.transcripts import TRANSCRIPT_SCHEMA


def _by_conv(rows):
    convs = collections.defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(r)
    for c in convs.values():
        c.sort(key=lambda r: r["turn_idx"])
    return convs


def test_per_turn_md5(spark, transcripts_df, fixture_rows):
    got = {
        (r.conv_id, r.turn_idx): r.turn_md5
        for r in op_fp.per_turn(transcripts_df).collect()
    }
    for r in fixture_rows:
        assert got[(r["conv_id"], r["turn_idx"])] == oracle.turn_md5(r["text"])


def test_conversation_fold_golden(spark, transcripts_df, fixture_rows):
    got = {r.conv_id: r.conv_fp for r in op_fp.conversation(transcripts_df).collect()}
    for conv, rows in _by_conv(fixture_rows).items():
        assert got[conv] == oracle.conv_fingerprint([r["text"] for r in rows])


def test_fold_is_arrival_order_invariant(spark, fixture_rows):
    """Shuffled input rows → identical conversation fingerprint (the
    orientation-canonicalization invariant transposed to turn order)."""
    shuffled = list(fixture_rows)
    random.Random(7).shuffle(shuffled)
    df = spark.createDataFrame(shuffled, schema=TRANSCRIPT_SCHEMA)
    got = {r.conv_id: r.conv_fp for r in op_fp.conversation(df).collect()}
    for conv, rows in _by_conv(fixture_rows).items():
        assert got[conv] == oracle.conv_fingerprint([r["text"] for r in rows])


def test_rolling_prefix_matches_conversation_final(spark, transcripts_df):
    rolled = op_fp.rolling(transcripts_df)
    last = {
        r.conv_id: r.conv_fp
        for r in rolled.orderBy("conv_id", "turn_idx").collect()
    }  # dict keeps the max-turn_idx row per conv
    conv = {r.conv_id: r.conv_fp for r in op_fp.conversation(transcripts_df).collect()}
    assert last == conv


def test_fold_sensitivity_to_order(spark):
    """Swapping two turns must change the fingerprint (ordered fold, not a
    bag hash)."""
    a = oracle.conv_fingerprint(["x", "y"])
    b = oracle.conv_fingerprint(["y", "x"])
    assert a != b
