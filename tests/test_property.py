"""Property-based tests: Spark expressions vs the pure-Python oracle.

Hypothesis generates adversarial text (unicode, whitespace runs, empty
strings) and parameter combinations; each example set is evaluated in
ONE Spark job (a generated DataFrame), so the per-example cost is a row,
not a session round trip.  These fuzz the exact geometry/fold/shingle
semantics the golden tests pin at fixed points (SURVEY.md §5.2 items
3-4; the reference's gravity grid is tests/functional/test.py:417-841).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from arion_spark import oracle
from arion_spark.functions import dedup
from arion_spark.operators import fingerprint as op_fp
from arion_spark.operators import normalize as op_norm

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters=" ,\t"
    ),
    max_size=80,
)

GRAVITIES = sorted(oracle.GRAVITY_POS)
TYPES = ["width", "height", "square", "fill"]

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


INTERPS = sorted(oracle.INTERPOLATIONS)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            TEXT,
            st.integers(1, 40),
            st.sampled_from(TYPES),
            st.sampled_from(GRAVITIES),
            st.sampled_from(INTERPS),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_geometry_expr_matches_oracle(spark, rows):
    df = spark.createDataFrame(
        [(i, t) for i, (t, w, ty, g, ip) in enumerate(rows)],
        "i long, text string",
    )
    def args(w, ty):
        # the spec requires the size on the axis the type scales by
        return (None, w) if ty == "height" else (w, None)

    cols = [
        op_norm.geometry_expr(F.col("text"), *args(w, ty), ty, g, ip).alias(f"out_{i}")
        for i, (t, w, ty, g, ip) in enumerate(rows)
    ]
    got = {r["i"]: r for r in df.select("i", *cols).collect()}
    for i, (t, w, ty, g, ip) in enumerate(rows):
        want = oracle.normalize_geometry(t, *args(w, ty), ty, g, ip)
        assert got[i][f"out_{i}"] == want, (i, t, w, ty, g, ip)


@settings(**_SETTINGS)
@given(
    texts=st.lists(TEXT, min_size=1, max_size=20),
    mark=st.text(
        alphabet=st.characters(codec="utf-8", categories=("L", "N", "P")),
        min_size=1,
        max_size=3,
    ),
    wm_type=st.sampled_from(["standard", "adaptive"]),
    amount=st.floats(0.01, 1.0),
    bounds=st.tuples(st.floats(0.0, 0.5), st.floats(0.5, 1.0)),
)
def test_watermark_udf_matches_oracle(spark, texts, mark, wm_type, amount, bounds):
    mn, mx = bounds
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    wm = op_norm.watermark_udf(mark, wm_type, amount, mn, mx)
    got = {r.i: r.out for r in df.select("i", wm(F.col("text")).alias("out")).collect()}
    for i, t in enumerate(texts):
        want = oracle.watermark_text_op(t, mark, wm_type, amount, mn, mx)
        assert got[i] == want, (i, t, mark, wm_type, amount, mn, mx)


@settings(**_SETTINGS)
@given(texts=st.lists(TEXT, min_size=1, max_size=30))
def test_conversation_fold_matches_python(spark, texts):
    rows = [("c", i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = op_fp.conversation(df).collect()[0]

    fp = ""
    for t in texts:
        m = hashlib.md5(t.encode("utf-8")).hexdigest()
        fp = hashlib.md5((fp + m).encode("ascii")).hexdigest()
    assert got["conv_fp"] == fp and got["n_turns"] == len(texts)


@settings(**_SETTINGS)
@given(texts=st.lists(TEXT, min_size=1, max_size=15))
def test_minhash_matches_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: list(r.minhash) for r in dedup.with_minhash(df).collect()}
    for i, t in enumerate(texts):
        # engine tokenizer semantics: trim = ASCII space only, \s = ASCII
        # whitespace (Java regex + DuckDB RE2 agree; Python str.split is
        # unicode-aware and would diverge on e.g. '\xa0')
        import re

        s = t.strip(" ").lower()
        toks = [] if s == "" else re.split(r"\s+", s, flags=re.ASCII)
        sh = []
        for j in range(max(len(toks) - 1, 1)):
            sh.append(" ".join(toks[j : j + 2]))
        sh = list(dict.fromkeys(sh))
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
        want = [
            min((a * h + b) % dedup.MINHASH_P for h in hs)
            for a, b in dedup.MINHASH_AB
        ]
        assert got[i] == want, (i, t)


# --------------------------------------------------------------------------
# CEP NFA vs an independent brute-force matcher (pure Python, no NFA)


def _brute_force_default_pattern(roles: list[str]) -> list[tuple[int, int]]:
    """(start, end) of every user→tool+→assistant match, by the window
    definition: the next non-tool turn after the user is an assistant
    with ≥1 tool between — written WITHOUT the NFA to be an independent
    reference."""
    out = []
    for i, r in enumerate(roles):
        if r != "user":
            continue
        j = i + 1
        while j < len(roles) and roles[j] == "tool":
            j += 1
        if j < len(roles) and roles[j] == "assistant" and j > i + 1:
            out.append((i, j))
    return out


@given(
    st.lists(
        st.sampled_from(["user", "assistant", "tool", "system"]),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_cep_nfa_matches_brute_force(roles):
    from arion_spark.operators.cep import DEFAULT_PATTERN, _run_nfa, compile_pattern

    rows = [(i, r, float(i)) for i, r in enumerate(roles)]
    got = [(m[0], m[2]) for m in _run_nfa(compile_pattern(DEFAULT_PATTERN), rows)]
    assert got == _brute_force_default_pattern(roles)


def _brute_force_trailing_plus(roles: list[str]) -> list[tuple[int, int]]:
    """(start, end) of every maximal user→tool+ match — completes when the
    tool run breaks or the sequence ends; written WITHOUT the NFA."""
    out, i = [], 0
    while i < len(roles):
        if roles[i] == "user" and i + 1 < len(roles) and roles[i + 1] == "tool":
            j = i + 1
            while j + 1 < len(roles) and roles[j + 1] == "tool":
                j += 1
            out.append((i, j))
            i = j + 1  # the breaker itself may start a new partial
        else:
            i += 1
    return out


@given(
    st.lists(
        st.sampled_from(["user", "assistant", "tool", "system"]),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_cep_trailing_plus_matches_brute_force(roles):
    from arion_spark.operators.cep import _run_nfa, compile_pattern

    rows = [(i, r, float(i)) for i, r in enumerate(roles)]
    pat = compile_pattern([("user", "1"), ("tool", "+")])
    got = [(m[0], m[2]) for m in _run_nfa(pat, rows)]
    assert got == _brute_force_trailing_plus(roles)


# --------------------------------------------------------------------------
# KMV estimator vs a pure-Python computation of the identical recipe


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=1, max_size=300))
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_matches_python(spark, keys):
    from arion_spark.functions import sketch

    df = spark.createDataFrame([("g", k) for k in keys], "g string, k string")
    [r] = sketch.kmv_distinct(df, ["g"], F.col("k"), k=16).collect()

    us = sorted(
        {int(hashlib.md5(k.encode()).hexdigest()[:13], 16) / float(16**13)
         for k in keys}
    )
    kept = us[:16]
    est = float(len(kept)) if len(us) < 16 else 15.0 / kept[15]
    assert r["n_kept"] == len(kept)
    assert r["est"] == pytest.approx(round(est, 4))


def _brute_force_optional_tool(roles: list[str]) -> list[tuple[int, int]]:
    """(start, end) for user → tool? → assistant under the NFA's
    single-partial restart semantics (the row that kills a partial is
    retried as a fresh start) — written WITHOUT the NFA."""
    out, i = [], 0
    while i < len(roles):
        if roles[i] != "user":
            i += 1
            continue
        j = i + 1
        if j < len(roles) and roles[j] == "tool":
            j += 1
        if j < len(roles) and roles[j] == "assistant":
            out.append((i, j))
            i = j + 1
        elif j == len(roles):
            break
        else:
            i = j  # the killer row may itself start a new partial
    return out


@given(
    st.lists(
        st.sampled_from(["user", "assistant", "tool", "system"]),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_cep_optional_matches_brute_force(roles):
    from arion_spark.operators.cep import _run_nfa, compile_pattern

    rows = [(i, r, float(i)) for i, r in enumerate(roles)]
    pat = compile_pattern([("user", "1"), ("tool", "?"), ("assistant", "1")])
    got = [(m[0], m[2]) for m in _run_nfa(pat, rows)]
    assert got == _brute_force_optional_tool(roles)


def _brute_force_trailing_optional(roles: list[str]) -> list[tuple[int, int]]:
    """(start, end) for user → tool?: every user matches, greedily
    absorbing one following tool — written WITHOUT the NFA."""
    out, i = [], 0
    while i < len(roles):
        if roles[i] == "user":
            if i + 1 < len(roles) and roles[i + 1] == "tool":
                out.append((i, i + 1))
                i += 2
            else:
                out.append((i, i))
                i += 1
        else:
            i += 1
    return out


@given(
    st.lists(
        st.sampled_from(["user", "assistant", "tool", "system"]),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_cep_trailing_optional_matches_brute_force(roles):
    from arion_spark.operators.cep import _run_nfa, compile_pattern

    rows = [(i, r, float(i)) for i, r in enumerate(roles)]
    pat = compile_pattern([("user", "1"), ("tool", "?")])
    got = [(m[0], m[2]) for m in _run_nfa(pat, rows)]
    assert got == _brute_force_trailing_optional(roles)


def test_cep_plus_then_optional_suffix_completable():
    """A '+' run followed only by optionals is completable: the suffix
    may or may not be absorbed, breaks end the match at the last
    consumed row, and end-of-input flushes."""
    from arion_spark.operators.cep import _run_nfa, compile_pattern

    pat = compile_pattern([("user", "1"), ("tool", "+"), ("system", "?")])

    def run(roles):
        return [
            (m[0], m[2]) for m in _run_nfa(pat, [(i, r, float(i)) for i, r in enumerate(roles)])
        ]

    assert run(["user", "tool", "tool", "assistant"]) == [(0, 2)]  # break
    assert run(["user", "tool", "system"]) == [(0, 2)]  # optional absorbed
    assert run(["user", "tool"]) == [(0, 1)]  # end-of-input flush
    assert run(["user", "system"]) == []  # '+' never satisfied
    # optional absorbed, then the NEXT user starts a fresh partial
    assert run(["user", "tool", "system", "user", "tool"]) == [(0, 2), (3, 4)]
