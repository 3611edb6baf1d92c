"""Edge-case semantics for asof_join, CEP pattern detection and the
rollup cascade (the parity harness covers the bulk statistics; these pin
the boundary behaviors the hash can't isolate)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from arion_spark.operators import asof, cep, rollup
from arion_spark.transcripts import TRANSCRIPT_SCHEMA

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ts(s: float) -> datetime:
    return T0 + timedelta(seconds=s)


def _df(spark, rows):
    return spark.createDataFrame(
        [("c1", i, role, f"t{i}", None, _ts(sec)) for i, (role, sec) in enumerate(rows)],
        schema=TRANSCRIPT_SCHEMA,
    )


def _asof(spark, rows, **kw):
    t = _df(spark, rows)
    u = t.where(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    a = t.where(F.col("role") == "assistant").select("conv_id", "turn_idx", "ts")
    out = asof.asof_join(
        u, a, on="conv_id", ts="ts", ord_col="turn_idx",
        payload_cols=("turn_idx",), **kw,
    )
    return {r["turn_idx"]: r["asof_turn_idx"] for r in out.collect()}


class TestAsofJoin:
    def test_backward_picks_latest_at_or_before(self, spark):
        m = _asof(spark, [("assistant", 0), ("assistant", 10), ("user", 20)])
        assert m == {2: 1}

    def test_equal_ts_is_a_match(self, spark):
        # at-or-before includes ties: assistant at the same instant matches
        m = _asof(spark, [("assistant", 5), ("user", 5)])
        assert m == {1: 0}

    def test_equal_ts_tie_broken_by_ord_max(self, spark):
        # two assistant turns at the same ts: the max-ord one wins
        m = _asof(spark, [("assistant", 5), ("assistant", 5), ("user", 5)])
        assert m == {2: 1}

    def test_no_preceding_row_is_null(self, spark):
        m = _asof(spark, [("user", 0), ("assistant", 10)])
        assert m == {0: None}

    def test_tolerance_nulls_stale_match(self, spark):
        m = _asof(
            spark,
            [("assistant", 0), ("user", 30), ("user", 4000)],
            tolerance_s=3600,
        )
        assert m == {1: 0, 2: None}  # 4000 s > 1 h → no match

    def test_forward_picks_earliest_at_or_after(self, spark):
        m = _asof(
            spark,
            [("user", 0), ("assistant", 10), ("assistant", 20)],
            direction="forward",
        )
        assert m == {0: 1}

    def test_forward_equal_ts_tie_broken_by_ord_min(self, spark):
        m = _asof(
            spark,
            [("user", 5), ("assistant", 5), ("assistant", 5)],
            direction="forward",
        )
        assert m == {0: 1}

    def test_left_columns_pass_through(self, spark):
        t = _df(spark, [("assistant", 0), ("user", 1)])
        u = t.where(F.col("role") == "user")
        a = t.where(F.col("role") == "assistant").select("conv_id", "turn_idx", "ts")
        out = asof.asof_join(u, a, on="conv_id", payload_cols=("turn_idx",))
        assert set(out.columns) == set(u.columns) | {"asof_ts", "asof_turn_idx"}
        assert out.count() == 1

    def test_bad_direction_raises(self, spark):
        t = _df(spark, [("user", 0)])
        with pytest.raises(ValueError):
            asof.asof_join(t, t, on="conv_id", direction="sideways")


class TestCepPattern:
    def _match(self, spark, roles):
        t = _df(spark, [(r, 10.0 * i) for i, r in enumerate(roles)])
        return [
            (r["user_turn_idx"], r["n_tools"], r["resp_turn_idx"])
            for r in cep.detect_user_tools_assistant(t)
                     .orderBy("user_turn_idx").collect()
        ]

    def test_single_tool_run(self, spark):
        assert self._match(spark, ["user", "tool", "assistant"]) == [(0, 1, 2)]

    def test_multi_tool_run_is_maximal(self, spark):
        got = self._match(spark, ["user", "tool", "tool", "tool", "assistant"])
        assert got == [(0, 3, 4)]

    def test_direct_answer_no_match(self, spark):
        # user → assistant with no tool between is NOT the pattern
        assert self._match(spark, ["user", "assistant"]) == []

    def test_run_ending_in_user_no_match(self, spark):
        assert self._match(spark, ["user", "tool", "user"]) == []

    def test_trailing_tools_unterminated_no_match(self, spark):
        assert self._match(spark, ["user", "tool", "tool"]) == []

    def test_two_matches_in_one_conversation(self, spark):
        got = self._match(
            spark,
            ["user", "tool", "assistant", "user", "tool", "tool", "assistant"],
        )
        assert got == [(0, 1, 2), (3, 2, 6)]

    def test_latency_fractional_seconds(self, spark):
        t = _df(spark, [("user", 0.25), ("tool", 1.0), ("assistant", 2.75)])
        [r] = cep.detect_user_tools_assistant(t).collect()
        assert r["latency_s"] == pytest.approx(2.5)


class TestRollupCascade:
    def test_reagg_equals_from_scratch(self, spark):
        # 90 turns spread over ~3 h: the cascade's hour/day rows (built
        # from the minute aggregate) must equal direct aggregation.
        t = _df(spark, [("user" if i % 3 else "tool", i * 127.0) for i in range(90)])
        got = rollup.cascade(t)
        for unit in ("hour", "day"):
            cascade_rows = {
                r["bucket_ts"]: (r["n_turns"], r["n_user_turns"],
                                 r["sum_chars"], r["max_text_len"])
                for r in got.where(F.col("grain") == unit).collect()
            }
            direct = {
                r["bucket_ts"]: (r["n_turns"], r["n_user_turns"],
                                 r["sum_chars"], r["max_text_len"])
                for r in t.groupBy(F.date_trunc(unit, "ts").alias("bucket_ts"))
                .agg(
                    F.count(F.lit(1)).alias("n_turns"),
                    F.sum((F.col("role") == "user").cast("bigint"))
                     .alias("n_user_turns"),
                    F.sum(F.length("text").cast("bigint")).alias("sum_chars"),
                    F.max(F.length("text")).alias("max_text_len"),
                )
                .collect()
            }
            assert cascade_rows == direct

    def test_raw_table_scanned_once(self, spark):
        # hour/day grains must hang off the minute aggregate, not rescan
        # the base relation: the plan contains exactly one base-side scan
        # per union branch *below* one aggregate, i.e. the hour branch's
        # plan re-aggregates and contains two Aggregate nodes.
        t = _df(spark, [("user", i * 60.0) for i in range(10)])
        out = rollup.cascade(t)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # 3 branches × their aggregate chains: minute=1, hour=2, day=3 Aggregates
        assert plan.count("Aggregate") == 6
        # and at runtime the shared minute shuffle is computed ONCE — the
        # hour/day branches read a ReusedExchange of it
        out.collect()
        executed = out._jdf.queryExecution().executedPlan().toString()
        assert executed.count("ReusedExchange") >= 2


class TestKmvSketch:
    def test_exact_below_k(self, spark):
        from arion_spark.functions import sketch

        df = spark.createDataFrame(
            [("g", f"key-{i % 10}") for i in range(100)], "g string, k string"
        )
        [r] = sketch.kmv_distinct(df, ["g"], F.col("k"), k=64).collect()
        assert (r["n_kept"], r["est"]) == (10, 10.0)

    def test_estimate_accuracy_at_1000_keys(self, spark):
        # deterministic md5 hash → the estimate is a fixed number; assert
        # it lands within the ~3/sqrt(k) ≈ 37% KMV error envelope
        from arion_spark.functions import sketch

        df = spark.createDataFrame(
            [("g", f"key-{i}") for i in range(1000)], "g string, k string"
        )
        [r] = sketch.kmv_distinct(df, ["g"], F.col("k"), k=64).collect()
        assert r["n_kept"] == 64
        assert 630 <= r["est"] <= 1370

    def test_sketch_is_mergeable(self, spark):
        # KMV(A ∪ B) == k-smallest of (KMV(A) ∪ KMV(B)): computing the
        # sketch over the union equals merging per-half sketches
        from arion_spark.functions import sketch

        half_a = [("g", f"key-{i}") for i in range(500)]
        half_b = [("g", f"key-{i}") for i in range(300, 800)]  # overlap
        schema = "g string, k string"
        union = spark.createDataFrame(half_a + half_b, schema)
        [direct] = sketch.kmv_distinct(union, ["g"], F.col("k"), k=64).collect()

        hashes = lambda rows: sorted(
            r["_u"]
            for r in spark.createDataFrame(rows, schema)
            .select(sketch.uniform_hash(F.col("k")).alias("_u"))
            .distinct()
            .collect()
        )[:64]
        merged = sorted(set(hashes(half_a)) | set(hashes(half_b)))[:64]
        est_merged = round(63.0 / merged[63], 4)
        assert est_merged == direct["est"]


class TestTopkTerms:
    """functions.sketch.topk_terms_* — the heavy-hitters summary."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, t string")

    def test_one_shot_exact_ranking(self, spark):
        from arion_spark.functions import sketch

        rows = [("g", w) for w in
                ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1]
        out = sorted(
            (r["rank"], r["term"], r["n"])
            for r in sketch.topk_terms(
                self._df(spark, rows), ["g"], F.col("t"), k=3
            ).collect()
        )
        # ties (b, c) broken by term asc
        assert out == [(1, "a", 5), (2, "b", 3), (3, "c", 3)]

    def test_merge_exact_when_k_covers_vocab(self, spark):
        from arion_spark.functions import sketch

        half_a = [("g", f"w{i % 7}") for i in range(100)]
        half_b = [("g", f"w{(i + 3) % 7}") for i in range(60)]
        direct = {
            (r["term"]): r["n"]
            for r in sketch.topk_terms(
                self._df(spark, half_a + half_b), ["g"], F.col("t"), k=7
            ).collect()
        }
        pa = sketch.topk_terms_partial(self._df(spark, half_a), ["g"], F.col("t"), k=7)
        pb = sketch.topk_terms_partial(self._df(spark, half_b), ["g"], F.col("t"), k=7)
        merged = {
            r["_term"]: r["_n"]
            for r in sketch.topk_terms_merge(pa, pb, ["g"], k=7).collect()
        }
        assert merged == direct

    def test_undersized_k_gives_lower_bounds(self, spark):
        from arion_spark.functions import sketch

        # 'a' heavy everywhere; 'x' appears only in half_b's tail
        half_a = [("g", w) for w in ["a"] * 10 + ["b"] * 5 + ["c"] * 2]
        half_b = [("g", w) for w in ["a"] * 10 + ["x"] * 4 + ["b"] * 1]
        pa = sketch.topk_terms_partial(self._df(spark, half_a), ["g"], F.col("t"), k=2)
        pb = sketch.topk_terms_partial(self._df(spark, half_b), ["g"], F.col("t"), k=2)
        merged = {
            r["_term"]: r["_n"]
            for r in sketch.topk_terms_merge(pa, pb, ["g"], k=2).collect()
        }
        exact = {"a": 20, "b": 6, "c": 2, "x": 4}
        assert set(merged) <= set(exact)
        for term, n in merged.items():
            assert n <= exact[term]  # truncated-merge counts are lower bounds
        assert merged["a"] == 20  # a term kept in EVERY partial stays exact


class TestGenericPattern:
    """operators.cep.match_pattern — the generic NFA operator — must
    agree with the window-expression fast path on the default pattern
    and handle arbitrary (role, quantifier) sequences."""

    def test_default_pattern_equals_window_form(self, spark):
        roles = [
            "user", "tool", "assistant", "user", "assistant",
            "user", "tool", "tool", "assistant", "system",
            "user", "tool", "user", "tool", "tool", "assistant",
        ]
        t = _df(spark, [(r, 10.0 * i) for i, r in enumerate(roles)])
        nfa = {
            (r["conv_id"], r["start_turn_idx"]): (r["end_turn_idx"], r["n_turns"])
            for r in cep.match_pattern(t).collect()
        }
        win = {
            (r["conv_id"], r["user_turn_idx"]): (
                r["resp_turn_idx"], r["resp_turn_idx"] - r["user_turn_idx"] + 1
            )
            for r in cep.detect_user_tools_assistant(t).collect()
        }
        assert nfa == win and nfa  # identical and non-empty

    def test_alternate_pattern(self, spark):
        # tool+ -> system: fires at the system turn closing a tool run
        roles = ["tool", "tool", "system", "user", "tool", "user", "system"]
        t = _df(spark, [(r, 10.0 * i) for i, r in enumerate(roles)])
        got = [
            (r["start_turn_idx"], r["end_turn_idx"])
            for r in cep.match_pattern(t, [("tool", "+"), ("system", "1")])
                     .orderBy("start_turn_idx").collect()
        ]
        assert got == [(0, 2)]  # the (4 tool, 5 user) run is broken

    def test_single_element_pattern(self, spark):
        roles = ["user", "assistant", "assistant"]
        t = _df(spark, [(r, 10.0 * i) for i, r in enumerate(roles)])
        got = [
            r["start_turn_idx"]
            for r in cep.match_pattern(t, [("assistant", "1")])
                     .orderBy("start_turn_idx").collect()
        ]
        assert got == [1, 2]

    def test_trailing_plus_completes_on_break(self, spark):
        # user -> tool+ : the tool run is maximal; the breaking assistant
        # turn ends the match (excluded) — previously emitted zero matches
        roles = ["user", "tool", "tool", "assistant", "user", "tool", "user"]
        t = _df(spark, [(r, 10.0 * i) for i, r in enumerate(roles)])
        got = [
            (r["start_turn_idx"], r["end_turn_idx"], r["n_turns"])
            for r in cep.match_pattern(t, [("user", "1"), ("tool", "+")])
                     .orderBy("start_turn_idx").collect()
        ]
        assert got == [(0, 2, 3), (4, 5, 2)]

    def test_trailing_plus_completes_at_end_of_conversation(self, spark):
        # run still open when the conversation ends -> flushed as a match
        roles = ["system", "user", "tool", "tool"]
        t = _df(spark, [(r, 10.0 * i) for i, r in enumerate(roles)])
        got = [
            (r["start_turn_idx"], r["end_turn_idx"])
            for r in cep.match_pattern(t, [("user", "1"), ("tool", "+")]).collect()
        ]
        assert got == [(1, 3)]

    def test_trailing_plus_nfa_unit(self):
        # pure-Python NFA harness (same step function the stream uses)
        pat = cep.compile_pattern([("user", "1"), ("tool", "+")])
        rows = [(i, r, float(i)) for i, r in enumerate(
            ["user", "tool", "tool", "assistant", "user", "tool"])]
        got = [(m[0], m[2]) for m in cep._run_nfa(pat, rows)]
        assert got == [(0, 2), (4, 5)]

    def test_ambiguous_pattern_rejected(self, spark):
        with pytest.raises(ValueError, match="ambiguous"):
            cep.compile_pattern([("tool", "+"), ("tool", "1")])

    def test_bad_quantifier_rejected(self, spark):
        with pytest.raises(ValueError, match="quantifier"):
            cep.compile_pattern([("user", "*")])


class TestHistogramQuantiles:
    def test_estimate_within_one_bin_of_exact(self, spark):
        from arion_spark.functions import sketch

        vals = [("g", float(v)) for v in range(0, 2000)]  # uniform 0..1999
        df = spark.createDataFrame(vals, "g string, v double")
        out = {
            r["q"]: r["est"]
            for r in sketch.histogram_quantiles(
                df, ["g"], F.col("v"), quantiles=(0.5, 0.95)
            ).collect()
        }
        width = 3600.0 / 64
        assert abs(out[0.5] - 1000.0) <= width
        assert abs(out[0.95] - 1900.0) <= width

    def test_out_of_range_values_clamp_to_edge_bins(self, spark):
        from arion_spark.functions import sketch

        df = spark.createDataFrame(
            [("g", -50.0)] * 5 + [("g", 1e9)] * 5, "g string, v double"
        )
        out = {r["q"]: r for r in sketch.histogram_quantiles(
            df, ["g"], F.col("v"), quantiles=(0.5,)).collect()}
        # 5 low + 5 high: the 0.5 target falls in the LAST touched low bin
        assert out[0.5]["n"] == 10
        assert 0.0 <= out[0.5]["est"] <= 3600.0


class TestSpikeIntervals:
    """Day-partitioned gaps-and-islands: a spike spanning midnight must
    come back as ONE stitched interval, identical to what a single
    global window would produce."""

    def _t(self, spark, minutes_counts):
        rows = []
        turn = 0
        for m, n in minutes_counts:
            for k in range(n):
                rows.append(("c", turn, "user", "x", None,
                             m + timedelta(seconds=k % 60)))
                turn += 1
        return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)

    def test_cross_midnight_island_is_stitched(self, spark):
        from arion_spark.queries import spike_intervals

        base = datetime(2024, 3, 1, 0, 0, 0)
        # 2 days of 1-turn background minutes + a hot run 23:58..00:01
        mins = [(base + timedelta(minutes=i), 1) for i in range(0, 2880, 7)]
        hot0 = datetime(2024, 3, 1, 23, 58, 0)
        mins += [(hot0 + timedelta(minutes=i), 50) for i in range(4)]
        got = [
            (r["start"], r["end"], r["spike_turns"])
            for r in spike_intervals(self._t(spark, mins))
            .orderBy("start").collect()
        ]
        want_turns = sum(
            n for m, n in mins if hot0 <= m < hot0 + timedelta(minutes=4)
        )
        assert got == [(hot0, hot0 + timedelta(minutes=4), want_turns)]
        s, e, _ = got[0]
        assert s.day == 1 and e.day == 2  # genuinely crosses midnight

    def test_same_day_islands_stay_separate(self, spark):
        from arion_spark.queries import spike_intervals

        base = datetime(2024, 3, 1, 0, 0, 0)
        mins = [(base + timedelta(minutes=i), 1) for i in range(0, 1440, 7)]
        mins += [(base + timedelta(hours=6, minutes=i), 40) for i in range(2)]
        mins += [(base + timedelta(hours=9, minutes=i), 40) for i in range(3)]
        got = spike_intervals(self._t(spark, mins)).orderBy("start").collect()
        assert [r["start"].hour for r in got] == [6, 9]
        assert [(r["end"] - r["start"]).total_seconds() / 60 for r in got] == [2.0, 3.0]
