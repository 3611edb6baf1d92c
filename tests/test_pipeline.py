"""End-to-end pipeline tests: the result-document contract
(info[] alignment, counters, failure semantics, copy round-trip) —
the analog of the reference's chain examples + verifySuccess/verifyFailure
(reference: tests/functional/test.py:87-148, examples/example-1.json)."""

from __future__ import annotations

import json

import pytest

from arion_spark import compile_pipeline, oracle, run_pipeline
from arion_spark.plans.spec import SpecError


FLAGSHIP = {
    "operations": [
        {"type": "read_meta", "params": {"info": True}},
        {"type": "normalize", "params": {"width": 24, "type": "fill", "gravity": "center"}},
        {"type": "fingerprint", "params": {"type": "md5"}},
    ]
}


def test_info_positionally_aligned(spark, transcripts_df):
    out = run_pipeline(spark, FLAGSHIP, transcripts_df).head()
    assert [e["type"] for e in out.info] == ["read_meta", "normalize", "fingerprint"]
    assert out.total_operations == 3
    assert out.failed_operations == 0
    assert out.result is True
    norm_doc = json.loads(out.info[1]["output"])
    assert norm_doc["length"] == 24 and norm_doc["quality"] == oracle.DEFAULT_QUALITY


def test_failed_op_continues_chain(spark, transcripts_df):
    spec = {
        "operations": [
            {"type": "normalize", "params": {"width": 0}},  # run failure
            {"type": "fingerprint", "params": {}},
        ]
    }
    out = run_pipeline(spark, spec, transcripts_df).head()
    assert out.failed_operations == 1 and out.result is False
    assert out.info[0]["result"] is False
    # chain continued: fingerprint still produced
    assert out.info[1]["result"] is True and len(out.turn_md5) == 32


def test_copy_round_trip(spark, transcripts_df, tmp_path):
    out_dir = str(tmp_path / "copy_out")
    spec = {
        "operations": [
            {"type": "read_meta", "params": {}},
            {"type": "copy", "params": {"output_table": out_dir}},
        ]
    }
    run_pipeline(spark, spec, transcripts_df).count()
    back = spark.read.parquet(out_dir)
    # original text preserved byte-for-byte under stable (conv_id, turn_idx)
    orig = {(r.conv_id, r.turn_idx): r.text for r in transcripts_df.collect()}
    got = {(r.conv_id, r.turn_idx): r.text for r in back.collect()}
    assert got == orig
    assert "caption" in back.columns  # preserve_meta default carries metadata


def test_copy_preserve_meta_false_whitelist(spark, transcripts_df, tmp_path):
    out_dir = str(tmp_path / "copy_wl")
    spec = {
        "operations": [
            {"type": "fingerprint", "params": {}},
            {"type": "read_meta", "params": {}},
            {"type": "copy", "params": {"output_table": out_dir, "preserve_meta": False}},
        ]
    }
    run_pipeline(spark, spec, transcripts_df).count()
    back = spark.read.parquet(out_dir)
    assert "turn_md5" in back.columns  # whitelist (ICC analog)
    assert "caption" not in back.columns


def test_copy_missing_output_is_failed_op_not_crash(spark, transcripts_df):
    spec = {"operations": [{"type": "copy", "params": {}}]}
    out = run_pipeline(spark, spec, transcripts_df).head()
    assert out.failed_operations == 1 and out.result is False


def test_multiple_normalize_sinks(spark, transcripts_df, tmp_path):
    """3-resize chain analog (reference examples/example-1.json): one scan,
    several normalize outputs, each with its own sink."""
    d1, d2 = str(tmp_path / "n1"), str(tmp_path / "n2")
    spec = {
        "operations": [
            {"type": "normalize", "params": {"width": 8, "type": "fill", "output_table": d1}},
            {"type": "normalize", "params": {"width": 4, "type": "square", "output_table": d2}},
        ]
    }
    run_pipeline(spark, spec, transcripts_df).count()
    b1, b2 = spark.read.parquet(d1), spark.read.parquet(d2)
    assert b1.count() == transcripts_df.count() == b2.count()
    assert len(b1.head().normalized_text) == 8
    assert len(b2.head().normalized_text_2) == 4


def test_write_meta_overrides(spark, transcripts_df):
    spec = {
        "write_meta": {"caption": "FORCED", "keywords": ["k1", "k2"]},
        "operations": [{"type": "read_meta", "params": {}}],
    }
    out = run_pipeline(spark, spec, transcripts_df).head()
    assert out.caption == "FORCED" and list(out.keywords) == ["k1", "k2"]


def test_write_meta_full_field_grid(spark, transcripts_df):
    """Every field of the reference's 26-entry table is writable
    (reference: src/arion.cpp:431-484): scalars inject/override a scalar
    column, repeatable fields replace the whole array."""
    from arion_spark.operators import meta_fields as MF

    wm = {}
    for name in MF.SCALAR_FIELDS:
        wm[name] = f"v-{name}"
    for name in MF.ARRAY_FIELDS:
        wm[name] = [f"{name}-1", f"{name}-2"]
    spec = {"write_meta": wm, "operations": [{"type": "read_meta", "params": {}}]}
    out = run_pipeline(spark, spec, transcripts_df).head()
    for name in MF.SCALAR_FIELDS:
        assert out[name] == f"v-{name}", name
    for name in MF.ARRAY_FIELDS:
        assert list(out[name]) == [f"{name}-1", f"{name}-2"], name


def test_write_meta_without_read_meta_still_injects(spark, transcripts_df):
    """overrideMeta runs before the op loop (src/arion.cpp:737-739) —
    fields appear even when no read_meta op is in the chain."""
    spec = {
        "write_meta": {"headline": "H", "contact": ["a@b"]},
        "operations": [{"type": "fingerprint", "params": {}}],
    }
    out = run_pipeline(spark, spec, transcripts_df).head()
    assert out.headline == "H" and list(out.contact) == ["a@b"]


def test_write_meta_instructions_alias_wins(spark, transcripts_df):
    spec = {
        "write_meta": {
            "special_instructions": "loses",
            "instructions": "alias wins",
        },
        "operations": [{"type": "read_meta", "params": {}}],
    }
    out = run_pipeline(spark, spec, transcripts_df).head()
    assert out.special_instructions == "alias wins"


def test_write_meta_unknown_field_is_setup_error():
    with pytest.raises(SpecError, match="unknown field"):
        compile_pipeline(
            {
                "write_meta": {"not_a_field": "x"},
                "operations": [{"type": "read_meta", "params": {}}],
            }
        )


def test_write_meta_repeatable_requires_array():
    with pytest.raises(SpecError, match="repeatable"):
        compile_pipeline(
            {
                "write_meta": {"byline": "not-a-list"},
                "operations": [{"type": "read_meta", "params": {}}],
            }
        )
    with pytest.raises(SpecError, match="scalar"):
        compile_pipeline(
            {
                "write_meta": {"city": ["a", "b"]},
                "operations": [{"type": "read_meta", "params": {}}],
            }
        )


def test_filter_operator(spark, transcripts_df):
    spec = {
        "operations": [
            {"type": "filter", "params": {"where": "role = 'user'"}},
            {"type": "fingerprint", "params": {}},
        ]
    }
    out = run_pipeline(spark, spec, transcripts_df)
    roles = {r.role for r in out.collect()}
    assert roles == {"user"}


def test_setup_error_aborts_before_execution(spark, transcripts_df):
    with pytest.raises(SpecError):
        compile_pipeline({"operations": [{"type": "resize", "params": {}}]})


def test_normalized_matches_oracle_end_to_end(spark, transcripts_df, fixture_rows):
    out = {
        (r.conv_id, r.turn_idx): r
        for r in run_pipeline(spark, FLAGSHIP, transcripts_df).collect()
    }
    for r in fixture_rows:
        got = out[(r["conv_id"], r["turn_idx"])]
        assert got.normalized_text == oracle.normalize_full(
            r["text"], width=24, type_="fill", gravity="center"
        )
        assert got.turn_md5 == oracle.turn_md5(r["text"])


def test_builder_api_equals_json_spec(spark, transcripts_df):
    """PipelineBuilder (the reference's programmatic C-API analog,
    reference: src/arion.cpp:243-301) produces the identical result as
    the equivalent JSON spec."""
    from arion_spark.plans.compiler import PipelineBuilder

    built = (
        PipelineBuilder()
        .read_meta()
        .normalize(width=32, type="fill", gravity="ne")
        .fingerprint()
        .run(spark, transcripts_df)
    )
    spec = {
        "operations": [
            {"type": "read_meta", "params": {"info": True}},
            {"type": "normalize", "params": {"width": 32, "type": "fill", "gravity": "ne"}},
            {"type": "fingerprint", "params": {"type": "md5"}},
        ]
    }
    from arion_spark.plans.compiler import run_pipeline

    want = run_pipeline(spark, spec, transcripts_df)
    assert built.schema == want.schema
    assert built.exceptAll(want).count() == 0 and want.exceptAll(built).count() == 0
