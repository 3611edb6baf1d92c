"""Spec front-end negative/positive tests — the analog of the reference's
structured-error contract tests (reference: tests/functional/test.py:1122-1262)."""

from __future__ import annotations

import json

import pytest

from arion_spark.oracle import DEFAULT_QUALITY, MAX_PIXELS
from arion_spark.plans.compiler import error_doc
from arion_spark.plans.spec import SpecError, parse_spec


def _ops(*ops):
    return {"operations": list(ops)}


def test_malformed_json_is_setup_error():
    with pytest.raises(SpecError):
        parse_spec("{not json")


def test_unknown_operation_type():
    with pytest.raises(SpecError, match="unknown type"):
        parse_spec(_ops({"type": "invalid", "params": {}}))


def test_missing_params_object():
    with pytest.raises(SpecError, match="missing 'params'"):
        parse_spec(_ops({"type": "read_meta"}))


def test_empty_operations():
    with pytest.raises(SpecError):
        parse_spec({"operations": []})


def test_normalize_requires_width():
    with pytest.raises(SpecError, match="requires width"):
        parse_spec(_ops({"type": "normalize", "params": {"type": "fill"}}))


def test_normalize_invalid_gravity():
    with pytest.raises(SpecError, match="invalid gravity"):
        parse_spec(
            _ops({"type": "normalize", "params": {"width": 10, "gravity": "up"}})
        )


def test_normalize_invalid_interpolation():
    with pytest.raises(SpecError, match="invalid interpolation"):
        parse_spec(
            _ops({"type": "normalize", "params": {"width": 10, "interpolation": "lanczos4"}})
        )


def test_normalize_lanczon4_spelling_preserved():
    # the reference's misspelling is the valid spec token
    spec = parse_spec(
        _ops({"type": "normalize", "params": {"width": 10, "interpolation": "lanczon4"}})
    )
    assert spec.operations[0].params["interpolation"] == "lanczon4"


def test_over_budget_is_run_failure_not_setup_error():
    # max-pixels analog: chain continues, op is failed
    spec = parse_spec(
        _ops({"type": "normalize", "params": {"width": 100_000, "height": 100_000, "type": "fill"}})
    )
    op = spec.operations[0]
    assert op.run_failure and str(MAX_PIXELS) in op.run_failure


def test_zero_width_is_run_failure():
    spec = parse_spec(_ops({"type": "normalize", "params": {"width": 0}}))
    assert spec.operations[0].run_failure


def test_invalid_quality_silently_keeps_default():
    spec = parse_spec(
        _ops({"type": "normalize", "params": {"width": 10, "quality": 400}})
    )
    assert spec.operations[0].params["quality"] == DEFAULT_QUALITY


def test_sharpen_radius_out_of_range():
    with pytest.raises(SpecError, match="sharpen_radius"):
        parse_spec(
            _ops(
                {
                    "type": "normalize",
                    "params": {"width": 10, "sharpen_amount": 80, "sharpen_radius": 12},
                }
            )
        )


def test_adaptive_watermark_requires_min_max():
    with pytest.raises(SpecError, match="adaptive watermark"):
        parse_spec(
            _ops(
                {
                    "type": "normalize",
                    "params": {
                        "width": 10,
                        "watermark_text": "*",
                        "watermark_type": "adaptive",
                    },
                }
            )
        )


def test_fingerprint_only_md5():
    with pytest.raises(SpecError, match="invalid type"):
        parse_spec(_ops({"type": "fingerprint", "params": {"type": "sha1"}}))


def test_copy_missing_output_is_run_failure():
    spec = parse_spec(_ops({"type": "copy", "params": {}}))
    assert spec.operations[0].run_failure


def test_operation_order_preserved():
    spec = parse_spec(
        _ops(
            {"type": "fingerprint", "params": {}},
            {"type": "read_meta", "params": {}},
            {"type": "normalize", "params": {"width": 5}},
        )
    )
    assert [o.type for o in spec.operations] == ["fingerprint", "read_meta", "normalize"]


def test_error_doc_shape():
    try:
        parse_spec(_ops({"type": "invalid", "params": {}}))
    except SpecError as e:
        doc = json.loads(error_doc(e))
        assert doc["result"] is False and "error_message" in doc
