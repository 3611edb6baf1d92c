"""Pipeline-spec front end: parse + eager validation.

The analog of the reference's JSON → ptree → typed operation chain
(``Arion::setup`` + ``parseOperations``, reference: src/arion.cpp:134-190,
:541-601): the spec is parsed once, each operation's params are validated
eagerly, order is preserved, and an unknown ``type`` or missing ``params``
is a *setup* error (structured error result, never a crash) — mirroring
the reference's negative tests (tests/functional/test.py:1122-1161).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from arion_spark import oracle
from arion_spark.operators import meta_fields as MF


class SpecError(ValueError):
    """Structured setup failure (reference: constructErrorJson,
    src/arion.cpp:842-864).  Carries a machine-readable error doc."""

    def __init__(self, message: str):
        super().__init__(message)
        self.doc = {"result": False, "error_message": message}


@dataclass
class OpSpec:
    type: str
    params: dict[str, Any]
    #: set by validation: constant per-op failure recorded at run time
    #: (e.g. over-budget normalize, missing copy output) — the chain
    #: continues, the op is counted failed (src/arion.cpp:799-810 semantics).
    run_failure: str | None = None


@dataclass
class PipelineSpec:
    operations: list[OpSpec]
    input_table: str | None = None
    correct_rotation: bool = True
    #: lazy-decode analog: allow skipping the text column scan when no op
    #: needs it (src/arion.cpp:184-187) — Catalyst column pruning does the
    #: actual work; we track which ops force "decode".
    allow_skip_decode: bool = False
    write_meta: dict[str, Any] = field(default_factory=dict)

    @property
    def needs_text(self) -> bool:
        return (not self.allow_skip_decode) or any(
            op.type in ("normalize", "fingerprint") for op in self.operations
        )


KNOWN_OPS = ("read_meta", "normalize", "fingerprint", "copy", "filter")


def parse_spec(spec: str | dict) -> PipelineSpec:
    """Parse and eagerly validate a pipeline spec.

    Raises :class:`SpecError` on malformed JSON, unknown op type, missing
    params, or invalid required params — the reference's setup-failure
    contract.  Recoverable anomalies (over-budget size, missing copy
    target) become per-op run failures instead.
    """
    if isinstance(spec, str):
        try:
            spec = json.loads(spec)
        except json.JSONDecodeError as e:
            raise SpecError(f"malformed spec JSON: {e}") from e
    if not isinstance(spec, dict):
        raise SpecError("spec must be a JSON object")
    raw_ops = spec.get("operations")
    if not isinstance(raw_ops, list) or not raw_ops:
        raise SpecError("spec requires a non-empty 'operations' array")

    ops: list[OpSpec] = []
    for i, raw in enumerate(raw_ops):
        if not isinstance(raw, dict) or "type" not in raw:
            raise SpecError(f"operation[{i}]: missing 'type'")
        op_type = raw["type"]
        if op_type not in KNOWN_OPS:
            raise SpecError(f"operation[{i}]: unknown type '{op_type}'")
        params = raw.get("params")
        if not isinstance(params, dict):
            raise SpecError(f"operation[{i}] ({op_type}): missing 'params' object")
        op = OpSpec(type=op_type, params=dict(params))
        _VALIDATORS[op_type](op, i)
        ops.append(op)

    return PipelineSpec(
        operations=ops,
        input_table=spec.get("input_table"),
        correct_rotation=bool(spec.get("correct_rotation", True)),
        allow_skip_decode=bool(
            spec.get("allow_skip_decode_image", spec.get("allow_skip_decode", False))
        ),
        write_meta=_validate_write_meta(spec.get("write_meta", {})),
    )


def _validate_write_meta(raw: dict) -> dict:
    """Validate + canonicalize write_meta against the full 26-field table
    (reference: src/arion.cpp:431-484).

    * unknown field → setup error (eager-validation contract)
    * repeatable fields require a list of scalars; scalars must not be lists
    * the legacy ``instructions`` alias resolves to
      ``special_instructions``; when both are present the alias wins
      (it appears later in the reference's table and both write the same
      IPTC key — last write wins).
    """
    if not isinstance(raw, dict):
        raise SpecError("write_meta must be a JSON object")
    out: dict = {}
    for name, _rep in MF.FIELD_TABLE + tuple(
        (n, False) for n in MF.EXTENSION_SCALARS
    ):
        if name not in raw:
            continue
        v = raw[name]
        canon = MF.ALIASES.get(name, name)
        if name in MF.ARRAY_FIELDS:
            if not isinstance(v, list) or any(
                isinstance(x, (list, dict)) for x in v
            ):
                raise SpecError(
                    f"write_meta: '{name}' is repeatable — expected an array of scalars"
                )
            out[canon] = [str(x) for x in v]
        else:
            if isinstance(v, (list, dict)):
                raise SpecError(f"write_meta: '{name}' expects a scalar value")
            out[canon] = v
    unknown = set(raw) - {n for n, _ in MF.FIELD_TABLE} - set(MF.EXTENSION_SCALARS)
    if unknown:
        raise SpecError(
            f"write_meta: unknown field(s) {sorted(unknown)}; "
            f"known: {sorted(MF.WRITABLE_FIELDS)}"
        )
    return out


# ---------------------------------------------------------------------------
# per-op validators (analogs of each Operation::setup)
# ---------------------------------------------------------------------------

def _v_read_meta(op: OpSpec, i: int) -> None:
    # reference setup reads only the optional bool `info`
    # (src/models/read_meta.cpp:88-98)
    op.params.setdefault("info", True)


def _v_normalize(op: OpSpec, i: int) -> None:
    p = op.params
    t = p.get("type", "width")
    if t not in oracle.RESIZE_TYPES:
        raise SpecError(f"operation[{i}] (normalize): invalid type '{t}'")
    p["type"] = t

    width, height = p.get("width"), p.get("height")
    if t in ("width", "square", "fill") and width is None:
        raise SpecError(f"operation[{i}] (normalize): type '{t}' requires width")
    if t == "height" and height is None:
        raise SpecError(f"operation[{i}] (normalize): type 'height' requires height")
    for name, v in (("width", width), ("height", height)):
        if v is not None:
            if not isinstance(v, int) or isinstance(v, bool):
                raise SpecError(f"operation[{i}] (normalize): {name} must be int")
            if v <= 0:
                # zero/negative size: run-time op failure, chain continues
                # (reference: src/models/resize.cpp:666-678)
                op.run_failure = f"invalid {name}: {v}"

    # resource governor (reference: src/models/resize.cpp:679-683)
    if width and height and width * height > oracle.MAX_PIXELS:
        op.run_failure = f"output budget {width}x{height} exceeds {oracle.MAX_PIXELS}"

    g = p.get("gravity", "center").lower()
    if g not in oracle.GRAVITY_POS:
        raise SpecError(f"operation[{i}] (normalize): invalid gravity '{g}'")
    p["gravity"] = g

    interp = p.get("interpolation", "area")
    if interp not in oracle.INTERPOLATIONS:
        raise SpecError(f"operation[{i}] (normalize): invalid interpolation '{interp}'")
    p["interpolation"] = interp

    # quality: invalid values silently keep the default
    # (reference: src/models/resize.cpp:444-448)
    q = p.get("quality", oracle.DEFAULT_QUALITY)
    if not isinstance(q, int) or not (0 <= q <= 100):
        q = oracle.DEFAULT_QUALITY
    p["quality"] = q

    amt = p.get("sharpen_amount", 0)
    rad = p.get("sharpen_radius", 0.0)
    if amt:
        # reference: amount ≤ 1000, 0 < radius < 10 (src/models/resize.cpp:452-464)
        if not (0 < amt <= 1000):
            raise SpecError(f"operation[{i}] (normalize): sharpen_amount out of range")
        if not (0 < rad < 10):
            raise SpecError(f"operation[{i}] (normalize): sharpen_radius out of range")
    p["sharpen_amount"], p["sharpen_radius"] = amt, rad

    wt = p.get("watermark_type", "standard")
    if wt not in oracle.WATERMARK_TYPES:
        raise SpecError(f"operation[{i}] (normalize): invalid watermark_type '{wt}'")
    p["watermark_type"] = wt
    if p.get("watermark_text"):
        if wt == "adaptive":
            mn, mx = p.get("watermark_min"), p.get("watermark_max")
            # reference validates min/max presence+range (src/models/resize.cpp:421-440)
            if mn is None or mx is None or not (0 <= mn <= mx <= 1):
                raise SpecError(
                    f"operation[{i}] (normalize): adaptive watermark requires "
                    "0 <= watermark_min <= watermark_max <= 1"
                )
        else:
            amt = p.get("watermark_amount", 0.0)
            if not (0 < amt <= 1):
                raise SpecError(
                    f"operation[{i}] (normalize): watermark_amount must be in (0, 1]"
                )


def _v_fingerprint(op: OpSpec, i: int) -> None:
    t = op.params.get("type", "md5")
    # only md5 is supported (reference: src/models/fingerprint.cpp:119-126)
    if t not in oracle.FINGERPRINT_TYPES:
        raise SpecError(f"operation[{i}] (fingerprint): invalid type '{t}'")
    op.params["type"] = t


def _v_copy(op: OpSpec, i: int) -> None:
    out = op.params.get("output_table") or op.params.get("output_url")
    if not out:
        # per-op run failure, not a crash (reference: src/models/copy.cpp:109-113)
        op.run_failure = "copy: missing output_table"
    else:
        op.params["output_table"] = str(out)


def _v_filter(op: OpSpec, i: int) -> None:
    # natural extension the reference lacks (SURVEY.md §2.5): predicate on a
    # column, needed as stream-stream join prep.
    if not op.params.get("where"):
        raise SpecError(f"operation[{i}] (filter): requires 'where' expression")


_VALIDATORS = {
    "read_meta": _v_read_meta,
    "normalize": _v_normalize,
    "fingerprint": _v_fingerprint,
    "copy": _v_copy,
    "filter": _v_filter,
}
