"""Pipeline compiler: validated spec → composed DataFrame chain.

The Spark analog of the reference's execution loop (reference:
src/arion.cpp:707-838): operators are composed **in spec order** into one
logical plan; Catalyst owns the physical strategy (scan sharing, column
pruning — the lazy-decode analog of src/arion.cpp:184-187 — and codegen).

Result-document contract, per output ROW (one row = one turn = the
reference's one invocation, src/arion.cpp:750-834):

  * ``info``  — array<struct<type, result, output>> positionally aligned
    with the spec's operations[] (output = op-specific JSON, like each
    Operation::serialize).
  * ``result`` / ``total_operations`` / ``failed_operations`` — the
    aggregate success contract.  Per-op *logical* failures (over-budget
    normalize, missing copy target, null text) set result=false for that
    entry and the chain continues; only malformed specs abort — at
    compile time (src/arion.cpp:799-810 semantics).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from arion_spark.operators import copy as op_copy
from arion_spark.operators import fingerprint as op_fp
from arion_spark.operators import meta_fields as MF
from arion_spark.operators import normalize as op_norm
from arion_spark.operators import read_meta as op_meta
from arion_spark.plans.spec import OpSpec, PipelineSpec, parse_spec

#: write_meta override fields (S7 analog, reference: src/arion.cpp:409-533):
#: the full 26-entry scalar/repeatable table from operators.meta_fields,
#: injected as columns BEFORE the op loop (reference: overrideMeta at
#: src/arion.cpp:737-739); read_meta then skips overridden columns, so
#: overrides win over extracted values (overwrite-wins semantics).
WRITE_META_SCALARS = MF.SCALAR_FIELDS + MF.EXTENSION_SCALARS
WRITE_META_ARRAYS = MF.ARRAY_FIELDS


class CompiledPipeline:
    """A compiled operation chain: ``apply`` builds the plan, ``run``
    additionally executes side-output writes (copy / normalize sinks)."""

    def __init__(self, spec: PipelineSpec):
        self.spec = spec
        self._side_writes: list[tuple[str, str, bool]] = []  # (kind, path, preserve)

    # -- plan construction ---------------------------------------------------

    def apply(self, df: DataFrame) -> DataFrame:
        spec = self.spec
        self._side_writes = []
        infos: list[Column] = []
        text_ok = F.col("text").isNotNull()

        # S7 write_meta: inject/override metadata columns BEFORE the op
        # loop (reference: overrideMeta at src/arion.cpp:737-739) — every
        # downstream operator, read_meta included, sees the overridden
        # values; fields with no read_meta extraction become new columns.
        overrides = {}
        for k, v in spec.write_meta.items():
            if k in WRITE_META_ARRAYS:
                overrides[k] = F.array(*[F.lit(str(x)) for x in v])
            elif k in WRITE_META_SCALARS:
                overrides[k] = F.lit(v)
        if overrides:
            df = df.withColumns(overrides)

        norm_seen = 0
        for i, op in enumerate(spec.operations):
            if op.type == "read_meta":
                df = op_meta.extract(df, skip=frozenset(overrides))
                out_doc = F.to_json(
                    F.struct(
                        "caption",
                        "keywords",
                        "model_released",
                        "property_released",
                        "n_tokens",
                        "has_tool",
                        *op_meta.MF.READ_SCALARS,
                        *op_meta.MF.READ_ARRAYS,
                    )
                )
                infos.append(_info(op, text_ok, out_doc))

            elif op.type == "normalize":
                norm_seen += 1
                out_col = (
                    "normalized_text" if norm_seen == 1 else f"normalized_text_{norm_seen}"
                )
                if op.run_failure:
                    infos.append(_info(op, F.lit(False), F.lit(op.run_failure)))
                    continue
                df = op_norm.apply(df, op.params, out_col=out_col)
                out_doc = F.to_json(
                    F.struct(
                        F.lit(op.params["type"]).alias("type"),
                        F.length(out_col).cast("int").alias("length"),
                        F.lit(op.params["quality"]).alias("quality"),
                    )
                )
                infos.append(_info(op, text_ok, out_doc))
                sink = op.params.get("output_table")
                if sink:
                    self._side_writes.append(("normalize:" + out_col, sink, True))

            elif op.type == "fingerprint":
                df = op_fp.per_turn(df)
                df = op_fp.rolling(df)
                out_doc = F.to_json(F.struct("turn_md5", "conv_fp"))
                infos.append(_info(op, text_ok, out_doc))

            elif op.type == "copy":
                ok = F.lit(op.run_failure is None)
                out_doc = (
                    F.lit(op.run_failure)
                    if op.run_failure
                    else F.to_json(
                        F.struct(F.lit(op.params["output_table"]).alias("output_table"))
                    )
                )
                infos.append(_info(op, ok, out_doc))
                if not op.run_failure:
                    self._side_writes.append(
                        ("copy", op.params["output_table"], op.params.get("preserve_meta", True))
                    )

            elif op.type == "filter":
                df = df.filter(op.params["where"])
                infos.append(_info(op, F.lit(True), F.lit(op.params["where"])))

        failed = sum(
            (F.when(e.getField("result"), 0).otherwise(1) for e in infos), F.lit(0)
        )
        return df.withColumns(
            {
                "info": F.array(*infos),
                "total_operations": F.lit(len(infos)),
                "failed_operations": failed.cast("int"),
                "result": failed == 0,
            }
        )

    # -- execution -----------------------------------------------------------

    def run(self, spark: SparkSession, df: DataFrame | None = None) -> DataFrame:
        if df is None:
            if not self.spec.input_table:
                raise ValueError("no input DataFrame and spec has no input_table")
            df = spark.read.parquet(self.spec.input_table)
        out = self.apply(df)
        if self._side_writes:
            # decode-once / scan-sharing analog (src/arion.cpp:781): one
            # materialization feeds every sink instead of N re-scans.
            if len(self._side_writes) > 1:
                out = out.persist()
            for kind, path, preserve in self._side_writes:
                if kind == "copy":
                    op_copy.write(out, path, preserve_meta=preserve)
                else:
                    out_col = kind.split(":", 1)[1]
                    keys = [c for c in ("conv_id", "turn_idx") if c in out.columns]
                    out.select(*keys, out_col).write.mode("overwrite").parquet(path)
        return out


def _info(op: OpSpec, result: Column, output: Column) -> Column:
    return F.struct(
        F.lit(op.type).alias("type"),
        result.alias("result"),
        output.alias("output"),
    )


def compile_pipeline(spec: str | dict | PipelineSpec) -> CompiledPipeline:
    if not isinstance(spec, PipelineSpec):
        spec = parse_spec(spec)
    return CompiledPipeline(spec)


def run_pipeline(
    spark: SparkSession, spec: str | dict | PipelineSpec, df: DataFrame | None = None
) -> DataFrame:
    """JSON-in / DataFrame-out — the ``ArionRunJson`` embedding surface
    (reference: src/carion.cpp:27-39)."""
    return compile_pipeline(spec).run(spark, df)


def error_doc(exc: Exception) -> str:
    """Structured error JSON for setup failures
    (reference: src/arion.cpp:842-864)."""
    doc = getattr(exc, "doc", None) or {"result": False, "error_message": str(exc)}
    return json.dumps(doc)


class PipelineBuilder:
    """Programmatic chain construction without JSON — the analog of the
    reference's ``Arion::addResizeOperation`` structured entry point
    (reference: src/arion.cpp:243-301, src/carion.h:61).

    >>> out = (PipelineBuilder()
    ...        .read_meta()
    ...        .normalize(width=64, type="fill", gravity="center")
    ...        .fingerprint()
    ...        .run(spark, df))
    """

    def __init__(self) -> None:
        self._ops: list[dict] = []
        self._write_meta: dict = {}

    def _add(self, type_: str, params: dict) -> "PipelineBuilder":
        self._ops.append({"type": type_, "params": params})
        return self

    def read_meta(self, info: bool = True) -> "PipelineBuilder":
        return self._add("read_meta", {"info": info})

    def normalize(self, **params) -> "PipelineBuilder":
        return self._add("normalize", params)

    def fingerprint(self, type: str = "md5") -> "PipelineBuilder":
        return self._add("fingerprint", {"type": type})

    def copy(self, output_table: str, preserve_meta: bool = True) -> "PipelineBuilder":
        return self._add(
            "copy", {"output_table": output_table, "preserve_meta": preserve_meta}
        )

    def filter(self, where: str) -> "PipelineBuilder":
        return self._add("filter", {"where": where})

    def write_meta(self, **fields) -> "PipelineBuilder":
        self._write_meta.update(fields)
        return self

    def to_spec(self) -> dict:
        spec: dict = {"operations": list(self._ops)}
        if self._write_meta:
            spec["write_meta"] = dict(self._write_meta)
        return spec

    def compile(self) -> CompiledPipeline:
        return compile_pipeline(self.to_spec())

    def run(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        return run_pipeline(spark, self.to_spec(), df)
