"""arion_spark — a from-scratch PySpark-native streaming operation-chain engine.

Re-imagines the capabilities of the reference engine (snapwire-media/arion,
a single-image JSON-spec operation-chain CLI; see /root/reference) as an
idiomatic PySpark Structured Streaming / CEP engine over tables of
multi-turn conversation transcripts::

    (conv_id: string, turn_idx: int, role: string,
     text: string, tool: string, ts: timestamp)

The reference chain ``read_meta -> resize -> fingerprint -> copy``
(reference: src/arion.cpp:560-576) becomes a compiled DataFrame DAG
``read_meta -> normalize -> fingerprint -> copy`` over transcript turns,
with the streaming layer adding watermarks, tumbling/sliding/session
windows, per-conversation state, stream-stream joins and an exactly-once
idempotent sink — everything the single-record reference never needed.

Design rules (Spark-first):
  * DataFrame / Spark SQL only; Catalyst is the optimizer.  No RDDs.
  * Built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen) on the
    hot path; Arrow-vectorized pandas UDFs only where built-ins cannot
    express the semantics; never row-at-a-time Python UDFs.
  * Explicit partitioning / broadcast / salting decisions where a 100 TB
    input would make the default plan a bottleneck.
"""

from arion_spark.session import get_spark
from arion_spark.plans.spec import PipelineSpec, SpecError
from arion_spark.plans.compiler import compile_pipeline, run_pipeline

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "PipelineSpec",
    "SpecError",
    "compile_pipeline",
    "run_pipeline",
    "__version__",
]
