"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship operation chain (the reference's example-1
shape: read_meta → normalize → fingerprint → copy) over sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its
DuckDB oracle (see arion_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arion_spark import queries as q
from arion_spark.plans.compiler import run_pipeline
from arion_spark.transcripts import transcripts_from_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    spec = {
        "operations": [
            {"type": "read_meta", "params": {"info": True}},
            {
                "type": "normalize",
                "params": {"width": 64, "type": "fill", "gravity": "center", "quality": 92},
            },
            {"type": "fingerprint", "params": {"type": "md5"}},
            {"type": "copy", "params": {"output_table": "/tmp/arion_spark_entry_copy"}},
        ]
    }
    out = run_pipeline(spark, spec, t)
    return out.select(
        "conv_id",
        "turn_idx",
        "role",
        "caption",
        "model_released",
        "normalized_text",
        "turn_md5",
        "conv_fp",
        "result",
        "total_operations",
        "failed_operations",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
