"""``copy`` — pass-through sink write (operator O3).

The reference copies the *original input bytes* (not the decoded/resized
image) to output_url, then re-applies full metadata (reference:
src/models/copy.cpp:115-172).  Transcript transposition: write the
*original* turn rows — untransformed ``text`` — plus enriched metadata
columns to an output table.

``preserve_meta`` sink semantics (reference: src/models/resize.cpp:740-822):
  * True  → all metadata columns ride along (minus ordering artifacts —
    the Orientation-tag-drop analog: internal ``_``-prefixed columns are
    never persisted).
  * False → whitelist only (the ICC-profile analog: the canonical
    fingerprint column, if present).

Batch writes go to parquet; the exactly-once streaming variant lives in
:mod:`arion_spark.streaming.sink`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BASE_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")
META_WHITELIST = ("turn_md5",)  # ICC-whitelist analog


def select_for_copy(df: DataFrame, preserve_meta: bool = True) -> DataFrame:
    base = [c for c in BASE_COLUMNS if c in df.columns]
    if preserve_meta:
        extra = [c for c in df.columns if c not in base and not c.startswith("_")]
    else:
        extra = [c for c in META_WHITELIST if c in df.columns]
    return df.select(*base, *extra)


def write(
    df: DataFrame,
    output_table: str,
    preserve_meta: bool = True,
    mode: str = "overwrite",
) -> None:
    """Idempotent batch copy: overwrite mode makes re-runs converge to the
    same table state (the batch twin of the streaming MERGE sink)."""
    select_for_copy(df, preserve_meta).write.mode(mode).parquet(output_table)
