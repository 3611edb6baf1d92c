"""``read_meta`` — per-turn metadata extraction (operator O1).

Transposition of the reference's IPTC scan (reference:
src/models/read_meta.cpp:108-222): keyword comma-split + trim, scalar
caption field, case-insensitive release-flag substring search, plus the
transcript-domain tool extraction.

Pure narrow projection — 100% built-in ``F.*`` column expressions, fully
inside whole-stage codegen; zero shuffle, zero Python.  At 100 TB this is
a map-only stage fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output columns added by this operator (used by the compiler's info doc).
OUTPUT_COLUMNS = (
    "caption",
    "keywords",
    "model_released",
    "property_released",
    "n_chars",
    "n_tokens",
    "has_tool",
)


def keywords_col(text: Column) -> Column:
    """Comma-split + trim + drop-empties (reference keyword split:
    src/models/read_meta.cpp:172-183)."""
    return F.filter(
        F.transform(F.split(text, ","), lambda k: F.trim(k)),
        lambda k: k != "",
    )


def extract(
    df: DataFrame, text_col: str = "text", tool_col: str = "tool"
) -> DataFrame:
    text = F.col(text_col)
    low = F.lower(text)
    return df.withColumns(
        {
            "caption": F.trim(F.split(text, ",").getItem(0)),
            "keywords": keywords_col(text),
            "model_released": low.contains("model released (mr)"),
            "property_released": low.contains("property released (pr)"),
            "n_chars": F.length(text).cast("int"),
            "n_tokens": F.when(F.trim(text) == "", F.lit(0))
            .otherwise(F.size(F.split(F.trim(text), r"\s+")))
            .cast("int"),
            "has_tool": F.col(tool_col).isNotNull(),
        }
    )
