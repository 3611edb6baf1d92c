"""Multi-format source resolution — the engine's input front door.

Transposition of the reference's input-URL handling (reference:
src/arion.cpp:216-258 ``getSourceImage``/``getLocalFilePath``: accept a
``file://`` URL or bare local path, validate existence, dispatch to the
decoder): here a source URL resolves to a (Spark format, path) pair and
every read states its schema explicitly — format sniffing never decides
column types, only the container codec, so a corpus migrated between
parquet/JSONL/CSV reads back identically (tested).

Accepted forms::

    /data/transcripts.parquet        extension-sniffed
    file:///data/transcripts.jsonl   file URL (reference form)
    json:/data/landing/              explicit scheme override for
    csv:/data/exports/               extension-less directories
    parquet:/data/tables/t           (a dir of part files)

Batch and streaming readers share the resolution (`read_transcripts` /
`read_transcripts_stream`), so a landing zone of JSONL drops streams
through the same pipeline the parquet tables use — at cluster scale the
landing-zone reader is the bootstrap, and the compacted parquet/Iceberg
table is what analytics scan.

Scale note: CSV/JSON are row codecs — no column pruning, no predicate
pushdown, no row-group skipping.  They are supported as INGEST formats;
every sink in this engine writes parquet.  ``ReadSchema`` pruning
assertions (tests/test_plan_shapes.py) apply to the parquet path only,
by design.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from arion_spark.transcripts import TRANSCRIPT_SCHEMA

#: documents table schema (matches testdata documents.parquet)
DOC_SCHEMA = "doc_id long, text string"

_EXT = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
}
_SCHEMES = ("parquet", "json", "csv")


def resolve(url: str) -> tuple[str, str]:
    """URL → (spark format, path).

    Resolution order mirrors the reference (explicit scheme wins, then
    the local-path fallback): ``<fmt>:<path>`` overrides;
    ``file://<path>`` strips to a local path; otherwise the extension
    decides; extension-less paths default to parquet (the table
    layout every sink here writes)."""
    for fmt in _SCHEMES:
        if url.startswith(fmt + ":") and not url.startswith(fmt + "://"):
            return fmt, url[len(fmt) + 1 :]
    if url.startswith("file://"):
        url = url[len("file://") :]
    ext = os.path.splitext(url.rstrip("/"))[1].lower()
    return _EXT.get(ext, "parquet"), url


#: shared row-codec options so every reader, the file-stream reader and
#: the writer agree on one CSV dialect (RFC-4180 double-quote escaping,
#: multiLine so quoted embedded newlines — normal for transcript text —
#: stay one record instead of silently splitting into null-filled
#: fragment rows under PERMISSIVE).
_CSV_OPTS = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "escape": '"',
    # the CSV *writer* defaults these to true and silently trims
    # leading/trailing whitespace (incl. a trailing newline) out of
    # quoted values — transcript text must round-trip byte-identical
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def _codec_read_options(fmt: str) -> dict[str, str]:
    if fmt == "csv":
        # FAILFAST: a malformed ingest row is an error at the front door,
        # never a silent null-filled row downstream.
        return {**_CSV_OPTS, "multiLine": "true", "mode": "FAILFAST"}
    if fmt == "json":
        return {"mode": "FAILFAST"}
    return {}


def _reader(spark: SparkSession, fmt: str, schema: str):
    return spark.read.schema(schema).options(**_codec_read_options(fmt)).format(fmt)


def read_table(spark: SparkSession, url: str, schema: str) -> DataFrame:
    """Schema-enforced batch read of any supported container."""
    fmt, path = resolve(url)
    return _reader(spark, fmt, schema).load(path)


def read_transcripts(spark: SparkSession, url: str) -> DataFrame:
    return read_table(spark, url, TRANSCRIPT_SCHEMA)


def read_documents(spark: SparkSession, url: str) -> DataFrame:
    return read_table(spark, url, DOC_SCHEMA)


def read_transcripts_stream(
    spark: SparkSession, url: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming twin: a landing directory of JSONL/CSV/parquet files is
    a file-stream source under the same schema contract."""
    fmt, path = resolve(url)
    r = spark.readStream.schema(TRANSCRIPT_SCHEMA).options(
        **_codec_read_options(fmt)
    )
    return (
        r.option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .format(fmt)
        .load(path)
    )


def write_transcripts(df: DataFrame, url: str) -> None:
    """Round-trip writer (testing + landing-zone fixtures): emits the
    exact container the readers resolve, ISO timestamps for row codecs."""
    fmt, path = resolve(url)
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.options(**_CSV_OPTS)
    w.format(fmt).save(path)
