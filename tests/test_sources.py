"""Multi-format source resolution: the same transcript corpus read back
identically from parquet / JSONL / CSV containers, batch and streaming,
plus the scheme-resolution table itself (reference: src/arion.cpp
getSourceImage/getLocalFilePath URL handling)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from arion_spark import sources
from arion_spark.transcripts import TRANSCRIPT_SCHEMA

T0 = datetime(2024, 1, 1)


@pytest.mark.parametrize(
    "url,expected",
    [
        ("/d/t.parquet", ("parquet", "/d/t.parquet")),
        ("/d/t.jsonl", ("json", "/d/t.jsonl")),
        ("/d/t.ndjson", ("json", "/d/t.ndjson")),
        ("/d/t.csv", ("csv", "/d/t.csv")),
        ("file:///d/t.json", ("json", "/d/t.json")),
        ("json:/d/landing/", ("json", "/d/landing/")),
        ("csv:/d/exports", ("csv", "/d/exports")),
        ("parquet:/d/tables/t", ("parquet", "/d/tables/t")),
        ("/d/table_dir", ("parquet", "/d/table_dir")),  # extension-less default
    ],
)
def test_resolve(url, expected):
    assert sources.resolve(url) == expected


def _fixture(spark):
    rows = [
        ("c1", 0, "user", "hello there", None, T0),
        ("c1", 1, "assistant", "hi, how can I help?", None, T0 + timedelta(seconds=30)),
        ("c1", 2, "tool", "search(q)", "search", T0 + timedelta(seconds=45)),
        ("c2", 0, "user", "unicode ünïcödé 日本語", None, T0 + timedelta(minutes=5)),
        ("c2", 1, "assistant", None, None, T0 + timedelta(minutes=6)),  # null text
        # embedded newlines + quotes + separator: normal for transcript
        # text, and exactly what breaks a non-multiLine CSV read
        ("c3", 0, "user", 'line one\nline two, with "quotes"\n\nand a blank', None,
         T0 + timedelta(minutes=7)),
        ("c3", 1, "assistant", "windows\r\nnewline, trailing\n", None,
         T0 + timedelta(minutes=8)),
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _key(rows):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) for r in rows
    )


def test_roundtrip_all_formats(spark, tmp_path):
    df = _fixture(spark)
    want = _key(df.collect())
    for url in (
        f"{tmp_path}/t.parquet",
        f"json:{tmp_path}/t_json",
        f"csv:{tmp_path}/t_csv",
    ):
        sources.write_transcripts(df, url)
        got = _key(sources.read_transcripts(spark, url).collect())
        assert got == want, url
    # documents table too (json)
    docs = spark.createDataFrame([(1, "a b c"), (2, "d e")], sources.DOC_SCHEMA)
    docs.write.mode("overwrite").json(f"{tmp_path}/docs")
    back = sources.read_documents(spark, f"json:{tmp_path}/docs")
    assert {(r.doc_id, r.text) for r in back.collect()} == {(1, "a b c"), (2, "d e")}


def test_jsonl_landing_zone_streams_through_pipeline(spark, tmp_path):
    """A JSONL landing dir streams through the full chain pipeline and
    produces the same merged rows as the parquet replay of the same
    corpus — the format is the container, not the contract."""
    from arion_spark.streaming.pipeline import run_stream_pipeline
    from arion_spark.streaming.sink import MergeSink

    df = _fixture(spark).where("text IS NOT NULL AND conv_id IN ('c1', 'c2')")
    # two jsonl chunks (files are the replay units)
    sources.write_transcripts(df.where("conv_id = 'c1'"), f"json:{tmp_path}/land/a")
    sources.write_transcripts(df.where("conv_id = 'c2'"), f"json:{tmp_path}/land/b")

    spec = {"operations": [{"type": "fingerprint", "params": {"type": "md5"}}]}
    stream = sources.read_transcripts_stream(spark, f"json:{tmp_path}/land")
    q, sink = run_stream_pipeline(
        spark, spec, None, f"{tmp_path}/out", f"{tmp_path}/ckpt",
        watermark="10 minutes", stream=stream,
    )
    q.processAllAvailable()
    q.stop()
    merged = sink.read_merged(spark)
    assert merged.count() == df.count()
    assert {r.conv_id for r in merged.select("conv_id").collect()} == {"c1", "c2"}
