"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed by Arrow-batched ``mapInPandas``.

This mirrors the reference's actual domain (it decodes images via
OpenCV/LibRaw, reference: src/arion.cpp:605-649) at the Spark layer: the
schema, partitioning, UDF signature and batch shape are real and tested;
the codec itself is STUBBED (image/audio libraries are not in this
container) behind :func:`_decode_stub` — a deterministic fake keyed by
content md5 — or raises ``NotImplementedError`` when
``require_real_codecs=True``.

Swap ``_decode_stub`` for a cv2/PIL call on a real cluster; nothing else
changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, payload_md5 string, n_bytes int, "
    "feat array<float>, thumb_w int, thumb_h int"
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table.

    Payload = ASCII-hex md5 stream (256 bytes).  Still an opaque
    ``binary`` column to Spark — but expressible in ANSI SQL
    (``md5(varchar)`` chains), which lets the driver's DuckDB oracle
    verify the full mapInPandas feature-extraction path end-to-end.
    """
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        blob = "".join(
            hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(8)
        ).encode("ascii")
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                blob,
                (64 + i % 8, 48 + i % 8, 1000 + i, "stub") if kind != "audio" else (None, None, 1000 + i, "stub"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, require_real_codecs: bool = False) -> list[float]:
    """Deterministic fake 'decode + feature-extract': 8 floats derived from
    the content digest.  Replace with the real codec on a cluster."""
    if require_real_codecs:
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment; "
            "install cv2/PIL/librosa and replace _decode_stub"
        )
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(df: DataFrame, thumb: tuple[int, int] = (32, 32)) -> DataFrame:
    """Decode / feature-extract / resize-metadata over Arrow batches.

    Partition-wise ``mapInPandas``: each batch stays columnar end-to-end;
    binary payloads never round-trip through Python row objects.  At
    scale, pair with ``spark.sql.files.maxPartitionBytes`` sized so one
    task's payload batch fits executor memory.
    """
    tw, th = thumb

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int32"),
                    "feat": payloads.combine(
                        pdf["kind"], lambda b, k: _decode_stub(b, k)
                    ),
                    "thumb_w": tw,
                    "thumb_h": th,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: explode sample timestamps from metadata
    (JVM-side), leaving per-frame decode to ``extract_features``."""
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "payload", "kind")
    )


RESIZE_SCHEMA = (
    "media_id long, kind string, n_bytes int, resized_bytes int, "
    "resized_md5 string"
)


def resize_media(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Payload 'resize' over Arrow batches: deterministic byte-stride
    downsample to ≈``target_bytes`` (stride k = max(1, n // target),
    keep offsets 0, k, 2k, …) — the codec-free stand-in for a thumbnail
    resize (reference: src/models/resize.cpp does this with OpenCV).

    The Spark-side plumbing is the real thing: binary payloads stay in
    columnar Arrow batches through ``mapInPandas``, never row-ified; on
    a cluster, swap the stride loop for cv2.resize and nothing else
    changes.  The stride transform is pure bytes → SQL-expressible, so
    the driver's oracle verifies the full path including the resized
    content digest.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, r_bytes, r_md5 = [], [], []
            for b in pdf["payload"]:
                b = bytes(b or b"")
                k = max(1, len(b) // target_bytes)
                small = b[::k]
                n_bytes.append(len(b))
                r_bytes.append(len(small))
                r_md5.append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "resized_bytes": pd.Series(r_bytes, dtype="int32"),
                    "resized_md5": r_md5,
                }
            )

    return df.mapInPandas(op, schema=RESIZE_SCHEMA)
