"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline treats media as ``binary`` payload columns
with typed metadata alongside; transforms run as Arrow-batched
``mapInPandas`` so each batch moves one Arrow buffer, never one row.

The decode kernels (PIL/ffmpeg/soundfile) are NOT available in this
container — the decode step is STUBBED behind
``set_decoder``/``DETERMINISTIC_FAKE`` with the Spark-side plumbing
(schemas, batch shapes, partitioning, UDF signatures) fully real and
tested.  Swapping in a real decoder is a one-function change.

Operators:
* ``attach_media_metadata``  — sniff magic bytes -> media_kind, size
* ``decode_and_featurize``   — binary -> fixed-dim float feature vector
* ``resize_images``          — binary -> binary (target WxH), stubbed
* ``sample_video_frames``    — binary -> array of frame payloads, stubbed
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_media_metadata",
    "decode_and_featurize",
    "resize_images",
    "sample_video_frames",
    "set_decoder",
    "DETERMINISTIC_FAKE",
]

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff media kind from magic bytes + record payload size.
    Pure Column expressions — a metadata pass never decodes."""
    p = F.col(payload_col)
    kind = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        hexmagic = magic.hex()
        kind = F.when(
            F.startswith(F.hex(p), F.lit(hexmagic.upper())), F.lit(mime)
        ).otherwise(kind)
    return df.withColumns(
        {"media_kind": kind, "media_bytes": F.length(p).cast("long")}
    )


# --- decode stub machinery ---------------------------------------------------

FEATURE_DIM = 16


def DETERMINISTIC_FAKE(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: md5-derived floats.
    Replaces the real (unavailable) image/audio decode+embed kernel;
    byte-identical across runs so downstream tests are exact."""
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


_DECODER: Callable[[bytes], list[float]] = DETERMINISTIC_FAKE


def set_decoder(fn: Callable[[bytes], list[float]]) -> None:
    """Swap in a real decoder (e.g. PIL -> CLIP features) when the
    libraries exist.  Must return FEATURE_DIM floats."""
    global _DECODER
    _DECODER = fn


def decode_and_featurize(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """binary -> float[FEATURE_DIM] features via mapInPandas (one Arrow
    batch per partition chunk; never per-row Python dispatch)."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("features", ArrayType(FloatType()), False),
        ]
    )
    src = df.select(id_col, payload_col)

    def run(batches):
        for pdf in batches:
            feats = [_DECODER(bytes(b) if b is not None else b"") for b in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return src.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary -> binary resized image.  STUB: real resize needs PIL,
    absent here — raises at EXECUTION time with a clear message while
    the plan/schema/batching plumbing stays real and testable."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("resized", BinaryType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    src = df.select(id_col, payload_col)

    def run(batches):
        for _pdf in batches:
            raise NotImplementedError(
                "image resize requires PIL/opencv, unavailable in this "
                "container — install and replace this kernel "
                "(plumbing: binary -> binary via mapInPandas)"
            )
            yield  # pragma: no cover

    return src.mapInPandas(run, schema=schema)


def sample_video_frames(
    df: DataFrame,
    every_n_seconds: float = 1.0,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """video binary -> array<binary> frame samples.  STUB like
    resize_images (needs ffmpeg)."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("frames", ArrayType(BinaryType()), False),
        ]
    )
    src = df.select(id_col, payload_col)

    def run(batches):
        for _pdf in batches:
            raise NotImplementedError(
                "frame sampling requires ffmpeg, unavailable in this "
                "container — install and replace this kernel "
                "(plumbing: binary -> array<binary> via mapInPandas)"
            )
            yield  # pragma: no cover

    return src.mapInPandas(run, schema=schema)
