"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline treats media as ``binary`` payload columns
with typed metadata alongside; transforms run as Arrow-batched
``mapInPandas`` so each batch moves one Arrow buffer, never one row.

Decode support (no PIL/ffmpeg in this container — these kernels are
pure stdlib ``struct`` + numpy, i.e. REAL decodes, not stubs):

* images — uncompressed 24-bit BMP: decode, nearest-neighbor resize,
  re-encode.  Compressed formats (PNG/JPEG) raise at execution time
  with a clear message: their codecs genuinely need PIL/opencv.
* audio  — RIFF/WAVE PCM16: real sample decode -> duration/RMS/ZCR/
  peak features.
* video  — uncompressed RIFF/AVI ('00db' DIB frames): real frame
  sampling by timestamp, frames re-wrapped as standalone BMPs.
  Compressed codecs ('00dc') raise: they need ffmpeg.
* everything else — ``DETERMINISTIC_FAKE`` md5 features keep the
  pipeline runnable end-to-end and byte-reproducible.

Operators:
* ``attach_media_metadata``  — sniff magic bytes -> media_kind, size
* ``decode_and_featurize``   — binary -> fixed-dim float feature vector
* ``resize_images``          — BMP binary -> BMP binary (target WxH)
* ``sample_video_frames``    — AVI binary -> array of BMP frame payloads
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
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
    "decode_bmp",
    "encode_bmp",
    "decode_wav_pcm16",
]

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff media kind from magic bytes + record payload size.
    Pure Column expressions — a metadata pass never decodes.
    RIFF containers are disambiguated by their form type (WAVE/AVI)."""
    p = F.col(payload_col)
    kind = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        hexmagic = magic.hex()
        kind = F.when(
            F.startswith(F.hex(p), F.lit(hexmagic.upper())), F.lit(mime)
        ).otherwise(kind)
    riff_form = F.upper(F.hex(F.substring(p, 9, 4)))
    kind = (
        F.when(kind != "audio/wav", kind)
        .when(riff_form == F.lit(b"AVI ".hex().upper()), F.lit("video/avi"))
        .otherwise(F.lit("audio/wav"))
    )
    return df.withColumns(
        {"media_kind": kind, "media_bytes": F.length(p).cast("long")}
    )


# --- pure-stdlib codecs -------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP -> (H, W, 3) uint8 BGR
    (top-down row order)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<IiiH", payload, 14)[:3]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    h = abs(height)
    row_size = (width * 3 + 3) & ~3
    need = data_off + row_size * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_off)
    img = rows.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
    return img[::-1].copy() if bottom_up else img.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 BGR -> bottom-up 24-bit BMP bytes."""
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    body = bytearray()
    for row in img[::-1]:
        body += row.tobytes() + b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return bytes(file_hdr + info + body)


def _resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi]


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF body."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", buf, pos)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (sample_rate, channels, int16 samples)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    rate = channels = None
    data = None
    for fourcc, off, size in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"fmt " and size >= 16:
            fmt, channels, rate = struct.unpack_from("<HHI", payload, off)
            bits = struct.unpack_from("<H", payload, off + 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAVE encoding (fmt={fmt}, bits={bits})")
        elif fourcc == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=off)
    if rate is None or data is None:
        raise ValueError("WAVE missing fmt/data chunks")
    return rate, channels, data


def _avi_frames(payload: bytes) -> tuple[float, bytes, list[bytes]]:
    """RIFF/AVI -> (seconds_per_frame, video strf BITMAPINFOHEADER,
    uncompressed '00db' frame payloads).  '00dc' (compressed) raises."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    spf, strf, frames = None, None, []

    def walk(start: int, end: int) -> None:
        nonlocal spf, strf
        for fourcc, off, size in _riff_chunks(payload, start, end):
            if fourcc == b"LIST":
                walk(off + 4, off + size)  # skip the list-type fourcc
            elif fourcc == b"avih":
                spf = struct.unpack_from("<I", payload, off)[0] / 1e6
            elif fourcc == b"strf" and strf is None:
                strf = payload[off : off + size]
            elif fourcc == b"00db":
                frames.append(payload[off : off + size])
            elif fourcc == b"00dc":
                raise NotImplementedError(
                    "compressed AVI stream ('00dc') requires ffmpeg, "
                    "unavailable in this container — only uncompressed "
                    "'00db' DIB frames decode here"
                )

    walk(12, len(payload))
    if spf is None or strf is None:
        raise ValueError("AVI missing avih/strf headers")
    return spf, strf, frames


# --- feature extraction -------------------------------------------------------

FEATURE_DIM = 16


def DETERMINISTIC_FAKE(payload: bytes) -> list[float]:
    """Deterministic fallback feature extractor: md5-derived floats.
    Stands in for codecs this container cannot run (PNG/JPEG/MP3/MP4);
    byte-identical across runs so downstream tests are exact."""
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _pad(feats: list[float]) -> list[float]:
    feats = [float(min(max(x, 0.0), 1.0)) for x in feats[:FEATURE_DIM]]
    return feats + [0.0] * (FEATURE_DIM - len(feats))


def auto_featurize(payload: bytes) -> list[float]:
    """Real features for formats we can decode (BMP pixels, WAV
    samples); md5 fallback otherwise.  Slot 0 tags the path:
    1.0 = image stats, 0.5 = audio stats, fallback = md5[0]/255."""
    payload = payload or b""
    try:
        if payload[:2] == b"BM":
            img = decode_bmp(payload).astype(np.float64) / 255.0
            h, w = img.shape[:2]
            means = img.reshape(-1, 3).mean(axis=0)
            stds = img.reshape(-1, 3).std(axis=0)
            return _pad([1.0, w / 65535.0, h / 65535.0, *means, *stds])
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            rate, channels, samples = decode_wav_pcm16(payload)
            x = samples.astype(np.float64) / 32768.0
            dur = len(samples) / max(rate * channels, 1)
            rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
            zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
            peak = float(np.max(np.abs(x))) if len(x) else 0.0
            return _pad(
                [0.5, min(dur / 3600.0, 1.0), rms, zcr, peak,
                 channels / 8.0, rate / 192000.0]
            )
    except (ValueError, struct.error):
        pass  # malformed payload -> deterministic fallback
    return DETERMINISTIC_FAKE(payload)


_DECODER: Callable[[bytes], list[float]] = auto_featurize


def set_decoder(fn: Callable[[bytes], list[float]]) -> None:
    """Swap in an external decoder (e.g. PIL -> CLIP features) when the
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
    """binary -> binary resized image via mapInPandas.  REAL for
    uncompressed 24-bit BMP (stdlib decode + numpy nearest-neighbor);
    compressed formats raise at execution time — PNG/JPEG codecs need
    PIL/opencv, absent from this container."""
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
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                payload = bytes(b) if b is not None else b""
                if payload[:2] != b"BM":
                    raise NotImplementedError(
                        "non-BMP image resize requires PIL/opencv, "
                        "unavailable in this container (BMP decodes here)"
                    )
                out.append(encode_bmp(_resize_nearest(decode_bmp(payload), width, height)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                }
            )

    return src.mapInPandas(run, schema=schema)


def sample_video_frames(
    df: DataFrame,
    every_n_seconds: float = 1.0,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """video binary -> array<binary> frame samples via mapInPandas.
    REAL for uncompressed RIFF/AVI ('00db' DIB frames, sampled by
    timestamp and re-wrapped as standalone BMPs); compressed codecs
    raise — they need ffmpeg."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("frames", ArrayType(BinaryType()), False),
        ]
    )
    src = df.select(id_col, payload_col)

    def run(batches):
        for pdf in batches:
            sampled = []
            for b in pdf[payload_col]:
                payload = bytes(b) if b is not None else b""
                spf, strf, frames = _avi_frames(payload)
                step = max(1, round(every_n_seconds / max(spf, 1e-9)))
                picked = frames[::step]
                wrapped = []
                for dib in picked:
                    file_hdr = struct.pack(
                        "<2sIHHI", b"BM", 14 + len(strf) + len(dib), 0, 0, 14 + len(strf)
                    )
                    wrapped.append(file_hdr + strf + dib)
                sampled.append(wrapped)
            yield pd.DataFrame({id_col: pdf[id_col], "frames": sampled})

    return src.mapInPandas(run, schema=schema)
