"""Real stdlib media kernels: BMP decode/resize, WAV PCM features,
uncompressed-AVI frame sampling (no PIL/ffmpeg — struct + numpy)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from name_match_latest_spark.operators.multimodal import (
    auto_featurize,
    decode_bmp,
    decode_wav_pcm16,
    encode_bmp,
)

MEDIA_SCHEMA = StructType(
    [StructField("media_id", LongType(), False), StructField("payload", BinaryType(), True)]
)


def _bmp(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return encode_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def _wav(rate=8000, seconds=0.5, freq=440.0):
    n = int(rate * seconds)
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi(n_frames=10, w=4, h=3, fps=5):
    """Minimal uncompressed RIFF/AVI: avih + strf + movi/00db frames."""
    frames = []
    for i in range(n_frames):
        img = np.full((h, w, 3), i * 20 % 256, dtype=np.uint8)
        bmp = encode_bmp(img)
        frames.append(bmp[54:])  # DIB bits only, like a real '00db'

    def chunk(fourcc, payload):
        out = fourcc + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")

    avih = chunk(b"avih", struct.pack("<I", int(1e6 / fps)) + b"\x00" * 52)
    strf_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    strf = chunk(b"strf", strf_hdr)
    hdrl = chunk(b"LIST", b"hdrl" + avih + strf)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", f) for f in frames))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def test_bmp_roundtrip():
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    rate, channels, samples = decode_wav_pcm16(_wav(rate=8000, seconds=0.25))
    assert (rate, channels, len(samples)) == (8000, 1, 2000)


def test_auto_featurize_paths():
    f_img = auto_featurize(_bmp(8, 6))
    assert f_img[0] == 1.0 and f_img[1] == pytest.approx(8 / 65535)
    f_wav = auto_featurize(_wav())
    assert f_wav[0] == 0.5 and 0.4 < f_wav[2] < 0.47  # sine RMS = amp/sqrt(2) ~ 0.432
    f_other = auto_featurize(b"\x89PNG....")
    assert f_other[0] != 1.0  # md5 fallback


def test_resize_bmp_distributed(spark):
    from name_match_latest_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, _bmp(16, 12, seed=1)), (2, _bmp(9, 5, seed=2))], MEDIA_SCHEMA
    )
    out = {r.media_id: r for r in resize_images(df, 4, 4).collect()}
    for mid, row in out.items():
        img = decode_bmp(bytes(row.resized))
        assert img.shape == (4, 4, 3)
    # nearest-neighbor is exact: check one pixel provenance
    src = decode_bmp(_bmp(16, 12, seed=1))
    got = decode_bmp(bytes(out[1].resized))
    assert np.array_equal(got[0, 0], src[0, 0])


def test_sample_video_frames_distributed(spark):
    from name_match_latest_spark.operators.multimodal import sample_video_frames

    df = spark.createDataFrame([(1, _avi(n_frames=10, fps=5))], MEDIA_SCHEMA)
    # 10 frames at 5 fps = 2s of video; 1 frame/s -> every 5th frame -> 2
    rows = sample_video_frames(df, every_n_seconds=1.0).collect()
    frames = rows[0].frames
    assert len(frames) == 2
    img0 = decode_bmp(bytes(frames[0]))
    assert img0.shape == (3, 4, 3)
    assert img0[0, 0, 0] == 0  # frame 0 fill value
    img1 = decode_bmp(bytes(frames[1]))
    assert img1[0, 0, 0] == 100  # frame 5 fill value (5*20)


def test_compressed_video_raises(spark):
    from name_match_latest_spark.operators.multimodal import sample_video_frames

    bad = _avi(n_frames=2).replace(b"00db", b"00dc")
    df = spark.createDataFrame([(1, bad)], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="ffmpeg"):
        sample_video_frames(df).collect()


def test_avi_media_kind(spark):
    from name_match_latest_spark.operators.multimodal import attach_media_metadata

    df = spark.createDataFrame([(1, _avi()), (2, _wav())], MEDIA_SCHEMA)
    got = {r.media_id: r.media_kind for r in attach_media_metadata(df).collect()}
    assert got[1] == "video/avi"
    assert got[2] == "audio/wav"
