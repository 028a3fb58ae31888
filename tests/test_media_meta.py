"""Header-byte dims (pure Column, attach_image_dims) must agree with
full codec decode for every blob in the committed media fixture, and
the JPEG fixed-SOF layout constant the SQL oracle embeds must match a
real marker scan."""

from __future__ import annotations

import os

import pytest

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "fixtures",
    "media_meta.parquet",
)


@pytest.fixture(scope="module")
def media_rows(spark):
    from name_match_latest_spark.operators.multimodal import (
        attach_image_dims,
        attach_media_metadata,
    )

    df = spark.read.parquet(os.path.abspath(FIXTURE))
    out = attach_image_dims(attach_media_metadata(df))
    return out.select(
        "media_id", "payload", "media_kind", "width", "height"
    ).collect()


def test_header_dims_match_full_decode(media_rows):
    from name_match_latest_spark.operators.multimodal import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_png,
    )

    decoders = {
        "image/bmp": decode_bmp,
        "image/png": decode_png,
        "image/gif": decode_gif,
        "image/jpeg": decode_jpeg,
    }
    n_images = 0
    for r in media_rows:
        dec = decoders.get(r.media_kind)
        if dec is None:
            assert r.width is None and r.height is None, r.media_kind
            continue
        img = dec(bytes(r.payload))
        assert (r.height, r.width) == img.shape[:2], (
            r.media_id,
            r.media_kind,
        )
        n_images += 1
    assert n_images >= 40  # every encoder mode is represented


def test_jpeg_sof_offset_constant(media_rows):
    from name_match_latest_spark.operators.multimodal import JPEG_SOF_OFF

    n_jpeg = 0
    for r in media_rows:
        if r.media_kind != "image/jpeg":
            continue
        p = bytes(r.payload)
        scan = [
            i
            for i in range(len(p) - 1)
            if p[i] == 0xFF and p[i + 1] in (0xC0, 0xC2)
        ]
        assert scan[0] == JPEG_SOF_OFF, r.media_id
        n_jpeg += 1
    assert n_jpeg >= 12  # baseline, 4:2:0, progressive per shape


def test_foreign_jpeg_layout_gets_null_dims(spark):
    """A JPEG whose SOF is NOT at our encoder's fixed offset (e.g. an
    EXIF APP1 camera file) must yield NULL dims, not garbage decoded
    from table bytes."""
    from name_match_latest_spark.operators.multimodal import (
        attach_image_dims,
        attach_media_metadata,
    )

    # SOI + APP1(EXIF) stub + padding: valid magic, no SOF at offset 89
    foreign = (
        b"\xff\xd8\xff\xe1" + (200).to_bytes(2, "big") + b"Exif\x00\x00"
        + bytes(220)
    )
    rows = attach_image_dims(
        attach_media_metadata(
            spark.createDataFrame(
                [(0, bytearray(foreign))], "media_id long, payload binary"
            )
        )
    ).collect()
    assert rows[0].media_kind == "image/jpeg"
    assert rows[0].width is None and rows[0].height is None


def test_unknown_payload_null_dims(spark):
    from name_match_latest_spark.operators.multimodal import (
        attach_image_dims,
        attach_media_metadata,
    )

    df = spark.createDataFrame(
        [(0, bytearray(b"not an image at all")), (1, bytearray(b""))],
        "media_id long, payload binary",
    )
    rows = attach_image_dims(attach_media_metadata(df)).collect()
    for r in rows:
        assert r.width is None and r.height is None
        assert r.media_kind == "application/octet-stream"
