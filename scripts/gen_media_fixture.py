"""Generate fixtures/media_meta.parquet: a deterministic corpus of
real encoded media blobs (BMP / PNG plain+Adam7 / GIF plain+interlace
/ JPEG baseline+progressive, 4:4:4 and 4:2:0 / WAV PCM16) used by the
`media_meta` oracle query — the DuckDB twin re-derives kind + pixel
dimensions from raw header bytes, so the fixture lets the driver gate
hash-verify the engine's JVM-side binary-column parsing end-to-end.

Also asserts the layout constants the SQL oracle embeds as literals:
our JPEG encoder puts the SOF marker at byte offset 89 in every mode
(SOI + APP0(JFIF) + 2 DQTs are fixed-size), mirrored by
`_JPEG_SOF_OFF` in operators/multimodal.py and re-asserted by
tests/test_media_meta.py.

Rerun after any encoder layout change:  python scripts/gen_media_fixture.py
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from name_match_latest_spark.operators.jpeg import encode_jpeg  # noqa: E402
from name_match_latest_spark.operators.multimodal import (  # noqa: E402
    JPEG_SOF_OFF,
    encode_bmp,
    encode_gif,
    encode_png,
)


def _img(rng: np.random.Generator, h: int, w: int, colors: int | None = None):
    if colors is None:
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # low-cardinality frame so GIF's <=256-color constraint holds
    palette = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    idx = rng.integers(0, colors, (h, w))
    return palette[idx]


def _wav(rng: np.random.Generator, n: int, hz: int = 8000) -> bytes:
    samples = rng.integers(-2000, 2000, n, dtype=np.int16)
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, hz, hz * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def main() -> None:
    rng = np.random.default_rng(20260817)
    rows: list[tuple[int, bytes]] = []
    mid = 0

    def add(payload: bytes) -> None:
        nonlocal mid
        rows.append((mid, payload))
        mid += 1

    shapes = [(8, 8), (17, 23), (31, 9), (12, 40), (64, 48), (5, 5)]
    for h, w in shapes:
        add(encode_bmp(_img(rng, h, w)))
        add(encode_png(_img(rng, h, w)))
        add(encode_png(_img(rng, h, w), interlace=True))
        add(encode_gif(_img(rng, h, w, colors=40)))
        add(encode_jpeg(_img(rng, h, w)))
        add(encode_jpeg(_img(rng, h, w), subsample=True))
        add(encode_jpeg(_img(rng, h, w), progressive=True))
    add(_wav(rng, 400))
    add(_wav(rng, 1234, hz=16000))

    # layout assertion: every fixture JPEG has its SOF marker exactly
    # at the offset the SQL oracle hard-codes
    for _mid, p in rows:
        if p[:3] == b"\xff\xd8\xff":
            assert p[JPEG_SOF_OFF] == 0xFF and p[JPEG_SOF_OFF + 1] in (
                0xC0,
                0xC2,
            ), f"JPEG SOF not at {JPEG_SOF_OFF} in media_id={_mid}"

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "fixtures",
        "media_meta.parquet",
    )
    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {len(rows)} blobs -> {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
