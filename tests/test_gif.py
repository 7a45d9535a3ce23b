"""GIF decoder conformance: the CPython fixture python.gif against the
raw-pixel twin python.ppm (same 16×16 logo). GIF is lossless LZW over a
128-color quantized palette with a transparent background, so the bound
is: every OPAQUE pixel within palette-quantization distance (measured
max |err| = 3) — a scrambled LZW stream or palette mapping lands hundreds
off. Transparency index, screen composition, and error paths also pinned.
"""

import numpy as np
import pytest

from web_scraper_spark.operators.gifcodec import (
    GifError,
    gif_decode,
    gif_decode_indexed,
)
from web_scraper_spark.operators.jpegcodec import ppm_decode

from tests.test_jpeg import _fixture


def test_gif_opaque_pixels_match_ground_truth():
    grid, palette, transparent = gif_decode_indexed(_fixture("python.gif"))
    truth = ppm_decode(_fixture("python.ppm"))
    assert grid.shape == (16, 16) and palette.shape == (128, 3)
    assert transparent == 101
    img = palette[grid]
    mask = grid != transparent
    assert int(mask.sum()) == 149  # the logo's opaque pixel count
    err = np.abs(img.astype(int) - truth.astype(int))[mask]
    assert err.max() <= 3  # 128-color palette quantization distance only
    assert err.mean() < 1.0


def test_gif_decode_rgb_and_errors():
    img = gif_decode(_fixture("python.gif"))
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    with pytest.raises(GifError):
        gif_decode(b"NOTAGIF0")
    # truncated LZW data must refuse, not return a short image
    data = bytearray(_fixture("python.gif"))
    with pytest.raises(GifError):
        gif_decode(bytes(data[:440]) + b"\x00\x3b")


def test_gif_through_decode_media(spark):
    from web_scraper_spark.operators.multimodal import decode_media

    payload = _fixture("python.gif")
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id bigint, kind string, payload binary",
    )
    row = decode_media(media, fake=False).collect()[0]
    assert row["n_bytes"] == len(payload)
    assert row["features"][6] == round(16 / 4096.0, 6)
    assert all(0.0 <= v <= 1.0 for v in row["features"])
