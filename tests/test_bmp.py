"""BMP decoder: pixel-EXACT conformance (uncompressed format, so the
CPython fixture python.bmp must reproduce the raw-pixel twin python.ppm
bit-for-bit) + synthetic coverage of the 24 bpp/top-down/padded layouts
the 32 bpp fixture can't exercise."""

import struct

import numpy as np
import pytest

from web_scraper_spark.operators.bmpcodec import BmpError, bmp_decode
from web_scraper_spark.operators.jpegcodec import ppm_decode

from tests.test_jpeg import _fixture


def test_bmp_exact_ground_truth():
    img = bmp_decode(_fixture("python.bmp"))
    truth = ppm_decode(_fixture("python.ppm"))
    assert img.shape == (16, 16, 3)
    assert np.array_equal(img, truth)  # bit-for-bit


def _bmp24(arr, top_down=False):
    """Minimal BITMAPINFOHEADER 24 bpp writer (bottom-up unless top_down)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = arr if top_down else arr[::-1]
    body = b"".join(
        rows[r][:, ::-1].tobytes() + b"\x00" * (stride - w * 3) for r in range(h)
    )
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body), 0, 0, 0, 0
    )
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + hdr + body
    )


def test_bmp24_roundtrip_padding_and_row_order():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (5, 3, 3), np.uint8)  # w=3 → 9-byte rows, 3 pad
    assert np.array_equal(bmp_decode(_bmp24(arr)), arr)
    assert np.array_equal(bmp_decode(_bmp24(arr, top_down=True)), arr)


def test_bmp_errors():
    with pytest.raises(BmpError):
        bmp_decode(b"PX whatever")
    data = bytearray(_fixture("python.bmp"))
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8
    with pytest.raises(BmpError, match="compression"):
        bmp_decode(bytes(data))


def test_bmp_truncated_raises_bmperror():
    """ADVICE r3: truncation must raise BmpError, not a numpy ValueError."""
    full = _fixture("python.bmp")
    with pytest.raises(BmpError, match="truncated"):
        bmp_decode(full[: len(full) - 40])
    arr = np.zeros((4, 4, 3), np.uint8)
    whole = _bmp24(arr)
    with pytest.raises(BmpError, match="truncated"):
        bmp_decode(whole[:-5])
