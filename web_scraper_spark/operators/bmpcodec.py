"""Pure-stdlib BMP decoder — the pixel-EXACT uncompressed image format.

Completes the image-conformance ladder (tests/test_bmp.py): BMP stores
raw pixels, so decoding the CPython fixture python.bmp must reproduce
its raw-pixel twin python.ppm EXACTLY — bit-for-bit equality, the
strongest possible decode proof (pngcodec gets the same via zlib;
gifcodec is palette-tight; jpegcodec is quantization-bounded).

Supports the layouts web corpora actually carry: BITMAPINFO/V4/V5
headers, 24 bpp BI_RGB (BGR, 4-byte row padding) and 32 bpp
BI_RGB/BI_BITFIELDS (per-channel masks honored), bottom-up and top-down
(negative height) row order, and 8 bpp palettized BI_RGB. RLE and 16 bpp
refuse loudly.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def _mask_shift(mask: int) -> tuple[int, int]:
    """(shift, span) of a contiguous channel mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    span = (mask >> shift).bit_length()
    return shift, span


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a BMP to (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise BmpError("not a BMP")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise BmpError("BITMAPCOREHEADER unsupported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    top_down = h_raw < 0
    h = abs(h_raw)
    if comp not in (0, 3):
        raise BmpError(f"compression {comp} unsupported (only BI_RGB/BI_BITFIELDS)")
    if w <= 0 or h == 0:
        raise BmpError(f"invalid dimensions {w}x{h_raw}")

    def _check_bounds(stride: int) -> None:
        # a truncated file must raise BmpError, not an opaque numpy
        # reshape/stack ValueError (ADVICE r3)
        if pix_off + h * stride > len(data):
            raise BmpError(
                f"truncated pixel data: need {pix_off + h * stride} bytes, "
                f"have {len(data)}"
            )

    if bpp == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal_raw = np.frombuffer(data[pal_off:pal_off + 4 * n_colors], np.uint8)
        if len(pal_raw) < 4 * n_colors:
            raise BmpError("truncated palette")
        pal = pal_raw.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        _check_bounds(stride)
        rows = [
            pal[np.frombuffer(data[pix_off + r * stride:][:w], np.uint8)]
            for r in range(h)
        ]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        _check_bounds(stride)
        if bpp == 32 and comp == 3:
            rm, gm, bm = struct.unpack("<III", data[54:66])
        else:
            rm, gm, bm = 0x00FF0000, 0x0000FF00, 0x000000FF
        rows = []
        for r in range(h):
            raw = np.frombuffer(data[pix_off + r * stride:][: w * nb], np.uint8)
            if bpp == 24:
                rows.append(raw.reshape(w, 3)[:, ::-1])  # BGR → RGB
            else:
                v = raw.reshape(w, 4).astype(np.uint32)
                word = v[:, 0] | v[:, 1] << 8 | v[:, 2] << 16 | v[:, 3] << 24
                chans = []
                for mask in (rm, gm, bm):
                    shift, span = _mask_shift(mask)
                    c = (word & mask) >> shift
                    if span and span != 8:  # scale to 8-bit
                        c = (c * 255) // ((1 << span) - 1)
                    chans.append(c.astype(np.uint8))
                rows.append(np.stack(chans, axis=1))
    else:
        raise BmpError(f"{bpp} bpp unsupported")
    arr = np.stack(rows, axis=0)  # rows are stored bottom-up unless top_down
    return (arr if top_down else arr[::-1]).copy()
