"""Pure-stdlib PNG codec (zlib + numpy): the ONE real pixel decoder.

The container has no PIL/ffmpeg, so most of operators/multimodal.py's
decode tier is a documented stub — but PNG needs nothing beyond zlib
(stdlib) and filter reconstruction, so this module implements it from the
public spec (RFC 2083 / W3C PNG): 8-bit truecolor (color type 2, RGB) and
truecolor+alpha (type 6, alpha dropped on decode), non-interlaced, all
five scanline filters (None/Sub/Up/Average/Paeth). That makes the
reference's "fetch bytes → decode → derive" shape
(`/root/reference/CrawlPaperTuoiTre.py`'s parse analogue for binary
columns) run end-to-end with REAL pixels for one format, while jpeg/
audio/video stay behind the fake=True stubs.

This is a correctness decoder for the Spark plumbing, not a speed demon:
Sub/Up vectorize (numpy cumsum / row add); Average/Paeth fall back to a
per-pixel loop (their recurrences are inherently sequential). Production
would put libpng/PIL at the same mapInPandas swap point.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a PNG (filter 0 rows)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w, _ = arr.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, 3) uint8 RGB array.

    Supports bit depth 8, color types 2 (RGB) and 6 (RGBA — alpha is
    dropped), no interlacing. Raises ValueError on anything else."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    w = h = None
    channels = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (2, 6) or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
                )
            channels = 3 if color == 2 else 4
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    bpp = channels
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        if f == 0:
            recon = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp] → per-channel cumsum
            recon = line
            for c in range(bpp):
                recon[c::bpp] = np.cumsum(recon[c::bpp], dtype=np.uint64) & 0xFF
        elif f == 2:  # Up
            recon = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average (sequential in x)
            recon = line
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                recon[x] = (int(recon[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth (sequential in x)
            recon = line
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (int(recon[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = recon
        prev = recon
    img = out.reshape(h, w, bpp)
    return np.ascontiguousarray(img[:, :, :3])


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, 3) → (height, width, 3): source
    index = floor(out_index * in_size / out_size) — the standard mapping,
    so tests can recompute expected rasters independently."""
    in_h, in_w = arr.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * in_h) // height
    xs = (np.arange(width, dtype=np.int64) * in_w) // width
    return np.ascontiguousarray(arr[ys][:, xs])
