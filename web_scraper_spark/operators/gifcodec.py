"""Pure-stdlib GIF decoder (87a/89a, LZW) — the lossless compressed image.

Companion to jpegcodec: GIF's LZW is lossless, so conformance against
the CPython fixture's raw-pixel twin is PIXEL-EXACT equality
(tests/test_gif.py), the strongest possible decode proof. Implements the
full still-image path from the public spec (GIF89a specification /
Welch 1984 LZW): logical screen + global/local color tables, extension
blocks (skipped; transparency index honored via the graphic-control
extension), interlaced row reorder, and the variable-code-width LZW
stream (clear/end codes, dictionary growth to 4096, width bumps at
2^width). Animated GIFs: the FIRST frame is returned (training-data
pipelines treat animated GIF as video; frame walks belong with
y4mcodec's sampling shape).
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    pass


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dict_init = [[i] for i in range(clear)] + [None, None]
    table = list(dict_init)
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # tolerate missing explicit end code
            acc |= data[pos] << nbits  # GIF packs LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_init)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise GifError(f"bad LZW code {code}")
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = list(entry)


def gif_decode_indexed(data: bytes) -> tuple[np.ndarray, np.ndarray, int | None]:
    """Decode the first image of a GIF to its raw form: (index grid
    (h, w) int32, palette (n, 3) uint8, transparent index or None)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    try:
        return _decode_indexed(data)
    except IndexError as e:  # truncated stream: ran off the block structure
        raise GifError(f"truncated GIF: {e}") from e


def _decode_indexed(data: bytes) -> tuple[np.ndarray, np.ndarray, int | None]:
    sw = data[6] | data[7] << 8
    sh = data[8] | data[9] << 8
    flags = data[10]
    bg_index = data[11]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[i:i + 3 * n], np.uint8).reshape(n, 3)
        i += 3 * n
    transparent = None
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension
            label = data[i + 1]
            i += 2
            if label == 0xF9 and data[i] >= 4 and (data[i + 1] & 1):
                transparent = data[i + 4]
            while data[i]:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            ix = data[i + 1] | data[i + 2] << 8
            iy = data[i + 3] | data[i + 4] << 8
            iw = data[i + 5] | data[i + 6] << 8
            ih = data[i + 7] | data[i + 8] << 8
            f = data[i + 9]
            i += 10
            ct = gct
            if f & 0x80:
                n = 2 << (f & 7)
                ct = np.frombuffer(data[i:i + 3 * n], np.uint8).reshape(n, 3)
                i += 3 * n
            if ct is None:
                raise GifError("no color table")
            min_code_size = data[i]
            i += 1
            chunks = []
            while data[i]:
                sz = data[i]
                chunks.append(data[i + 1:i + 1 + sz])
                i += 1 + sz
            i += 1
            idx = _lzw_decode(min_code_size, b"".join(chunks))
            if len(idx) < iw * ih:
                raise GifError(f"LZW underrun: {len(idx)} < {iw * ih}")
            grid = np.array(idx[: iw * ih], np.int32).reshape(ih, iw)
            if f & 0x40:  # interlaced: rows arrive in 4 passes
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            if ix + iw > sw or iy + ih > sh:
                # out-of-screen descriptor would silently truncate via
                # numpy slice broadcasting (shape mismatch ValueError) —
                # raise the module error type instead (ADVICE r3)
                raise GifError(
                    f"image descriptor {iw}x{ih}@({ix},{iy}) exceeds "
                    f"logical screen {sw}x{sh}"
                )
            canvas = np.full((sh, sw), bg_index, np.int32)
            canvas[iy:iy + ih, ix:ix + iw] = grid
            return canvas, ct, transparent
        elif b == 0x3B:
            break
        else:
            raise GifError(f"unknown block 0x{b:02X} at byte {i}")
    raise GifError("no image data")


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the first image of a GIF to (h, w, 3) uint8 RGB (transparent
    pixels keep their palette color — compositing policy belongs to the
    caller; gif_decode_indexed exposes the transparency index)."""
    grid, palette, _ = gif_decode_indexed(data)
    return palette[np.clip(grid, 0, len(palette) - 1)]
