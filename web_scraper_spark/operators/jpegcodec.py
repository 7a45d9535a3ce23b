"""Pure-stdlib/numpy baseline JPEG decoder — the compressed-format decode.

Closes the last multimodal stub tier: PNG/WAV/Y4M already decode for
real (pngcodec/wavcodec/y4mcodec), but compressed formats stayed behind
``fake=True`` for lack of PIL/ffmpeg. Baseline JPEG (ITU-T T.81 /
ISO 10918-1, SOF0) needs nothing beyond bit twiddling and an 8×8 IDCT,
so this module implements it from the public spec:

- marker parse (APPn/COM skipped, DQT 8-bit tables, SOF0, DHT canonical
  Huffman, DRI restart intervals, SOS single scan);
- entropy decode: canonical Huffman per T.81 Annex C, byte-stuffing
  (FF 00) removal, RSTn handling (DC predictor + bit alignment reset);
- per-block: DC prediction + EXTEND, AC run-length (EOB/ZRL),
  dequantize in zigzag order, orthonormal 8×8 IDCT (one numpy matrix
  sandwich per block), level shift;
- chroma upsampling by sample replication per sampling factors (4:2:0
  and 4:4:4 both covered), BT.601 YCbCr→RGB.

Correctness is proven against an INDEPENDENT ground truth: the CPython
test-suite fixture pair python.jpg / python.ppm (the same 16×16 logo as
a baseline 4:2:0 JPEG and as raw PPM pixels) — the decoder must land
within JPEG quantization distance of the raw pixels
(tests/test_jpeg.py), so a self-consistent-but-nonstandard decoder
cannot pass. Progressive (SOF2) and arithmetic-coded streams raise.

This is a correctness decoder for the Spark plumbing (a few KB/s per
core — entropy decoding is a Python loop); production puts libjpeg/PIL
at the same mapInPandas swap point (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal DCT-II matrix: f = C.T @ F @ C reconstructs the block
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class JpegError(ValueError):
    pass


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 C.2: {(bit_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker. RSTn is consumed by the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bits = 0
        self.nbits = 0

    def expect_rst(self, n: int) -> None:
        """Consume the RSTn marker at the current (byte-aligned) position."""
        self.align()
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != (0xD0 + n):
            raise JpegError(f"expected RST{n} at byte {self.pos}")
        self.pos += 2


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array (grayscale
    streams are replicated across channels). Malformed streams always
    raise JpegError — never a raw KeyError/IndexError (ADVICE r3)."""
    try:
        return _jpeg_decode_impl(data)
    except JpegError:
        raise
    except (KeyError, IndexError, ValueError, StopIteration, struct.error) as e:
        raise JpegError(f"malformed JPEG stream: {type(e).__name__}: {e}") from e


# standalone markers that carry NO 2-byte length segment (T.81 §B.1.1.3):
# TEM, RSTn (stray, outside entropy data), SOI
_STANDALONE_MARKERS = frozenset({0x01, *range(0xD0, 0xD8), 0xD8})


def _jpeg_decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            raise JpegError(f"marker desync at byte {i}")
        # skip 0xFF fill bytes between segments (T.81 §B.1.1.2 allows
        # any number of fill bytes before a marker)
        while i < len(data) - 1 and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            raise JpegError("EOI before SOS")
        if marker in _STANDALONE_MARKERS:  # length-less: skip the pair
            i += 2
            continue
        if i + 4 > len(data):
            raise JpegError("truncated marker segment header")
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(seg[p + 1:p + 65], np.uint8).astype(np.int32)
                p += 65
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (Huffman sequential)
            if seg[0] != 8:
                raise JpegError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            for c in range(seg[5]):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"non-baseline SOF (FF{marker:02X}) unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                huff[(tc, th)] = _build_huffman(counts, seg[p + 17:p + 17 + n])
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append({**comp, "dc": tables >> 4, "ac": tables & 15})
            ecs_start = i + 2 + seg_len
            return _decode_scan(
                data, ecs_start, h, w, scan, qtables, huff, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + seg_len
    raise JpegError("no SOS marker")


def _decode_scan(data, pos, h, w, scan, qtables, huff, restart_interval):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), np.float64) for c in scan
    ]
    pred = [0] * len(scan)
    br = _BitReader(data, pos)
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(br, huff[(0, c["dc"])], huff[(1, c["ac"])], q, pred, ci)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    # upsample each component to full grid by sample replication, crop
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _decode_block(br, dc_table, ac_table, q, pred, ci):
    zz = np.zeros(64, np.int32)
    try:
        t = _decode_huff(br, dc_table)
        diff = _extend(br.read_bits(t), t) if t else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _decode_huff(br, ac_table)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL: skip 16 zeros
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise JpegError("AC run past block end")
            zz[k] = _extend(br.read_bits(s), s)
            k += 1
    except _MarkerHit as m:
        raise JpegError(f"marker FF{m.marker:02X} inside entropy data")
    coeffs = np.zeros(64, np.float64)
    coeffs[ZIGZAG] = zz * q  # dequantize + de-zigzag
    block = _C.T @ coeffs.reshape(8, 8) @ _C
    return block + 128.0


def ppm_decode(data: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8 (the conformance ground truth)."""
    if not data.startswith(b"P6"):
        raise ValueError("only binary P6 PPM supported")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i] in b" \t\r\n":
            i += 1
        if data[i:i + 1] == b"#":
            while data[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while data[j] not in b" \t\r\n":
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return np.frombuffer(data[i:i + w * h * 3], np.uint8).reshape(h, w, 3)
