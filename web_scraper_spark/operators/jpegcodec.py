"""Pure-stdlib/numpy JPEG decoder (baseline SOF0/1 + progressive SOF2).

Closes the last multimodal stub tier: PNG/WAV/Y4M already decode for
real (pngcodec/wavcodec/y4mcodec), but compressed formats stayed behind
``fake=True`` for lack of PIL/ffmpeg. Huffman-coded JPEG (ITU-T T.81 /
ISO 10918-1) needs nothing beyond bit twiddling and an 8×8 IDCT, so
this module implements it from the public spec:

- marker parse (APPn/COM skipped, DQT 8-bit tables, SOF0/1/2, DHT
  canonical Huffman, DRI restart intervals, SOS);
- entropy decode: canonical Huffman per T.81 Annex C, byte-stuffing
  (FF 00) removal, RSTn handling (DC predictor + bit alignment reset);
- baseline scan: per-block DC prediction + EXTEND, AC run-length
  (EOB/ZRL) into a zigzag coefficient array;
- progressive scans (T.81 Annex G): spectral selection (per-band AC
  scans with EOB-run coding) and successive approximation (DC/AC first
  + refinement passes, correction-bit protocol per G.1.2.3), coefficient
  arrays accumulated across scans until EOI;
- shared reconstruction: dequantize in zigzag order, vectorized
  orthonormal 8×8 IDCT (one einsum over all blocks), level shift,
  chroma upsampling by sample replication per sampling factors (4:2:0
  and 4:4:4 both covered), BT.601 YCbCr→RGB.

Correctness is proven against an INDEPENDENT ground truth: the CPython
test-suite fixture pair python.jpg / python.ppm (the same 16×16 logo as
a baseline 4:2:0 JPEG and as raw PPM pixels) — the decoder must land
within JPEG quantization distance of the raw pixels
(tests/test_jpeg.py), so a self-consistent-but-nonstandard decoder
cannot pass. The progressive path must additionally reproduce the
EXACT coefficient array of the baseline decode when fed a
coefficient-level progressive transcode of the same fixture
(tests/test_jpeg_progressive.py — every scan kind exercised).
Arithmetic-coded and hierarchical streams raise.

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
    return _reconstruct(*_parse_coefficients(data))


def jpeg_coefficients(data: bytes):
    """Quantized zigzag coefficient arrays (one (blocks_y, blocks_x, 64)
    int32 per component) plus frame metadata, WITHOUT reconstruction:
    ``(coefs, comps, qtables, h, w, hmax, vmax)``. Works for baseline and
    progressive streams — the conformance surface for coefficient-exact
    progressive-vs-baseline comparison (tests/test_jpeg_progressive.py)."""
    try:
        return _parse_coefficients(data)
    except JpegError:
        raise
    except (KeyError, IndexError, ValueError, StopIteration, struct.error) as e:
        raise JpegError(f"malformed JPEG stream: {type(e).__name__}: {e}") from e


def _parse_coefficients(data: bytes):
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = mcus_x = mcus_y = 0
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None
    scans_done = 0
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
            if progressive and scans_done:
                break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if seg[0] != 8:
                raise JpegError("only 8-bit precision supported")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            for c in range(seg[5]):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            hmax, vmax, mcus_x, mcus_y, coefs = _init_geometry(comps, h, w)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF (FF{marker:02X})")
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
            if coefs is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ci, comp = next(
                    (j, x) for j, x in enumerate(comps) if x["id"] == cs
                )
                scan.append({**comp, "ci": ci, "dc": tables >> 4, "ac": tables & 15})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            ecs_start = i + 2 + seg_len
            if not progressive:
                _decode_baseline_scan(
                    data, ecs_start, scan, coefs, huff, restart_interval,
                    mcus_x, mcus_y,
                )
                scans_done += 1
                break  # baseline: single scan
            pos = _decode_progressive_scan(
                data, ecs_start, scan, coefs, huff, restart_interval,
                mcus_x, mcus_y, ss, se, ah, al,
            )
            scans_done += 1
            i = _next_marker(data, pos)
            continue
        # APPn / COM / others: skip
        i += 2 + seg_len
    if scans_done and coefs is not None:
        return coefs, comps, qtables, h, w, hmax, vmax
    raise JpegError("no SOS marker")


def _init_geometry(comps, h, w):
    """MCU grid + per-component block dims (T.81 A.1.1/A.2.4): interleaved
    scans iterate the MCU grid; non-interleaved scans iterate the
    component's own ceil-div block grid (``nbx``/``nby``), which can be
    smaller than its slice of the padded MCU grid."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs = []
    for c in comps:
        c["nbx"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["nby"] = -(-(-(-h * c["v"] // vmax)) // 8)
        coefs.append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        )
    return hmax, vmax, mcus_x, mcus_y, coefs


def _next_marker(data: bytes, pos: int) -> int:
    """First marker (FF followed by a non-stuffing byte) at or after pos."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise JpegError("no marker after scan data")


def _decode_baseline_scan(data, pos, scan, coefs, huff, restart_interval,
                          mcus_x, mcus_y):
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
            for si, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = _decode_block_zz(
                            br, huff[(0, c["dc"])], huff[(1, c["ac"])], pred, si
                        )
                        coefs[c["ci"]][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu_count += 1


def _decode_block_zz(br, dc_table, ac_table, pred, si):
    """One baseline block: quantized coefficients in zigzag order."""
    zz = np.zeros(64, np.int32)
    try:
        t = _decode_huff(br, dc_table)
        diff = _extend(br.read_bits(t), t) if t else 0
        pred[si] += diff
        zz[0] = pred[si]
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
    return zz


def _decode_progressive_scan(data, pos, scan, coefs, huff, restart_interval,
                             mcus_x, mcus_y, ss, se, ah, al):
    """One progressive scan (T.81 Annex G) into the coefficient arrays.

    DC scans (ss=0) may be interleaved; AC scans are single-component by
    spec and iterate the component's own block grid. Returns the byte
    position just past the scan's entropy-coded data."""
    if ss == 0 and se != 0:
        raise JpegError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise JpegError("progressive AC scan must be non-interleaved")
    if ss > se or se > 63 or al > 13:
        raise JpegError("bad spectral selection / approximation")
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    eobrun = 0
    mcu_count = 0
    rst_n = 0

    def check_restart():
        nonlocal rst_n, pred, eobrun
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            br.expect_rst(rst_n)
            rst_n = (rst_n + 1) & 7
            pred = [0] * len(scan)
            eobrun = 0

    try:
        if len(scan) > 1:  # interleaved DC scan: MCU grid
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    check_restart()
                    for si, c in enumerate(scan):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                coef = coefs[c["ci"]][my * c["v"] + by, mx * c["h"] + bx]
                                if ah == 0:
                                    pred[si] = _dc_first(
                                        br, huff[(0, c["dc"])], coef, pred[si], al
                                    )
                                else:
                                    _dc_refine(br, coef, al)
                    mcu_count += 1
        else:  # non-interleaved: the component's own block grid
            c = scan[0]
            for by in range(c["nby"]):
                for bx in range(c["nbx"]):
                    check_restart()
                    coef = coefs[c["ci"]][by, bx]
                    if ss == 0:
                        if ah == 0:
                            pred[0] = _dc_first(br, huff[(0, c["dc"])], coef, pred[0], al)
                        else:
                            _dc_refine(br, coef, al)
                    elif ah == 0:
                        eobrun = _ac_first_block(
                            br, huff[(1, c["ac"])], coef, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine_block(
                            br, huff[(1, c["ac"])], coef, ss, se, al, eobrun
                        )
                    mcu_count += 1
    except _MarkerHit as m:
        raise JpegError(f"marker FF{m.marker:02X} inside entropy data")
    return br.pos


def _dc_first(br, dc_table, coef, pred, al):
    """DC first pass (G.1.2.1): ordinary DPCM at reduced precision."""
    t = _decode_huff(br, dc_table)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred += diff
    coef[0] = pred << al
    return pred


def _dc_refine(br, coef, al):
    """DC refinement (G.1.2.1): one correction bit per block."""
    if br.read_bit():
        coef[0] |= 1 << al


def _ac_first_block(br, ac_table, coef, ss, se, al, eobrun):
    """AC first pass for one block (G.1.2.2): run-length + EOB runs."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block is the run's first
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise JpegError("AC run past band end")
        coef[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, ac_table, coef, ss, se, al, eobrun):
    """AC refinement for one block (G.1.2.3): each already-nonzero
    coefficient in the band receives a correction bit as the scan passes
    over it; newly-nonzero coefficients arrive as (run, 1) symbols whose
    run counts only zero-HISTORY positions."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        # history-nonzero coefficient: one correction bit, applied only
        # if this pass's bit is not already set
        if br.read_bit() and (int(coef[k]) & p1) == 0:
            coef[k] += p1 if coef[k] > 0 else m1

    if eobrun:
        for k in range(ss, se + 1):
            if coef[k]:
                correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0 and r < 15:  # EOBn: sweep the rest of the band
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            for kk in range(k, se + 1):
                if coef[kk]:
                    correct(kk)
            return eobrun
        if s == 0:  # ZRL (r == 15): skip 16 zero-history positions
            val = 0
        else:
            if s != 1:
                raise JpegError("AC refinement magnitude must be 1")
            val = p1 if br.read_bit() else m1
        while k <= se:
            if coef[k]:
                correct(k)
                k += 1
            else:
                if r == 0:
                    if val:
                        coef[k] = val
                    k += 1
                    break
                r -= 1
                k += 1
    return 0


def _reconstruct(coefs, comps, qtables, h, w, hmax, vmax):
    """Dequantize + IDCT every component's coefficient array (vectorized
    einsum over all blocks), upsample by replication, YCbCr→RGB."""
    full = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]].astype(np.float64)
        zz = coefs[ci].astype(np.float64) * q
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz  # de-zigzag
        nby, nbx = nat.shape[:2]
        blocks = nat.reshape(nby, nbx, 8, 8)
        spatial = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


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
