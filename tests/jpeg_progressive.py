"""Coefficient-level progressive JPEG transcoder (test support).

Re-encodes a baseline JPEG's quantized coefficients as a progressive
(SOF2) stream under an arbitrary scan script, so the decoder's
progressive path (operators/jpegcodec.py) can be proven
coefficient-EXACT against its baseline path on the same independent
fixture (python.jpg, bounded by python.ppm). The bitstream protocol
implemented here is ITU-T T.81 Annex G from the encoder side — EOB-run
accounting, ZRL-over-zero-history runs, and the buffered-correction-bit
discipline of G.1.2.3 (history bits are buffered and flushed after the
next emitted Huffman symbol, including across blocks attached to an EOB
run). The encoder state machines are structurally disjoint from the
decoder's, so an encode/decode bug pair cancelling exactly across
EOB-run and refinement boundaries is not plausible; the python.ppm
quantization bound closes the loop against an independent ground truth.

Huffman tables are per-scan fixed-length canonical codes over the
symbols the scan actually uses (counts concentrated at one code length,
strictly fewer symbols than code points so the all-ones code stays
unused, per T.81 C.2).
"""

from __future__ import annotations

import struct


class _BitWriter:
    """MSB-first bit accumulator with FF00 byte stuffing; flush pads the
    final partial byte with 1-bits (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bit(self, b: int) -> None:
        self.acc = (self.acc << 1) | (b & 1)
        self.n += 1
        if self.n == 8:
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def flush(self) -> None:
        while self.n:
            self.bit(1)


class _Emitter:
    """Two-phase scan emitter: pass 1 (codes=None) records the Huffman
    symbols a scan needs; pass 2 writes real bits with the built table.
    Both passes run the identical scan-encoding code path."""

    def __init__(self, codes=None, bw: _BitWriter | None = None):
        self.syms: list[int] = []
        self.codes = codes
        self.bw = bw

    def sym(self, s: int) -> None:
        if self.codes is None:
            self.syms.append(s)
        else:
            length, code = self.codes[s]
            self.bw.bits(code, length)

    def bits(self, v: int, n: int) -> None:
        if self.bw is not None and n:
            self.bw.bits(v & ((1 << n) - 1), n)

    def bit(self, b: int) -> None:
        if self.bw is not None:
            self.bw.bit(b)


def _fixed_table(symbols: list[int]):
    """Fixed-length canonical Huffman table over the used symbol set:
    (counts[16], symbols_bytes, {sym: (length, code)})."""
    uniq = sorted(set(symbols))
    length = 1
    while (1 << length) < len(uniq) + 1:  # +1 keeps the all-ones code free
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(uniq)
    codes = {sym: (length, i) for i, sym in enumerate(uniq)}
    return counts, bytes(uniq), codes


def _scan_blocks(coefs, comps, cis: list[int], mcus_x: int, mcus_y: int):
    """Yield (scan_index, zigzag_coef_row) in T.81 scan order: MCU grid
    when interleaved, the component's own block grid when not."""
    if len(cis) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for si, ci in enumerate(cis):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield si, coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
    else:
        ci = cis[0]
        c = comps[ci]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                yield 0, coefs[ci][by, bx]


def _encode_dc_first(em: _Emitter, blocks, ncomps: int, al: int) -> None:
    pred = [0] * ncomps
    for si, coef in blocks:
        v = int(coef[0]) >> al  # DC point transform: arithmetic shift
        diff = v - pred[si]
        pred[si] = v
        t = abs(diff).bit_length()
        em.sym(t)
        if t:
            em.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _encode_dc_refine(em: _Emitter, blocks, al: int) -> None:
    for _, coef in blocks:
        em.bit((int(coef[0]) >> al) & 1)


def _encode_ac_first(em: _Emitter, blocks, ss: int, se: int, al: int) -> None:
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            em.sym(r << 4)
            if r:
                em.bits(eobrun - (1 << r), r)
            eobrun = 0

    for _, coef in blocks:
        run = 0
        for k in range(ss, se + 1):
            c = int(coef[k])
            mag = abs(c) >> al  # AC point transform: divide toward zero
            v = mag if c >= 0 else -mag
            if v == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                em.sym(0xF0)
                run -= 16
            t = mag.bit_length()
            em.sym((run << 4) | t)
            em.bits(v if v > 0 else v + (1 << t) - 1, t)
            run = 0
        if run:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_ac_refine(em: _Emitter, blocks, ss: int, se: int, al: int) -> None:
    eobrun = 0
    be: list[int] = []  # correction bits attached to the pending EOB run

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            em.sym(r << 4)
            if r:
                em.bits(eobrun - (1 << r), r)
        for b in be:
            em.bit(b)
        eobrun = 0
        be = []

    for _, coef in blocks:
        band = list(range(ss, se + 1))
        absvals = [abs(int(coef[k])) >> al for k in band]
        eob = -1  # position of the last newly-nonzero coefficient
        for i, k in enumerate(band):
            if absvals[i] == 1:
                eob = k
        run = 0
        pend: list[int] = []  # correction bits since the last emitted symbol
        for i, k in enumerate(band):
            a = absvals[i]
            if a == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                flush_eob()
                em.sym(0xF0)
                run -= 16
                for b in pend:
                    em.bit(b)
                pend = []
            if a > 1:  # history-nonzero: buffer its correction bit
                pend.append(a & 1)
                continue
            # newly nonzero (a == 1)
            flush_eob()
            em.sym((run << 4) | 1)
            em.bit(1 if int(coef[k]) >= 0 else 0)
            for b in pend:
                em.bit(b)
            pend = []
            run = 0
        if run > 0 or pend:
            eobrun += 1
            be.extend(pend)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _run_scan(em: _Emitter, coefs, comps, scan: dict, mcus_x: int, mcus_y: int) -> None:
    cis, ss, se, ah, al = scan["cis"], scan["ss"], scan["se"], scan["ah"], scan["al"]
    blocks = _scan_blocks(coefs, comps, cis, mcus_x, mcus_y)
    if ss == 0:
        if ah == 0:
            _encode_dc_first(em, blocks, len(cis), al)
        else:
            _encode_dc_refine(em, blocks, al)
    elif ah == 0:
        _encode_ac_first(em, blocks, ss, se, al)
    else:
        _encode_ac_refine(em, blocks, ss, se, al)


def encode_progressive(coefs, comps, qtables, h: int, w: int, scans: list[dict],
                       hmax: int, vmax: int) -> bytes:
    """Assemble a full SOF2 stream: DQT + SOF2 + per-scan (DHT, SOS, ECS)
    + EOI. ``scans`` entries: {cis, ss, se, ah, al} with cis a list of
    frame-component indexes (AC scans must be single-component)."""
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = bytearray(b"\xff\xd8")
    for tq in sorted({c["tq"] for c in comps}):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in qtables[tq])  # zigzag order, as parsed
    nf = len(comps)
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * nf) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([nf])
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    for scan in scans:
        rec = _Emitter()
        _run_scan(rec, coefs, comps, scan, mcus_x, mcus_y)
        codes = {}
        if rec.syms:
            counts, symbols, codes = _fixed_table(rec.syms)
            tc = 0 if scan["ss"] == 0 else 1
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(symbols))
            out += bytes([tc << 4]) + bytes(counts) + symbols
        bw = _BitWriter()
        _run_scan(_Emitter(codes, bw), coefs, comps, scan, mcus_x, mcus_y)
        bw.flush()
        ns = len(scan["cis"])
        out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ns) + bytes([ns])
        for ci in scan["cis"]:
            out += bytes([comps[ci]["id"], 0x00])  # table ids 0/0
        out += bytes([scan["ss"], scan["se"], (scan["ah"] << 4) | scan["al"]])
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
