"""mp4/mp3 container-metadata conformance (operators/mediameta.py).

Ground truth is INDEPENDENT hand-assembly: boxes/frames are constructed
here from the public specs (ISO/IEC 14496-12 box grammar, ISO/IEC
11172-3 frame header) with hand-computed sizes and offsets — the parser
never sees its own output. Covers version-0/1 full boxes, 64-bit
largesize, size==0 tail boxes, multi-track moov, ID3v2 skip, padding
bytes, CBR/VBR, MPEG1/MPEG2 frame lengths, and malformed-input errors.
"""

import struct

import pytest

from web_scraper_spark.operators.mediameta import (
    MediaMetaError,
    mp3_meta,
    mp4_meta,
)


# --------------------------- mp4 construction ---------------------------

def box(btype: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def fullbox(btype: bytes, version: int, payload: bytes) -> bytes:
    return box(btype, bytes([version, 0, 0, 0]) + payload)


def mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = b"\x00" * 16 + struct.pack(">IQ", timescale, duration) + b"\x00" * 80
    else:
        body = b"\x00" * 8 + struct.pack(">II", timescale, duration) + b"\x00" * 80
    return fullbox(b"mvhd", version, body)


def tkhd(width: float, height: float) -> bytes:
    body = b"\x00" * 76 + struct.pack(">II", int(width * 65536), int(height * 65536))
    return fullbox(b"tkhd", 0, body)


def mdhd(timescale: int, duration: int) -> bytes:
    return fullbox(b"mdhd", 0, b"\x00" * 8 + struct.pack(">II", timescale, duration) + b"\x00" * 4)


def hdlr(handler: bytes) -> bytes:
    return fullbox(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12)


def stsd(fourcc: bytes) -> bytes:
    entry = struct.pack(">I", 16) + fourcc + b"\x00" * 8
    return fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)


def trak(kind: bytes, fourcc: bytes, w: float, h: float, ts: int, dur: int) -> bytes:
    stbl = box(b"stbl", stsd(fourcc))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd(ts, dur) + hdlr(kind) + minf)
    return box(b"trak", tkhd(w, h) + mdia)


def make_mp4(mvhd_version: int = 0, largesize_moov: bool = False,
             tail_mdat_size0: bool = True) -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2mp41")
    moov = box(
        b"moov",
        mvhd(1000, 5500, version=mvhd_version)
        + trak(b"vide", b"avc1", 640, 360, 90000, 450000)
        + trak(b"soun", b"mp4a", 0, 0, 44100, 220500),
        largesize=largesize_moov,
    )
    if tail_mdat_size0:
        mdat = struct.pack(">I", 0) + b"mdat" + b"\x00" * 32  # size 0: to EOF
    else:
        mdat = box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


@pytest.mark.parametrize("mvhd_version,largesize,tail0", [
    (0, False, False),
    (1, False, True),
    (0, True, True),
])
def test_mp4_meta_golden(mvhd_version, largesize, tail0):
    data = make_mp4(mvhd_version, largesize, tail0)
    m = mp4_meta(data)
    assert m["brand"] == "isom"
    assert m["duration_s"] == 5.5
    assert m["n_tracks"] == 2
    vid, aud = m["tracks"]
    assert vid == {"kind": "video", "codec": "avc1", "width": 640.0,
                   "height": 360.0, "duration_s": 5.0}
    assert aud["kind"] == "audio" and aud["codec"] == "mp4a"
    assert aud["duration_s"] == 5.0
    assert aud["width"] is None and aud["height"] is None


def test_mp4_meta_errors():
    with pytest.raises(MediaMetaError, match="ftyp"):
        mp4_meta(box(b"free", b"\x00" * 8))
    data = make_mp4(tail_mdat_size0=False)
    with pytest.raises(MediaMetaError):
        mp4_meta(data[:len(data) - 30])  # truncated mid-box
    ftyp_len = 8 + 16
    with pytest.raises(MediaMetaError):
        mp4_meta(data[:ftyp_len + 25])  # truncated mid-moov
    # box claiming to extend past its enclosure
    bad = box(b"ftyp", b"isom" + b"\x00" * 8)[:4] + b"ftyp"
    with pytest.raises(MediaMetaError):
        mp4_meta(struct.pack(">I", 10 ** 6) + bad[4:] + b"\x00" * 16)


# --------------------------- mp3 construction ---------------------------

_BR_V1 = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
          128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}
_BR_V2 = {8: 1, 16: 2, 24: 3, 32: 4, 40: 5, 48: 6, 56: 7, 64: 8,
          80: 9, 96: 10, 112: 11, 128: 12, 144: 13, 160: 14}
_SR = {44100: 0, 48000: 1, 32000: 2}
_SR2 = {22050: 0, 24000: 1, 16000: 2}


def mp3_frame(bitrate: int, rate: int, mpeg1: bool = True, padding: int = 0) -> bytes:
    if mpeg1:
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # version 11, layer 01, no CRC
        br_idx, sr_idx, spf = _BR_V1[bitrate], _SR[rate], 1152
    else:
        b1 = 0xE0 | (2 << 3) | (1 << 1) | 1
        br_idx, sr_idx, spf = _BR_V2[bitrate], _SR2[rate], 576
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    length = (spf // 8) * bitrate * 1000 // rate + padding
    return bytes([0xFF, b1, b2, 0x00]) + b"\x00" * (length - 4)


def id3v2(size: int) -> bytes:
    ss = [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    return b"ID3\x04\x00\x00" + bytes(ss) + b"\x00" * size


def test_mp3_meta_cbr_with_id3():
    data = id3v2(100) + b"".join(mp3_frame(128, 44100) for _ in range(38))
    m = mp3_meta(data)
    assert m["n_frames"] == 38
    assert m["sample_rate"] == 44100
    assert m["bitrate_kbps"] == 128
    assert m["mode"] == "CBR"
    assert m["version"] == "MPEG1"
    assert m["duration_s"] == round(38 * 1152 / 44100, 6)
    assert m["n_bytes_audio"] == len(data) - 110


def test_mp3_meta_vbr_padding_and_mpeg2():
    # VBR: alternating bitrates, padding bit exercised
    frames = [mp3_frame(128, 44100, padding=i % 2) for i in range(10)]
    frames += [mp3_frame(192, 44100) for _ in range(4)]
    m = mp3_meta(b"".join(frames))
    assert m["mode"] == "VBR" and m["bitrate_kbps"] == 128 and m["n_frames"] == 14
    # MPEG2 half-rate family: 576 samples/frame
    m2 = mp3_meta(b"".join(mp3_frame(64, 22050, mpeg1=False) for _ in range(20)))
    assert m2["version"] == "MPEG2"
    assert m2["duration_s"] == round(20 * 576 / 22050, 6)


@pytest.mark.parametrize("mpeg1,bitrate,rate,n", [
    (True, 32, 32000, 3), (True, 320, 48000, 7), (False, 8, 16000, 5),
    (False, 160, 24000, 2), (True, 112, 44100, 11),
])
def test_mp3_frame_length_grid(mpeg1, bitrate, rate, n):
    """Frame-length formula property: the walk must land exactly on every
    hand-placed header and consume the full stream."""
    data = b"".join(
        mp3_frame(bitrate, rate, mpeg1=mpeg1, padding=i % 2) for i in range(n)
    )
    m = mp3_meta(data)
    assert m["n_frames"] == n
    assert m["n_bytes_audio"] == len(data)


def test_mp3_meta_errors():
    good = mp3_frame(128, 44100)
    with pytest.raises(MediaMetaError, match="sync"):
        mp3_meta(good + b"\x12\x34\x56\x78")
    with pytest.raises(MediaMetaError, match="truncated frame"):
        mp3_meta(good[:100])
    with pytest.raises(MediaMetaError, match="no audio data"):
        mp3_meta(id3v2(4))
    # free-format bitrate index refused
    bad = bytearray(good)
    bad[2] = 0x00
    with pytest.raises(MediaMetaError, match="bitrate"):
        mp3_meta(bytes(bad))
