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


# ---------------------------------------------------------------------------
# LZW property: an in-test spec encoder must be inverted EXACTLY
# ---------------------------------------------------------------------------

def _lzw_encode(min_code_size, indices):
    """Reference GIF-LZW encoder (always emits clear first, end last,
    grows code width when the NEXT code would not fit — the mirror of the
    decoder's growth rule)."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = []
    width = min_code_size + 1

    def emit(code):
        for b in range(width):
            out_bits.append((code >> b) & 1)  # LSB-first

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    prev = ()
    for sym in indices:
        cur = prev + (sym,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = (sym,)
    if prev:
        emit(table[prev])
    emit(end)
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i:i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data)


def test_lzw_roundtrip_random_streams():
    import random

    from web_scraper_spark.operators.gifcodec import _lzw_decode

    rng = random.Random(42)
    for min_code_size in (2, 4, 7):
        n_syms = 1 << min_code_size
        for trial in range(6):
            n = rng.choice([1, 17, 256, 4096])
            # mixtures of runs (dictionary-friendly) and noise (growth-heavy)
            stream = []
            while len(stream) < n:
                if rng.random() < 0.5:
                    stream.extend([rng.randrange(n_syms)] * rng.randint(1, 40))
                else:
                    stream.extend(rng.randrange(n_syms) for _ in range(rng.randint(1, 20)))
            stream = stream[:n]
            encoded = _lzw_encode(min_code_size, stream)
            assert _lzw_decode(min_code_size, encoded) == stream, (
                min_code_size, trial, n,
            )


def test_decode_media_mixed_format_batch(spark):
    """All five real decoders dispatch correctly inside ONE Arrow batch
    (PNG, baseline JPEG, GIF, WAV, Y4M in a single mapInPandas call)."""
    import numpy as np

    from web_scraper_spark.operators.multimodal import (
        decode_media,
        synth_waveform,
        synth_raster,
    )
    from web_scraper_spark.operators.pngcodec import png_encode
    from web_scraper_spark.operators.wavcodec import wav_encode

    png = png_encode(synth_raster(7, 12, 9))
    wav = wav_encode(synth_waveform(7, 800, 1), 8000)
    # minimal 1-frame Y4M: header + FRAME + 4:2:0 planes
    w, h = 8, 6
    y4m = (
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
        + b"FRAME\n"
        + bytes(w * h) + bytes((w // 2) * (h // 2)) * 2
    )
    rows = [
        (1, "image", bytearray(png)),
        (2, "image", bytearray(_fixture("python.jpg"))),
        (3, "image", bytearray(_fixture("python.gif"))),
        (4, "audio", bytearray(wav)),
        (5, "video", bytearray(y4m)),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary"
    ).coalesce(1)  # one partition → one Arrow batch through the dispatch chain
    got = {r["media_id"]: r for r in decode_media(media, fake=False).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for mid, (_, _, payload) in zip((1, 2, 3, 4, 5), rows):
        assert got[mid]["n_bytes"] == len(payload)
        assert len(got[mid]["features"]) == 8
        assert all(np.isfinite(v) for v in got[mid]["features"])
    # image feature layout: dims ride slots 6/7
    assert got[1]["features"][6] == round(12 / 4096.0, 6)
    assert got[2]["features"][6] == round(16 / 4096.0, 6)
    assert got[3]["features"][6] == round(16 / 4096.0, 6)


def test_gif_out_of_screen_descriptor_raises_giferror():
    """ADVICE r3: an image descriptor exceeding the logical screen must
    raise GifError, not a numpy broadcast ValueError."""
    data = bytearray(_fixture("python.gif"))
    # image descriptor block: 0x2C, ix, iy, iw, ih (all <u2)
    pos = data.find(0x2C)
    # python.gif's descriptor starts at the first 0x2C separator; bump iy
    import struct as _s

    _s.pack_into("<H", data, pos + 3, 9)  # iy=9 with ih=16 > sh=16
    with pytest.raises(GifError, match="exceeds"):
        gif_decode(bytes(data))
