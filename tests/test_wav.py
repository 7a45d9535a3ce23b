"""WAV codec + real-decode audio stage tests (round-3 extension of the
VERDICT r2 item-3 pattern: one more media kind runs fake=False end-to-end).

Validated three ways, mirroring tests/test_png.py: encode→decode
round-trip, decode of a HAND-BUILT RIFF stream (chunk layout written with
independent struct arithmetic, including an unknown chunk and the
odd-length word-alignment pad, so the chunk walker is checked against the
RIFF spec rather than against wav_encode), and the Spark mapInPandas path
returning features recomputable from the generator's exact-integer
waveform arithmetic.
"""

import struct

import numpy as np
import pytest

from web_scraper_spark.operators.wavcodec import (
    audio_features,
    wav_decode,
    wav_encode,
)


def _wave(n, ch, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)


def test_round_trip_identity():
    for n, ch, rate, seed in [(1, 1, 8000, 0), (255, 2, 16000, 1), (4096, 1, 44100, 2)]:
        arr = _wave(n, ch, seed)
        out, r = wav_decode(wav_encode(arr, rate))
        assert r == rate
        assert np.array_equal(out, arr)


def test_decode_hand_built_riff_with_extra_chunks():
    """A RIFF laid out by hand: LIST chunk before fmt, an odd-length junk
    chunk (exercising the word-alignment pad), fmt, then data. The walker
    must skip unknown chunks and still find fmt/data."""
    arr = _wave(37, 2, seed=9)
    pcm = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    junk = b"junk!"  # length 5 → needs one pad byte
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"junk" + struct.pack("<I", len(junk)) + junk + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = wav_decode(data)
    assert rate == 22050
    assert np.array_equal(out, arr)


def test_decode_rejects_bad_input():
    with pytest.raises(ValueError):
        wav_decode(b"ID3\x03 not a wav at all")
    # float WAV (format tag 3) unsupported
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
    # truncated: fmt but no data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_closed_form():
    """Features over a tiny hand-checkable signal: alternating ±q square
    wave, one channel — every term has a closed form."""
    q = 1000
    arr = np.tile(np.array([[q], [-q]], dtype=np.int16), (8, 1))  # 16 samples
    f = audio_features(arr, sample_rate=8000)
    assert f[0] == round(16 / 8000 / 60.0, 6)          # duration/60
    assert f[1] == round(8000 / 48000.0, 6)            # rate/48k
    assert f[2] == round(1 / 8.0, 6)                   # channels/8
    assert f[3] == round(q / 32768.0, 6)               # rms of ±q square = q
    assert f[4] == round(q / 32768.0, 6)               # peak
    assert f[5] == 1.0                                 # every adjacent pair crosses
    assert f[6] == 0.0                                 # zero dc offset
    assert f[7] == 0.5                                 # half the energy in first half


def test_spark_real_decode_audio_features(spark):
    """decode_media(fake=False) on synthetic WAVs: features recomputed
    driver-side from the shared exact-integer waveform generator match."""
    from web_scraper_spark.operators.multimodal import (
        decode_media,
        synth_wav_media,
        synth_waveform,
    )

    media = synth_wav_media(spark, "/root/testdata/sf0.001")
    rows = {r["media_id"]: r for r in decode_media(media, fake=False).collect()}
    assert rows
    for mid in list(rows)[:10]:
        rate = (8000, 16000, 44100)[mid % 3]
        ch = 1 + mid % 2
        n = 256 + (mid * 37) % (4096 - 255)
        exp = audio_features(synth_waveform(mid, n, ch), rate)
        assert rows[mid]["features"] == pytest.approx(exp, abs=1e-12)
        assert rows[mid]["kind"] == "audio"


def test_spark_audio_query_shape(spark):
    """The registered media_audio rows-only query: one row per document,
    rms/zcr are the rounded feature terms."""
    from web_scraper_spark.queries import q_media_audio

    out = q_media_audio(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert len(rows) == n_docs
    assert {f.name for f in out.schema.fields} == {"media_id", "n_bytes", "rms", "zcr"}
    assert all(0.0 <= r["rms"] <= 1.0 and 0.0 <= r["zcr"] <= 1.0 for r in rows)
