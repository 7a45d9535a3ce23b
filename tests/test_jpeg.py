"""Baseline JPEG decoder conformance + Spark integration.

Ground truth: the CPython test-suite fixture pair python.jpg /
python.ppm (Lib/test/imghdrdata, PSF-licensed; the same 16×16 logo as a
baseline 4:2:0 JPEG and as raw binary-PPM pixels), vendored under
tests/data/ (2x2.jpg is the IPython test-suite fixture, BSD-licensed). Comparing the JPEG decode against the INDEPENDENT raw
pixels bounds the decoder by real quantization distance — a
self-consistent-but-nonstandard decoder cannot pass these bounds.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.jpegcodec import JpegError, jpeg_decode, ppm_decode

DATA = os.path.join(os.path.dirname(__file__), "data")


def _fixture(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_decode_matches_independent_ground_truth():
    img = jpeg_decode(_fixture("python.jpg"))
    truth = ppm_decode(_fixture("python.ppm"))
    assert img.shape == truth.shape == (16, 16, 3)
    err = np.abs(img.astype(float) - truth.astype(float))
    # JPEG quantization + 4:2:0 chroma replication distance on a sharp-edged
    # 16x16 logo: measured mean |err| 8.8. A wrong IDCT/dequant/Huffman path
    # lands FAR outside these bounds (uniform gray alone gives mean ~60).
    assert err.mean() < 15.0
    assert np.percentile(err, 95) < 48.0
    for ch in range(3):
        r = np.corrcoef(
            img[..., ch].astype(float).ravel(), truth[..., ch].astype(float).ravel()
        )[0, 1]
        assert r > 0.9, f"channel {ch} correlation {r}"


def test_decode_second_fixture_and_errors():
    img = jpeg_decode(_fixture("2x2.jpg"))
    assert img.shape == (2, 2, 3)
    with pytest.raises(JpegError):
        jpeg_decode(b"\x89PNG not a jpeg")
    # lossless SOF3 must refuse loudly, not decode garbage (SOF2 is now
    # a real decode path — tests/test_jpeg_progressive.py)
    data = bytearray(_fixture("python.jpg"))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3
    with pytest.raises(JpegError, match="unsupported SOF"):
        jpeg_decode(bytes(data))


def test_decode_media_real_jpeg_features(spark):
    payload = _fixture("python.jpg")
    truth = ppm_decode(_fixture("python.ppm"))
    from web_scraper_spark.operators.multimodal import decode_media, resize_images

    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))], "media_id bigint, kind string, payload binary"
    )
    row = decode_media(media, fake=False).collect()[0]
    assert row["n_bytes"] == len(payload)
    # feature vector = per-channel mean/std from REAL pixels: the decoded
    # means must sit within JPEG distance of the ground-truth means
    for ch in range(3):
        assert row["features"][ch] == pytest.approx(
            float(truth[..., ch].mean()) / 255.0, abs=0.03
        )
    assert row["features"][6] == round(16 / 4096.0, 6)  # feature vec is 6 dp

    resized = resize_images(media, width=8, height=8, fake=False).collect()[0]
    assert (resized["width"], resized["height"]) == (8, 8)
    assert len(resized["payload"]) == 8 * 8 * 3


def test_media_jpeg_query_registered(spark):
    from web_scraper_spark.queries import q_media_jpeg, queries

    assert queries()["media_jpeg"] is q_media_jpeg
    out = q_media_jpeg(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 8
    truth = ppm_decode(_fixture("python.ppm"))
    for r in out:
        assert (r["width"], r["height"]) == (16, 16)
        assert r["mean_luma"] == pytest.approx(
            float(
                (0.299 * truth[..., 0] + 0.587 * truth[..., 1] + 0.114 * truth[..., 2]).mean()
            ),
            abs=8.0,
        )


def test_jpeg_fill_bytes_standalone_markers_and_truncation():
    """ADVICE r3: 0xFF fill padding and length-less markers (TEM) between
    segments must not desync the walk; malformed streams always surface
    JpegError, never raw KeyError/IndexError."""
    import pytest

    from web_scraper_spark.operators.jpegcodec import JpegError, jpeg_decode

    full = _fixture("python.jpg")
    truth = jpeg_decode(full)
    # inject fill bytes + a TEM (FF01) standalone marker right after SOI
    padded = full[:2] + b"\xff\xff\xff\x01" + full[2:]
    assert (jpeg_decode(padded) == truth).all()
    # truncated mid-stream: must be JpegError (wrapped, not IndexError)
    for cut in (3, 20, len(full) // 2):
        with pytest.raises(JpegError):
            jpeg_decode(full[:cut])
    # corrupt DHT selector (missing Huffman table id): JpegError, not KeyError
    sos = full.find(b"\xff\xda")
    assert sos > 0
    broken = bytearray(full)
    broken[sos + 6] = 0x77  # bogus dc/ac table ids for component 1
    with pytest.raises(JpegError):
        jpeg_decode(bytes(broken))
