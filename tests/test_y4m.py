"""Y4M codec + real video frame-sampling tests (round-3: the third media
kind goes fake=False, completing the PNG/WAV/Y4M real-decode set).

Validated the same three ways as tests/test_png.py / test_wav.py:
encode→decode round-trip, decode of a HAND-BUILT stream (header and
FRAME markers laid out with independent arithmetic, including per-frame
parameter strings the walker must skip), and the Spark mapInPandas path
returning plane-exact luma frames recomputable from the generator.
"""

import numpy as np
import pytest

from web_scraper_spark.operators.y4mcodec import (
    video_features,
    y4m_decode,
    y4m_decode_frame,
    y4m_encode,
    y4m_probe,
)


def _frames(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(
            (
                rng.integers(0, 256, (h, w), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            )
        )
    return out


def test_round_trip_identity():
    frames = _frames(5, 10, 16, seed=1)
    data = y4m_encode(frames, fps=(30, 1))
    assert y4m_probe(data) == (16, 10, (30, 1), 5)
    dec, (w, h), fps = y4m_decode(data)
    assert (w, h, fps) == (16, 10, (30, 1))
    for (y, u, v), (y2, u2, v2) in zip(frames, dec):
        assert np.array_equal(y, y2)
        assert np.array_equal(u, u2)
        assert np.array_equal(v, v2)


def test_decode_hand_built_stream_with_frame_params():
    """A stream written byte-by-byte: header with extra unknown tokens and
    an Xmetadata tag, FRAME lines carrying parameters — the walker must
    key off the newline, not a fixed marker length."""
    y0 = np.arange(24, dtype=np.uint8).reshape(4, 6)
    u0 = np.arange(6, dtype=np.uint8).reshape(2, 3) + 100
    v0 = np.arange(6, dtype=np.uint8).reshape(2, 3) + 200
    y1, u1, v1 = y0 + 1, u0 + 1, v0 + 1
    data = (
        b"YUV4MPEG2 W6 H4 F24:1 Ip A128:117 C420jpeg XYSCSS=420JPEG\n"
        + b"FRAME Xsomething\n" + y0.tobytes() + u0.tobytes() + v0.tobytes()
        + b"FRAME\n" + y1.tobytes() + u1.tobytes() + v1.tobytes()
    )
    assert y4m_probe(data) == (6, 4, (24, 1), 2)
    ya, ua, va = y4m_decode_frame(data, 0)
    yb, ub, vb = y4m_decode_frame(data, 1)
    assert np.array_equal(ya, y0) and np.array_equal(ua, u0) and np.array_equal(va, v0)
    assert np.array_equal(yb, y1) and np.array_equal(ub, u1) and np.array_equal(vb, v1)


def test_probe_rejects_bad_input():
    with pytest.raises(ValueError):
        y4m_probe(b"RIFF not a y4m")
    with pytest.raises(ValueError):  # non-420 colorspace
        y4m_probe(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + bytes(48))
    with pytest.raises(ValueError):  # truncated frame payload
        y4m_probe(b"YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + bytes(10))
    with pytest.raises(ValueError):  # odd dimensions can't be 4:2:0
        y4m_probe(b"YUV4MPEG2 W5 H4 F25:1\n")
    with pytest.raises(ValueError):  # header missing geometry
        y4m_probe(b"YUV4MPEG2 F25:1\n")


def test_video_features_closed_form():
    """Two constant-plane frames: every feature term has a closed form."""
    mk = lambda yv, cv: (
        np.full((4, 6), yv, np.uint8),
        np.full((2, 3), cv, np.uint8),
        np.full((2, 3), cv, np.uint8),
    )
    data = y4m_encode([mk(100, 50), mk(140, 70)], fps=(30, 1))
    f = video_features(data)
    assert f[0] == round(2 / 1000.0, 6)          # n_frames
    assert f[1] == round(6 / 4096.0, 6)          # width
    assert f[2] == round(4 / 4096.0, 6)          # height
    assert f[3] == 0.5                           # 30 fps / 60
    assert f[4] == round(120 / 255.0, 6)         # luma mean of {100,140}
    assert f[5] == round(20 / 255.0, 6)          # luma std (constant planes)
    assert f[6] == round(40 / 255.0, 6)          # |140-100| temporal delta
    assert f[7] == round(60 / 255.0, 6)          # chroma mean of {50,70}


def test_spark_real_frame_sampling_plane_exact(spark):
    """sample_frames(fake=False) over synthetic Y4M: sampled luma planes
    are byte-identical to the generator's arithmetic and timestamps come
    from the stream fps."""
    from web_scraper_spark.operators.multimodal import (
        sample_frames,
        synth_y4m_media,
        synth_yuv_planes,
    )

    media = synth_y4m_media(spark, "/root/testdata/sf0.001")
    rows = sample_frames(media, fps_divisor=3, max_frames=3, fake=False).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, group in list(by_media.items())[:8]:
        d = int(mid)
        w = 8 + 2 * ((d * 7) % 12)
        h = 8 + 2 * ((d * 11) % 12)
        n_frames = 2 + d % 9
        num, den = ((24, 1), (25, 1), (30, 1))[d % 3]
        picked = list(range(0, n_frames, 3))[:3]
        assert len(group) == len(picked)
        for r, idx in zip(sorted(group, key=lambda r: r["frame_no"]), picked):
            y, _u, _v = synth_yuv_planes(d, idx, w, h)
            assert bytes(r["frame"]) == y.tobytes()
            assert r["ts_s"] == round(idx * den / num, 3)


def test_spark_real_decode_video_features(spark):
    """decode_media(fake=False) on Y4M payloads: features recomputed
    driver-side from the same stream bytes match."""
    from web_scraper_spark.operators.multimodal import decode_media, synth_y4m_media

    media = synth_y4m_media(spark, "/root/testdata/sf0.001")
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.limit(200).collect()}
    feats = {r["media_id"]: r["features"] for r in decode_media(media, fake=False).collect()}
    assert feats
    checked = 0
    for mid, payload in payloads.items():
        assert feats[mid] == pytest.approx(video_features(payload), abs=1e-12)
        checked += 1
        if checked >= 10:
            break


def test_spark_video_query_shape(spark):
    """The registered media_video rows-only query: luma-plane byte counts
    match each medium's geometry."""
    from web_scraper_spark.queries import q_media_video

    out = q_media_video(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    assert {f.name for f in out.schema.fields} == {"media_id", "frame_no", "ts_s", "n_bytes"}
    for r in rows[:20]:
        d = int(r["media_id"])
        w = 8 + 2 * ((d * 7) % 12)
        h = 8 + 2 * ((d * 11) % 12)
        assert r["n_bytes"] == w * h
