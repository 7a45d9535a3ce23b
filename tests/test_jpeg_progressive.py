"""Progressive (SOF2) JPEG decoder conformance.

Two independent proof layers:

1. Fixture transcode: tests/jpeg_progressive.py re-encodes python.jpg's
   baseline coefficients as progressive streams under three scan
   scripts (spectral selection only; full successive approximation;
   deep Al=2 approximation with non-interleaved DC scans). The decoder
   must reproduce the EXACT coefficient arrays of the baseline parse
   (so the two entropy paths agree bit-for-bit on real data), decode
   pixel-identical to the baseline path, and stay inside the same
   quantization bounds vs the INDEPENDENT python.ppm raw pixels.
2. Randomized protocol roundtrip: seeded sparse/dense coefficient
   fields (multiple sampling geometries, magnitudes spanning several
   refinement bits) encode → decode coefficient-exact, exercising
   cross-block EOB runs, ZRL-over-history stretches, and buffered
   correction bits far beyond what one 16×16 fixture contains.
"""

import os

import numpy as np
import pytest

from web_scraper_spark.operators.jpegcodec import (
    JpegError,
    jpeg_coefficients,
    jpeg_decode,
    ppm_decode,
)

from tests.jpeg_progressive import encode_progressive

DATA = os.path.join(os.path.dirname(__file__), "data")


def _fixture(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _full_band_scans(ncomps, bands, al_schedule):
    """Scan script: DC first+refines, then per-component per-band AC
    first+refines following an Al schedule like [2, 1, 0]."""
    first, *refines = al_schedule
    scans = [{"cis": list(range(ncomps)), "ss": 0, "se": 0, "ah": 0, "al": first}]
    for ci in range(ncomps):
        for ss, se in bands:
            scans.append({"cis": [ci], "ss": ss, "se": se, "ah": 0, "al": first})
    prev = first
    for al in refines:
        scans.append({"cis": list(range(ncomps)), "ss": 0, "se": 0, "ah": prev, "al": al})
        for ci in range(ncomps):
            for ss, se in bands:
                scans.append({"cis": [ci], "ss": ss, "se": se, "ah": prev, "al": al})
        prev = al
    return scans


SCRIPTS = {
    "spectral_only": [
        {"cis": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 0},
        {"cis": [0], "ss": 1, "se": 5, "ah": 0, "al": 0},
        {"cis": [0], "ss": 6, "se": 63, "ah": 0, "al": 0},
        {"cis": [1], "ss": 1, "se": 63, "ah": 0, "al": 0},
        {"cis": [2], "ss": 1, "se": 63, "ah": 0, "al": 0},
    ],
    "succ_approx": _full_band_scans(3, [(1, 5), (6, 63)], [1, 0]),
    "deep_approx_noninterleaved_dc": [
        {"cis": [ci], "ss": 0, "se": 0, "ah": 0, "al": 2} for ci in range(3)
    ] + [
        {"cis": [ci], "ss": 1, "se": 63, "ah": 0, "al": 2} for ci in range(3)
    ] + [
        {"cis": [ci], "ss": 0, "se": 0, "ah": 2, "al": 1} for ci in range(3)
    ] + [
        {"cis": [ci], "ss": 1, "se": 63, "ah": 2, "al": 1} for ci in range(3)
    ] + [
        {"cis": [ci], "ss": 0, "se": 0, "ah": 1, "al": 0} for ci in range(3)
    ] + [
        {"cis": [ci], "ss": 1, "se": 63, "ah": 1, "al": 0} for ci in range(3)
    ],
}


@pytest.mark.parametrize("script_name", sorted(SCRIPTS))
def test_progressive_transcode_matches_baseline_exactly(script_name):
    jpg = _fixture("python.jpg")
    coefs, comps, qtables, h, w, hmax, vmax = jpeg_coefficients(jpg)
    prog = encode_progressive(coefs, comps, qtables, h, w, SCRIPTS[script_name], hmax, vmax)
    assert b"\xff\xc2" in prog[:200]  # really SOF2
    # entropy-path agreement: exact quantized coefficients
    pcoefs = jpeg_coefficients(prog)[0]
    for a, b in zip(coefs, pcoefs):
        assert np.array_equal(a, b)
    # end-to-end pixels identical to the baseline decode
    assert np.array_equal(jpeg_decode(prog), jpeg_decode(jpg))
    # and inside quantization distance of the independent ground truth
    truth = ppm_decode(_fixture("python.ppm"))
    err = np.abs(jpeg_decode(prog).astype(float) - truth.astype(float))
    assert err.mean() < 15.0
    assert np.percentile(err, 95) < 48.0


def _random_field(rng, comps_spec, mcus_x, mcus_y, density, scale):
    """Seeded sparse coefficient field in valid quantized range."""
    coefs = []
    for c in comps_spec:
        shape = (mcus_y * c["v"], mcus_x * c["h"], 64)
        vals = rng.integers(-scale, scale + 1, size=shape, dtype=np.int32)
        mask = rng.random(shape) < density
        coefs.append(np.where(mask, vals, 0).astype(np.int32))
    return coefs


@pytest.mark.parametrize("seed,density,scale,al_schedule", [
    (1, 0.02, 300, [0]),          # very sparse: long cross-block EOB runs
    (2, 0.15, 40, [1, 0]),        # moderate: ZRL + refinement interplay
    (3, 0.60, 7, [2, 1, 0]),      # dense small values: deep refinement
    (4, 0.003, 1000, [3, 2, 1, 0]),  # near-empty blocks, big magnitudes
])
def test_progressive_protocol_random_roundtrip(seed, density, scale, al_schedule):
    rng = np.random.default_rng(seed)
    comps_spec = [
        {"id": 1, "h": 2, "v": 2, "tq": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 1},
        {"id": 3, "h": 1, "v": 1, "tq": 1},
    ]
    h, w = 48, 64  # 4x3 MCUs at 4:2:0
    hmax = vmax = 2
    mcus_x, mcus_y = 4, 3
    for c in comps_spec:  # decoder geometry fields
        c["nbx"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["nby"] = -(-(-(-h * c["v"] // vmax)) // 8)
    coefs = _random_field(rng, comps_spec, mcus_x, mcus_y, density, scale)
    qtables = {0: np.ones(64, np.int32), 1: np.full(64, 2, np.int32)}
    scans = _full_band_scans(3, [(1, 8), (9, 63)], al_schedule)
    prog = encode_progressive(coefs, comps_spec, qtables, h, w, scans, hmax, vmax)
    got = jpeg_coefficients(prog)
    for a, b in zip(coefs, got[0]):
        assert np.array_equal(a, b)
    assert got[3] == h and got[4] == w


def test_progressive_error_paths():
    jpg = _fixture("python.jpg")
    coefs, comps, qtables, h, w, hmax, vmax = jpeg_coefficients(jpg)
    ok = encode_progressive(
        coefs, comps, qtables, h, w, SCRIPTS["spectral_only"], hmax, vmax
    )
    # truncation anywhere inside scan data must raise JpegError, never a
    # raw IndexError/KeyError
    for cut in (len(ok) // 3, len(ok) // 2, len(ok) - 40):
        with pytest.raises(JpegError):
            jpeg_decode(ok[:cut])
    # interleaved AC scan is illegal (T.81 G.1)
    data = bytearray(ok)
    # find the second SOS (the first AC scan) and make it claim 2 components
    first_sos = data.find(b"\xff\xda")
    second_sos = data.find(b"\xff\xda", first_sos + 2)
    ns_off = second_sos + 4
    assert data[ns_off] == 1
    # splice in a 2-component header (keeps structure invalid on purpose)
    spliced = (
        bytes(data[:second_sos + 2]) + b"\x00\x0a\x02"
        + bytes([data[ns_off + 1], 0x00]) + b"\x02\x00"
        + bytes(data[ns_off + 3:])
    )
    with pytest.raises(JpegError):
        jpeg_decode(spliced)


def test_media_jpeg_query_covers_both_sof_paths(spark, sf_dir):
    from web_scraper_spark.queries import q_media_jpeg

    rows = q_media_jpeg(spark, sf_dir).collect()
    assert len(rows) == 8
    by_sof = {}
    for r in rows:
        by_sof.setdefault(r["sof"], set()).add(
            (r["width"], r["height"], r["mean_luma"], r["mean_r"], r["mean_g"], r["mean_b"])
        )
    assert set(by_sof) == {"baseline", "progressive"}
    # pixel-exact agreement between the two entropy paths → identical stats
    assert by_sof["baseline"] == by_sof["progressive"]
    assert len(by_sof["baseline"]) == 1
