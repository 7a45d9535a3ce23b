"""SemDeDup (operators/similarity.py::semdedup / semdedup_within).

Rows-only operator (Spark-ML k-means fit + BLAS float path), so the
correctness story is the pagerank pattern: an INDEPENDENT numpy twin of
the within-cell earlier-wins rule, equality at 1e-9, partition
invariance, row_chunk invariance (the bounded-memory path must not
change values), and planted near-duplicates actually dropped.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators import similarity as sim

EPS = 0.95


def _twin(rows, eps):
    """Independent per-cell earlier-wins prune: plain python/numpy."""
    out = {}
    by_cell = {}
    for cell, vid, arr in rows:
        by_cell.setdefault(cell, []).append((vid, np.asarray(arr, float)))
    for cell, members in by_cell.items():
        members.sort(key=lambda t: t[0])
        seen = []
        for vid, v in members:
            v = v / max(np.linalg.norm(v), 1e-12)
            mp = max((float(v @ u) for u in seen), default=-1.0)
            out[vid] = (cell, round(mp, 6), mp < eps)
            seen.append(v)
    return out


def _assigned(spark, rows, parts=None):
    df = spark.createDataFrame(
        [(c, i, list(map(float, a))) for c, i, a in rows],
        "cell int, vec_id bigint, arr array<double>",
    )
    return df.repartition(parts) if parts else df


def _unit(seed, dim=8):
    rng = np.random.RandomState(seed)
    v = rng.randn(dim)
    return v / np.linalg.norm(v)


CELLS = [
    # cell 0: v, a near-copy of v (dropped), and an orthogonal-ish vector
    (0, 1, _unit(1)),
    (0, 2, _unit(1) + 0.01 * _unit(2)),  # cos to v ~0.999 -> dropped
    (0, 3, _unit(3)),
    # cell 1: a copy of cell-0's vector must NOT be dropped (different cell)
    (1, 4, _unit(1)),
    (1, 5, _unit(5)),
]


def test_semdedup_within_matches_numpy_twin(spark):
    got = {
        r["vec_id"]: (r["cell"], r["max_prior_sim"], r["kept"])
        for r in sim.semdedup_within(_assigned(spark, CELLS), eps=EPS).collect()
    }
    want = _twin(CELLS, EPS)
    assert set(got) == set(want)
    for vid in want:
        assert got[vid][0] == want[vid][0]
        assert math.isclose(got[vid][1], want[vid][1], abs_tol=1e-9), vid
        assert got[vid][2] == want[vid][2], vid
    assert not got[2][2]          # the planted near-copy is dropped
    assert got[1][2] and got[4][2]  # first-in-cell always kept


def test_semdedup_partition_and_chunk_invariance(spark):
    rng = np.random.RandomState(7)
    rows = [(int(i % 4), int(i), rng.randn(8)) for i in range(120)]
    # plant duplicates inside one cell
    rows += [(0, 200 + i, np.asarray(rows[i * 4][2]) * 2.0) for i in range(5)]
    base = sorted(
        tuple(r) for r in sim.semdedup_within(_assigned(spark, rows), eps=EPS).collect()
    )
    reparted = sorted(
        tuple(r)
        for r in sim.semdedup_within(_assigned(spark, rows, parts=13), eps=EPS).collect()
    )
    chunked = sorted(
        tuple(r)
        for r in sim.semdedup_within(
            _assigned(spark, rows), eps=EPS, row_chunk=3
        ).collect()
    )
    assert base == reparted == chunked
    want = _twin(rows, EPS)
    assert {t[0]: t[3] for t in base} == {v: w[2] for v, w in want.items()}
    # scaled copies have cosine 1.0 to their original -> all dropped
    assert all(not t[3] for t in base if t[0] >= 200)


def test_semdedup_end_to_end_drops_planted_dups(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # append exact copies of 10 vectors under fresh high ids: k-means maps a
    # copy to its original's cell, so every copy must be dropped
    copies = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        "label",
    )
    out = sim.semdedup(emb.unionByName(copies), n_cells=8, eps=EPS)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == emb.count() + 10
    dropped_copies = [v for v in rows if v >= 100000 and not rows[v]["kept"]]
    assert len(dropped_copies) == 10
    for v in dropped_copies:
        assert rows[v]["max_prior_sim"] == pytest.approx(1.0, abs=1e-6)


def test_semdedup_sampled_matches_within_on_same_assignment(spark):
    # same earlier-wins rule, different arithmetic path: given the SAME
    # cell assignment, the relational fold form must agree with the BLAS
    # semdedup_within on kept flags and on max_prior_sim to 1e-5 (fold
    # rounds then maxes; BLAS maxes then rounds)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = sim.sampled_cells(emb, n_cells=8)
    arrs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("arr")
    )
    blas = {
        r["vec_id"]: r
        for r in sim.semdedup_within(
            assigned.join(arrs, "vec_id"), eps=0.35
        ).collect()
    }
    rel = {
        r["vec_id"]: r for r in sim.semdedup_sampled(emb, n_cells=8, eps=0.35).collect()
    }
    assert blas.keys() == rel.keys()
    for vid in blas:
        assert blas[vid]["cell"] == rel[vid]["cell"]
        # the two paths round at different points (fold rounds then maxes,
        # BLAS maxes then rounds), so kept may legitimately differ when
        # the max sits inside the 6-dp rounding band around eps
        if abs(blas[vid]["max_prior_sim"] - 0.35) > 1e-6:
            assert blas[vid]["kept"] == rel[vid]["kept"]
        assert blas[vid]["max_prior_sim"] == pytest.approx(
            rel[vid]["max_prior_sim"], abs=1e-5
        )


def test_semdedup_sampled_drops_planted_copies(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    copies = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    out = sim.semdedup_sampled(emb.unionByName(copies), n_cells=8, eps=EPS)
    rows = {r["vec_id"]: r for r in out.collect()}
    dropped = [v for v in rows if v >= 100000 and not rows[v]["kept"]]
    assert len(dropped) == 10
    for v in dropped:
        assert rows[v]["max_prior_sim"] == pytest.approx(1.0, abs=1e-6)
