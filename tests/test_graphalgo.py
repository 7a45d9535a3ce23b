"""PageRank + cluster representatives: equality to an independent numpy
power iteration, partition invariance, dangling-mass handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.graphalgo import cluster_representatives, pagerank


def numpy_pagerank(edges, n_iter=10, damping=0.85):
    """Independent twin: same fixed-iteration scheme, same dangling rule."""
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in set(edges):
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, d in set(edges):
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        dm = r[deg == 0].sum()
        r = (1.0 - damping) / n + damping * (contrib + dm / n)
    return {u: r[idx[u]] for u in nodes}


EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (4, 1),
    (5, 4), (1, 5), (6, 1),  # 6 has out-edge; 7 below is dangling
    (3, 7),
]


def _edges_df(spark, edges, parts=None):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return df.repartition(parts) if parts else df


def test_pagerank_matches_numpy_and_sums_to_one(spark):
    got = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, EDGES)).collect()}
    want = numpy_pagerank(EDGES)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=2e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # node 1 is the hub (most inlinks incl. from the hub cycle): top rank
    assert max(got, key=got.get) == 1


def test_pagerank_partition_invariant(spark):
    a = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, EDGES, 2)).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark, EDGES, 7)).collect()}
    assert a == b  # rounded-9 ranks identical across partitionings


def test_cluster_representatives_pick_hub(spark):
    # cluster {1,2,3,4}: star around 1 (+ chain), cluster {8,9}: one pair
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4), (8, 9)], "doc_a bigint, doc_b bigint"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (8, 8), (9, 8)],
        "doc_id bigint, cluster_id bigint",
    )
    out = {r["cluster"]: r for r in cluster_representatives(pairs, labels).collect()}
    assert set(out) == {1, 8}
    assert out[1]["rep_doc_id"] == 1  # the star hub is the most central
    assert out[1]["n_members"] == 4
    assert out[8]["rep_doc_id"] == 8  # symmetric pair: tie → smaller id
    assert out[8]["n_members"] == 2


def test_dedup_centrality_registered(spark, sf_dir):
    from web_scraper_spark.queries import q_dedup_centrality, queries

    assert queries()["dedup_centrality"] is q_dedup_centrality
    out = q_dedup_centrality(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_members"] >= 2  # every cluster has at least one pair
        assert r["rep_rank"] is None or r["rep_rank"] > 0


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------


def numpy_hits(edges, n_iter=10):
    """Independent twin of graphalgo.hits: scale-invariant iterations
    (no per-step normalization), one extra authority half-step off the
    final hub vector, L2 normalization at the end only."""
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    hub = np.ones(n)
    for _ in range(n_iter):
        auth = A.T @ hub
        hub = A @ auth
    auth = A.T @ hub
    hub = hub / (np.linalg.norm(hub) or 1.0)
    auth = auth / (np.linalg.norm(auth) or 1.0)
    return {u: (hub[idx[u]], auth[idx[u]]) for u in nodes}


def test_hits_matches_numpy(spark):
    from web_scraper_spark.operators.graphalgo import hits

    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(_edges_df(spark, EDGES)).collect()}
    want = numpy_hits(EDGES)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == pytest.approx(want[u][0], abs=2e-9), u
        assert got[u][1] == pytest.approx(want[u][1], abs=2e-9), u
    # node 7 is a pure sink: authority > 0, hub exactly 0
    assert got[7][0] == 0.0 and got[7][1] > 0


def test_hits_partition_invariant(spark):
    from web_scraper_spark.operators.graphalgo import hits

    a = {r["node"]: (r["hub"], r["authority"]) for r in hits(_edges_df(spark, EDGES, parts=1)).collect()}
    b = {r["node"]: (r["hub"], r["authority"]) for r in hits(_edges_df(spark, EDGES, parts=7)).collect()}
    for u in a:
        assert a[u][0] == pytest.approx(b[u][0], abs=2e-9)
        assert a[u][1] == pytest.approx(b[u][1], abs=2e-9)


def test_hits_bipartite_star(spark):
    from web_scraper_spark.operators.graphalgo import hits

    # 3 hubs all pointing at 2 authorities: hubs get equal hub score,
    # authorities equal authority score, and the cross scores are zero
    edges = [(h, a) for h in (1, 2, 3) for a in (10, 20)]
    got = {r["node"]: r for r in hits(_edges_df(spark, edges)).collect()}
    for h in (1, 2, 3):
        assert got[h]["hub"] == pytest.approx(1 / np.sqrt(3), abs=1e-9)
        assert got[h]["authority"] == 0.0
    for a in (10, 20):
        assert got[a]["authority"] == pytest.approx(1 / np.sqrt(2), abs=1e-9)
        assert got[a]["hub"] == 0.0


# ---------------------------------------------------------------------------
# OPIC (Abiteboul et al. 2003)
# ---------------------------------------------------------------------------


def numpy_opic(edges, n_iter=8):
    """Independent twin of graphalgo.opic: synchronous cash/history."""
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in set(edges):
        deg[idx[s]] += 1
    c = np.full(n, 1.0 / n)
    h = np.zeros(n)
    for _ in range(n_iter):
        dm = c[deg == 0].sum()
        new = np.full(n, dm / n)
        for s, d in set(edges):
            new[idx[d]] += c[idx[s]] / deg[idx[s]]
        h += c
        c = new
    imp = (h + c) / (n_iter + 1)
    return {u: imp[idx[u]] for u in nodes}


def test_opic_matches_numpy_and_sums_to_one(spark):
    from web_scraper_spark.operators.graphalgo import opic

    got = {r["node"]: r["importance"] for r in opic(_edges_df(spark, EDGES)).collect()}
    want = numpy_opic(EDGES)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=2e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # same hub structure as pagerank: node 1 tops the importance order
    assert max(got, key=got.get) == 1


def test_opic_partition_invariant(spark):
    from web_scraper_spark.operators.graphalgo import opic

    one = sorted(map(tuple, opic(_edges_df(spark, EDGES, parts=1)).collect()))
    many = sorted(map(tuple, opic(_edges_df(spark, EDGES, parts=13)).collect()))
    assert one == many


def test_opic_anytime_property(spark):
    """More rounds refine, never destroy, the ranking of a clear hub —
    the anytime claim a crawler relies on (rank mid-crawl)."""
    from web_scraper_spark.operators.graphalgo import opic

    # dangling hub: every spoke pays the hub each round, the hub's cash
    # re-enters uniformly — aperiodic, so the order is stable at any k
    star = [(i, 1) for i in range(2, 8)]
    for k in (2, 4, 8):
        got = {r["node"]: r["importance"]
               for r in opic(_edges_df(spark, star), n_iter=k).collect()}
        assert max(got, key=got.get) == 1


# ---------------------------------------------------------------------------
# Early-exit convergence (tol mode) — r5: the fixed-iteration mode stays
# the oracle/twin contract; tol mode is the production capability.
# ---------------------------------------------------------------------------


def test_pagerank_early_exit_converges(spark):
    iters: list = []
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges_df(spark, EDGES), n_iter=60, tol=1e-10, iters_out=iters
        ).collect()
    }
    assert iters[0] < 60  # actually exited early
    fixed = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, EDGES), n_iter=60).collect()
    }
    assert set(got) == set(fixed)
    for u in fixed:  # both converged: values agree at the tolerance scale
        assert got[u] == pytest.approx(fixed[u], abs=1e-8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_tol_none_runs_fixed(spark):
    iters: list = []
    pagerank(_edges_df(spark, EDGES), n_iter=4, iters_out=iters).collect()
    assert iters == [4]


def test_opic_early_exit_anytime_estimate(spark):
    from web_scraper_spark.operators.graphalgo import opic

    iters: list = []
    got = {
        r["node"]: r["importance"]
        for r in opic(
            _edges_df(spark, EDGES), n_iter=60, tol=1e-10, iters_out=iters
        ).collect()
    }
    k = iters[0]
    assert k < 60
    # the early estimate IS the k-round estimate (the paper's anytime
    # property): value-identical to fixed-k mode, and still a distribution
    fixed_k = {
        r["node"]: r["importance"]
        for r in opic(_edges_df(spark, EDGES), n_iter=k).collect()
    }
    assert got == fixed_k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert max(got, key=got.get) == 1


def test_hits_early_exit_converges(spark):
    from web_scraper_spark.operators.graphalgo import hits

    iters: list = []
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            _edges_df(spark, EDGES), n_iter=60, tol=1e-10, iters_out=iters
        ).collect()
    }
    assert 3 <= iters[0] < 60
    fixed = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(_edges_df(spark, EDGES), n_iter=60).collect()
    }
    assert set(got) == set(fixed)
    for u in fixed:  # normalized vectors: converged direction matches
        assert got[u][0] == pytest.approx(fixed[u][0], abs=1e-6)
        assert got[u][1] == pytest.approx(fixed[u][1], abs=1e-6)
