"""Mirror-host detection: hand-computed Jaccard, boilerplate-path cap
engagement, and the no-crossJoin plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.frontier import mirrors as mi


def _urls(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


def test_mirror_pairs_hand_case(spark):
    # a and b share 2 of (3 ∪ 3) = 2/4 -> 0.5; c shares nothing
    urls = _urls(
        spark,
        [
            "https://a.x/p1",
            "https://a.x/p2",
            "https://a.x/only-a",
            "https://b.x/p1",
            "https://b.x/p2",
            "https://b.x/only-b",
            "https://c.x/zzz",
            # duplicate URL must not double-count the path
            "https://a.x/p1",
        ],
    )
    out = mi.mirror_pairs(urls, tau=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("a.x", "b.x")
    assert (r["inter"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["jaccard"] == 0.5


def test_boilerplate_path_cap_engages(spark):
    # '/index' lives on 12 hosts (> cap 10): without the cap every host
    # pair would share it; with the cap only the true mirror pair
    # (h0, h1 sharing /deep1 and /deep2) survives.
    rows = [f"https://h{i}.x/index" for i in range(12)]
    rows += ["https://h0.x/deep1", "https://h0.x/deep2"]
    rows += ["https://h1.x/deep1", "https://h1.x/deep2"]
    out = mi.mirror_pairs(_urls(spark, rows), tau=0.5, max_hosts_per_path=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("h0.x", "h1.x")
    # n_a counts the host's FULL distinct path set (3, incl. /index);
    # only the intersection is restricted to discriminative paths
    assert (r["inter"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert abs(r["jaccard"] - 0.5) < 1e-9


def test_mirror_pairs_plan_no_cartesian(spark, sf_dir):
    from web_scraper_spark.queries import q_mirror_hosts

    df = q_mirror_hosts(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
