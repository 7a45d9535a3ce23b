"""Redirect resolution: hand-computed chains, cycle handling, the hop
bound, and plan hygiene."""

from __future__ import annotations

from web_scraper_spark.frontier import redirects as rd


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_chain_resolution_hand_case(spark):
    # a -> b -> c -> T ; d -> T ; T terminal
    out = {
        r["url"]: r
        for r in rd.resolve_redirects(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "T"), ("d", "T")])
        ).collect()
    }
    assert (out["a"]["final_url"], out["a"]["n_hops"], out["a"]["resolved"]) == ("T", 3, True)
    assert (out["b"]["final_url"], out["b"]["n_hops"]) == ("T", 2)
    assert (out["c"]["final_url"], out["c"]["n_hops"]) == ("T", 1)
    assert (out["d"]["final_url"], out["d"]["n_hops"]) == ("T", 1)


def test_cycle_reports_unresolved(spark):
    out = {
        r["url"]: r
        for r in rd.resolve_redirects(
            _edges(spark, [("a", "b"), ("b", "a"), ("x", "T")])
        ).collect()
    }
    assert out["a"]["resolved"] is False
    assert out["b"]["resolved"] is False
    assert out["a"]["n_hops"] == rd.MAX_HOPS  # clamped at the bound
    assert (out["x"]["final_url"], out["x"]["resolved"]) == ("T", True)


def test_chain_at_the_doubling_bound(spark):
    # a 16-hop chain resolves exactly at the bound; a 17-hop chain
    # cannot terminate within it and reports unresolved
    chain16 = [(f"n{i}", f"n{i+1}") for i in range(16)]
    out = {r["url"]: r for r in rd.resolve_redirects(_edges(spark, chain16)).collect()}
    assert (out["n0"]["final_url"], out["n0"]["n_hops"], out["n0"]["resolved"]) == (
        "n16",
        16,
        True,
    )
    chain17 = [(f"m{i}", f"m{i+1}") for i in range(17)]
    out = {r["url"]: r for r in rd.resolve_redirects(_edges(spark, chain17)).collect()}
    assert out["m0"]["resolved"] is False


def test_resolve_plan_hygiene(spark, sf_dir):
    from web_scraper_spark.queries import q_resolve_redirects

    plan = (
        q_resolve_redirects(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
