"""Host-health circuit breaker: tier thresholds, evidence floor, and the
4xx-counts-as-served rule."""

from __future__ import annotations

from web_scraper_spark.frontier import health as hl


def _log(spark, rows):
    return spark.createDataFrame(rows, "url string, status string")


def test_tiers_and_evidence_floor(spark):
    rows = []
    # bad.x: 30 fetches, 18 timeouts (60%) -> suspended
    rows += [(f"https://bad.x/p{i}", "timeout" if i < 18 else "crawled") for i in range(30)]
    # soso.x: 30 fetches, 9 5xx (30%) -> degraded
    rows += [(f"https://soso.x/p{i}", "http_5xx" if i < 9 else "crawled") for i in range(30)]
    # fine.x: 30 fetches, all 404 -> healthy (4xx is the server WORKING)
    rows += [(f"https://fine.x/p{i}", "http_404") for i in range(30)]
    # tiny.x: 5 fetches all errors -> healthy (below the evidence floor)
    rows += [(f"https://tiny.x/p{i}", "conn_refused") for i in range(5)]
    out = {r["host"]: r for r in hl.host_health(_log(spark, rows)).collect()}
    assert out["bad.x"]["tier"] == "suspended"
    assert out["bad.x"]["n_errors"] == 18
    assert out["soso.x"]["tier"] == "degraded"
    assert out["fine.x"]["tier"] == "healthy"
    assert out["fine.x"]["n_errors"] == 0
    assert out["tiny.x"]["tier"] == "healthy"
    assert out["tiny.x"]["error_rate"] == 1.0


def test_boundary_rates_inclusive(spark):
    # exactly 50% over exactly MIN_EVIDENCE fetches -> suspended (>=)
    rows = [(f"https://edge.x/p{i}", "timeout" if i % 2 == 0 else "crawled")
            for i in range(hl.MIN_EVIDENCE)]
    out = hl.host_health(_log(spark, rows)).collect()[0]
    assert (out["tier"], out["error_rate"]) == ("suspended", 0.5)
