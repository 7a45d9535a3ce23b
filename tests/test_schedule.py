"""Unit tests for frontier/schedule.py::frontier_schedule — the composed
round scheduler (redirect resolution, health gate, trap budget, recrawl
cadence, inlink priority, two-phase queue rank) on a hand-computed case.
The sf-scale value-exactness vs DuckDB is covered by the registry oracle
(tests/test_oracle_replica.py::frontier_schedule)."""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.frontier.schedule import frontier_schedule

PRI = 1_000_000


@pytest.fixture(scope="module")
def tiny(spark):
    frontier = spark.createDataFrame(
        [
            ("https://x.example/a", 2),      # alias of /b (redirect)
            ("https://x.example/b", 1),      # terminal; collapses with /a
            ("https://x.example/c1", 0),     # 2-cycle -> unfetchable
            ("https://bad.example/p", 1),    # suspended host
            ("https://slow.example/p", 1),   # degraded host
            ("https://x.example/hot", 1),    # hot recrawl -> boosted
            ("https://x.example/cold", 1),   # cold recrawl -> deferred
        ]
        + [(f"https://x.example/t{i}", 3) for i in range(1, 6)],  # trap cell
        "url string, depth bigint",
    )
    redirects = spark.createDataFrame(
        [
            ("https://x.example/a", "https://x.example/b"),
            ("https://x.example/c1", "https://x.example/c2"),
            ("https://x.example/c2", "https://x.example/c1"),
        ],
        "src string, dst string",
    )
    fetch_log = spark.createDataFrame(
        [("https://bad.example/q", "timeout")] * 20
        + [("https://slow.example/q", "http_5xx")] * 5
        + [("https://slow.example/q", "crawled")] * 15
        + [("https://x.example/q", "crawled")] * 20,
        "url string, status string",
    )
    fetch_history = spark.createDataFrame(
        [(f"https://x.example/hot", i, f"h{i}") for i in range(1, 6)]
        + [(f"https://x.example/cold", i, "same") for i in range(1, 6)],
        "url string, fetch_seq bigint, content_hash string",
    )
    links = spark.createDataFrame(
        [("s", "https://x.example/b")] * 3 + [("s", "https://x.example/hot")],
        "src string, dst string",
    )
    return frontier, links, redirects, fetch_log, fetch_history


def _rows(df):
    return {
        r["url"]: (
            r["depth"], r["n_aliases"], r["inlinks"], r["health_tier"],
            r["recrawl_tier"], r["priority"], r["queue_pos"],
        )
        for r in df.collect()
    }


def test_hand_computed_schedule(spark, tiny):
    out = _rows(frontier_schedule(*tiny, template_cap=4))
    assert set(out) == {
        "https://x.example/b",
        "https://slow.example/p",
        "https://x.example/hot",
    }
    # alias collapsed: min depth, 2 contributors, 3 inlinks, base priority
    assert out["https://x.example/b"] == (
        1, 2, 3, "healthy", "new", (4 * PRI) // 2, 1
    )
    # hot page: priority doubled; ties with /b on priority, loses on url
    assert out["https://x.example/hot"] == (
        1, 1, 1, "healthy", "hot", ((2 * PRI) // 2) * 2, 2
    )
    # degraded host: priority quartered
    assert out["https://slow.example/p"] == (
        1, 1, 0, "degraded", "new", ((1 * PRI) // 2) // 4, 3
    )


def test_schedule_partition_invariance(spark, tiny):
    base = _rows(frontier_schedule(*tiny, template_cap=4))
    shuffled = [df.repartition(7) for df in tiny]
    assert _rows(frontier_schedule(*shuffled, template_cap=4)) == base


def test_schedule_plan_shape(spark, tiny):
    from web_scraper_spark.frontier.schedule import _scored_schedule

    # ranked output: the two-phase rank must never serialize one task
    df = frontier_schedule(*tiny, template_cap=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # gate joins (asserted pre-rank — the rank's eager localCheckpoint
    # truncates the visible lineage): health/trap broadcast, no cartesian
    scored = _scored_schedule(*tiny, template_cap=4)
    plan2 = scored._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "BroadcastHashJoin" in plan2
    assert "SinglePartition" not in plan2
