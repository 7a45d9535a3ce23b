"""Crawl-equality tests for hygiene mode (r5: the scheduler signals
composed into the round loop — CrawlConfig.hygiene).

Each scenario turns on exactly the condition that makes one gate engage
and asserts the full crawl-equality contract against the sequential
simulator (fetch ORDER and final URL-seen SET), plus a direct assertion
that the gate actually fired — a no-op gate would pass equality
trivially.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.frontier.engine import CrawlConfig, CrawlEngine
from web_scraper_spark.frontier.simulator import simulate_crawl
from web_scraper_spark.synth.sitegen import (
    SiteConfig,
    build_pages_df,
    build_robots_df,
    build_site,
    seed_urls,
)


def _run_both(spark, site, cfg, redirects_rows=None):
    pages = build_pages_df(spark, site).cache()
    robots = build_robots_df(spark, site)
    sd = tempfile.mkdtemp(prefix="hygiene_")
    rdf = (
        spark.createDataFrame(redirects_rows, "src string, dst string")
        if redirects_rows
        else None
    )
    try:
        eng = CrawlEngine(spark, pages, robots, sd, cfg, redirects=rdf)
        eng.run(seeds=seed_urls(site))
        log = (
            eng.state.read_fetch_log()
            .orderBy("round", "fetch_pos")
            .select("round", "url_canon", "status", "host")
            .collect()
        )
        seen = {
            r["url_canon"]
            for r in eng.state.read_seen(eng.state.last_committed_round()).collect()
        }
    finally:
        pages.unpersist()
        shutil.rmtree(sd, ignore_errors=True)
    sim = simulate_crawl(
        site, cfg, seed_urls(site), redirects=dict(redirects_rows or [])
    )
    return log, seen, sim


def _assert_equal(log, seen, sim):
    assert [(r["round"], r["url_canon"], r["status"]) for r in log] == [
        (r["round"], r["url_canon"], r["status"]) for r in sim.fetch_log
    ]
    assert seen == sim.seen


def _alpha_articles(site):
    """Category-0 alpha article URLs in listing order."""
    return [
        s["url"]
        for s in sorted(
            (
                s
                for s in build_site(site)
                if s["source"] == "alpha"
                and s["kind"] == "article"
                and s["category_pos"] == 0
            ),
            key=lambda s: s["listing_pos"],
        )
    ]


def test_hygiene_off_is_baseline(spark, site_cfg):
    """hygiene=False with a redirects table supplied must ignore it —
    the flag alone switches the composed scheduler on."""
    site = site_cfg
    arts = _alpha_articles(site)
    cfg = CrawlConfig(as_of="2025-12-01T22:30:00", round_seconds=30.0, hygiene=False)
    log, seen, sim = _run_both(spark, site, cfg, [(arts[0], arts[1])])
    _assert_equal(log, seen, sim)
    # the redirect source was fetched normally (not resolved away)
    from web_scraper_spark.urls import canon_url_py

    assert canon_url_py(arts[0]) in {r["url_canon"] for r in log}


def test_redirect_resolution_crawl_equality(spark, site_cfg):
    """One alias chain (a0 → a1) and one 2-cycle (a2 ↔ a3) inside alpha
    category 0: the alias collapses onto its target before seen-insert,
    the cycle members become unfetchable, order/seen stay simulator-equal."""
    site = site_cfg
    arts = _alpha_articles(site)
    redirects = [
        (arts[0], arts[1]),  # alias: a0 resolves to a1
        (arts[2], arts[3]),  # 2-cycle: a2 <-> a3, both unfetchable
        (arts[3], arts[2]),
    ]
    cfg = CrawlConfig(as_of="2025-12-01T22:30:00", round_seconds=30.0, hygiene=True)
    log, seen, sim = _run_both(spark, site, cfg, redirects)
    _assert_equal(log, seen, sim)
    from web_scraper_spark.urls import canon_url_py

    fetched = {r["url_canon"] for r in log}
    assert canon_url_py(arts[0]) not in fetched  # alias never fetched
    assert canon_url_py(arts[2]) not in fetched  # cycle members dropped
    assert canon_url_py(arts[3]) not in fetched
    # target fetched exactly once despite two inbound discoveries
    assert (
        sum(1 for r in log if r["url_canon"] == canon_url_py(arts[1])) == 1
    )


def test_health_circuit_breaker_crawl_equality(spark):
    """All alpha article pages missing: after enough fetch_failed
    evidence the alpha host is suspended — retries stop, the other hosts
    finish their crawl, engine == simulator."""
    site = SiteConfig(missing_article_mod={"alpha": 1})
    cfg = CrawlConfig(
        as_of="2025-12-01T22:30:00",
        round_seconds=30.0,
        hygiene=True,
        health_min_evidence=5,
    )
    log, seen, sim = _run_both(spark, site, cfg)
    _assert_equal(log, seen, sim)
    # the breaker engaged: alpha produced failures, then went quiet while
    # later rounds still fetched on other hosts
    alpha_rounds = [r["round"] for r in log if r["host"] == "alpha.example"]
    other_rounds = [r["round"] for r in log if r["host"] != "alpha.example"]
    assert any(r["status"] == "fetch_failed" for r in log)
    assert max(other_rounds) > max(alpha_rounds)
    # and retries were cut short: without the breaker every missing
    # article would be attempted max_fail times
    n_listed = sum(
        1
        for s in build_site(SiteConfig())
        if s["source"] == "alpha" and s["kind"] == "article"
    )
    n_failed = sum(1 for r in log if r["status"] == "fetch_failed")
    assert n_failed < n_listed * cfg.max_fail


def test_trap_budget_crawl_equality(spark):
    """Beta pagination URLs (/{cat}-pN) share one URL template; with a
    small per-template budget the whole cell is gated — page ≥ 2
    listings never fetch, page-1 articles still crawl, engine == simulator."""
    site = SiteConfig(articles_per_category=30)
    cfg = CrawlConfig(
        as_of="2025-12-01T22:30:00",
        round_seconds=30.0,
        hygiene=True,
        trap_template_cap=3,
    )
    log, seen, sim = _run_both(spark, site, cfg)
    _assert_equal(log, seen, sim)
    # the gate engaged: no beta pagination page (page 2+) was fetched...
    import re

    def is_page(url):
        return re.search(r"-p\d+$", url) is not None

    beta_pages = [
        r for r in log if r["host"] == "beta.example" and is_page(r["url_canon"])
    ]
    assert beta_pages == []
    # ...but beta page-1 listings and their articles were
    assert any(
        r["host"] == "beta.example" and r["status"] == "crawled" for r in log
    )
    # the ungated twin fetches those pagination pages (the gate, not the
    # site, removed them)
    base = simulate_crawl(
        site,
        CrawlConfig(as_of="2025-12-01T22:30:00", round_seconds=30.0),
        seed_urls(site),
    )
    assert any(is_page(r["url_canon"]) for r in base.fetch_log)


def test_hygiene_gate_plan_shape(spark, site_cfg):
    """The verdict's plan contract: the hygiene gates add NO non-metadata
    shuffle to the round plan — both signal joins are broadcast anti-joins
    (the only new exchanges feed the metadata-sized host/template rollups)
    and nothing introduces a sort-merge join or a single-partition window."""
    import tempfile as tf

    cfg = CrawlConfig(hygiene=True)
    pages = build_pages_df(spark, site_cfg)
    robots = build_robots_df(spark, site_cfg)
    sd = tf.mkdtemp(prefix="hygieneplan_")
    try:
        eng = CrawlEngine(spark, pages, robots, sd, cfg)
        eng.init(seeds=seed_urls(site_cfg))
        frontier = eng.state.read_frontier(0)
        gated = eng._hygiene_gate(1, frontier)
        plan = gated._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2
        assert "LeftAnti" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        # gating must not change the frontier schema the selector consumes
        assert gated.columns == frontier.columns
    finally:
        shutil.rmtree(sd, ignore_errors=True)
