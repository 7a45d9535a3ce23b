"""Live-fetch end-to-end: the crawl engine over real HTTP.

A local replay server serves the deterministic synthetic site; the engine
runs with fetch/http.py's batched fetch UDF instead of the stored-pages
join. The final URL-seen set and fetch outcomes must equal the
stored-pages crawl exactly — fetch is a plan point, not a semantic."""

from __future__ import annotations

import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def replay_server(site_cfg):
    from web_scraper_spark.synth.sitegen import build_site, render_page

    pages = {}
    for spec in build_site(site_cfg):
        url = spec["url"]
        # url https://host/path → served at /host/path
        host_path = url.split("://", 1)[1]
        pages["/" + host_path] = render_page(spec)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = pages.get(self.path)
            if body is None and self.path.endswith("/"):
                body = pages.get(self.path.rstrip("/") + "/")
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def _rewrite_factory(port: int):
    def rewrite(url: str) -> str:
        return f"http://127.0.0.1:{port}/" + url.split("://", 1)[1]

    return rewrite


def test_live_http_crawl_equals_stored_crawl(spark, site_cfg, replay_server):
    from web_scraper_spark.fetch.http import http_fetch_batch
    from web_scraper_spark.frontier.engine import CrawlConfig, CrawlEngine
    from web_scraper_spark.synth import build_pages_df, build_robots_df, seed_urls

    cfg = CrawlConfig(as_of="2025-12-01T22:30:00", round_seconds=30.0, max_rounds=4)
    robots = build_robots_df(spark, site_cfg)
    seeds = seed_urls(site_cfg)

    stored = CrawlEngine(
        spark, build_pages_df(spark, site_cfg).cache(), robots,
        tempfile.mkdtemp(prefix="stored_"), cfg,
    )
    stored.run(seeds=seeds)

    rewrite = _rewrite_factory(replay_server)
    live = CrawlEngine(
        spark, None, robots, tempfile.mkdtemp(prefix="live_"), cfg,
        fetch_fn=lambda df: http_fetch_batch(df, url_rewrite=rewrite, timeout_s=5.0),
    )
    live.run(seeds=seeds)

    seen_stored = {
        r["url_canon"]
        for r in stored.state.read_seen(stored.state.last_committed_round()).collect()
    }
    seen_live = {
        r["url_canon"]
        for r in live.state.read_seen(live.state.last_committed_round()).collect()
    }
    assert seen_live == seen_stored and len(seen_live) > 0

    log_s = stored.state.read_fetch_log().select("url_canon", "status", "title").collect()
    log_l = live.state.read_fetch_log().select("url_canon", "status", "title").collect()
    assert {tuple(r) for r in log_l} == {tuple(r) for r in log_s}


def test_http_fetch_pacing_honors_slots(spark, replay_server):
    import time

    from web_scraper_spark.fetch.http import http_fetch_batch

    rewrite = _rewrite_factory(replay_server)
    urls = spark.createDataFrame(
        [("https://alpha.example/", 0.0), ("https://beta.example/", 1.2)],
        "url string, fetch_slot_s double",
    ).coalesce(1)  # one task → the slot schedule is within-task
    t0 = time.monotonic()
    out = http_fetch_batch(urls, url_rewrite=rewrite, pace=True).collect()
    elapsed = time.monotonic() - t0
    assert all(r["fetched_ok"] for r in out)
    assert elapsed >= 1.2  # the 1.2 s slot was waited out


def test_http_fetch_worker_recycling(spark, site_cfg, replay_server):
    """ST6: the per-task fetch session is rebuilt every recycle_every
    fetches — session_gen advances, results unaffected."""
    from web_scraper_spark.fetch.http import http_fetch_batch
    from web_scraper_spark.synth.sitegen import build_site

    rewrite = _rewrite_factory(replay_server)
    urls = [s["url"] for s in build_site(site_cfg)][:9]
    df = spark.createDataFrame([(u,) for u in urls], "url string").coalesce(1)
    out = http_fetch_batch(
        df, url_rewrite=rewrite, timeout_s=5.0, recycle_every=3
    ).collect()
    assert all(r["fetched_ok"] for r in out)
    gens = sorted({r["session_gen"] for r in out})
    assert gens == [0, 1, 2]  # 9 fetches / recycle_every=3 → 3 generations


def test_http_fetch_retries_and_failures(spark, replay_server):
    from web_scraper_spark.fetch.http import http_fetch_batch

    rewrite = _rewrite_factory(replay_server)
    urls = spark.createDataFrame(
        [("https://alpha.example/does-not-exist.htm",)], "url string"
    )
    out = http_fetch_batch(
        urls, url_rewrite=rewrite, timeout_s=2.0, backoff_s=0.01
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["fetched_ok"] is False and r["status_code"] == 404
    assert r["attempts"] == 1  # 4xx is permanent: no retries
    assert r["html"] is None
