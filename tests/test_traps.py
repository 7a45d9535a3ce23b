"""Crawler-trap detection (frontier/traps.py): planted calendar trap,
duplicate tolerance, session-id template collapse."""

from __future__ import annotations

from web_scraper_spark.frontier import traps as tr


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_trap_stats_flags_calendar_trap(spark):
    trap = [f"https://trap.example/cal/{d}/{h}" for d in range(30) for h in range(5)]
    ok = [f"https://ok.example/cat/{i}/page" for i in range(8)] + [
        f"https://ok.example/item/{i}" for i in range(20)
    ]
    out = {r["host"]: r for r in tr.trap_stats(_urls(spark, trap + ok)).collect()}
    t = out["trap.example"]
    # one template (/cal/N/N) generated 150 distinct URLs -> trap
    assert t["n_urls"] == 150 and t["n_templates"] == 1
    assert t["max_template_urls"] == 150 and t["trap"]
    o = out["ok.example"]
    assert o["n_urls"] == 28 and o["n_templates"] == 2
    assert o["max_template_urls"] == 20 and not o["trap"]
    assert o["urls_per_template"] == 14.0


def test_trap_stats_counts_distinct_urls(spark):
    # refetches/duplicate discoveries of one URL are one frontier entry
    urls = ["https://a.example/item/1"] * 5 + ["https://a.example/item/2"]
    out = tr.trap_stats(_urls(spark, urls)).collect()
    assert len(out) == 1
    assert out[0]["n_urls"] == 2 and out[0]["n_templates"] == 1


def test_trap_stats_session_ids_collapse_to_one_template(spark):
    # session ids live in the query string: digit runs there collapse too,
    # so an unbounded ?sid= space is ONE exploding template, not many
    urls = [f"https://s.example/home?sid={i}" for i in range(120)]
    out = tr.trap_stats(_urls(spark, urls)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_templates"] == 1 and r["max_template_urls"] == 120 and r["trap"]


def test_trap_stats_custom_cap(spark):
    urls = [f"https://c.example/p/{i}" for i in range(10)]
    assert tr.trap_stats(_urls(spark, urls), template_cap=5).collect()[0]["trap"]
    assert not tr.trap_stats(_urls(spark, urls), template_cap=50).collect()[0]["trap"]
