"""robots.txt parser: equality vs urllib.robotparser + engine round-trip."""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import functions as F

from web_scraper_spark.frontier.robots import (
    parse_robots_text,
    parse_robots_txt,
    render_robots_txt,
)

# The grammar battery: groups, comments, blank-line group breaks, a
# User-agent line after rules starting a new group, multi-agent groups,
# empty Disallow (= no restriction), unknown keys, case variation,
# crawl-delay, a trailing agents-only group (discarded), and a mixed
# group containing '*' (fallback-only, never a specific match).
BODIES = [
    "",
    "User-agent: *\nDisallow: /private\nDisallow: /tmp/\n",
    # comments + unknown keys + case variation
    "# top comment\nUSER-AGENT: *  # inline\nSitemap: https://x/s.xml\n"
    "DisAllow: /a\nCrawl-Delay: 3\n",
    # specific group first, * later; specific has empty disallow
    "User-agent: SpecBot\nDisallow:\n\nUser-agent: *\nDisallow: /all\n",
    # multi-agent group + user-agent after rules starts a NEW group
    "User-agent: one\nUser-agent: two\nDisallow: /x\nUser-agent: three\nDisallow: /y\n",
    # blank line while collecting agents discards them
    "User-agent: ghost\n\nUser-agent: *\nDisallow: /g\n",
    # trailing agents-only group is discarded
    "User-agent: *\nDisallow: /p\n\nUser-agent: tail\n",
    # mixed group containing '*': fallback-only even for 'mixy'
    "User-agent: *\nUser-agent: mixy\nDisallow: /m\n\nUser-agent: mixy\nDisallow: /n\n",
    # rules before any user-agent are ignored
    "Disallow: /orphan\nUser-agent: *\nDisallow: /ok\n",
    # crawl-delay without disallow
    "User-agent: *\nCrawl-delay: 7\n",
]
AGENTS = ["*", "SpecBot/2.0", "two-bot", "mixy/1.1", "unrelated"]
PATHS = ["/", "/private", "/private/x", "/tmp/f", "/a", "/ab", "/all/z",
         "/x/1", "/y/1", "/g", "/p/q", "/m", "/n", "/ok", "/orphan"]


def test_decisions_match_stdlib_robotparser():
    """For every (body, agent, path): our disallow-prefix decision equals
    urllib.robotparser.can_fetch (the battery avoids Allow lines and '*'
    paths — the documented unmodeled subset)."""
    for body in BODIES:
        for agent in AGENTS:
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(body.splitlines())
            _, disallow = parse_robots_text(body, agent=agent)
            for path in PATHS:
                ours = not any(path.startswith(p) for p in disallow)
                theirs = rp.can_fetch(agent, "https://h.example" + path)
                assert ours == theirs, (body, agent, path, disallow)


def test_crawl_delay_and_group_selection():
    body = BODIES[3]
    delay, dis = parse_robots_text(body, agent="SpecBot/2.0")
    assert (delay, dis) == (None, [])  # empty Disallow: == unrestricted
    delay, dis = parse_robots_text(body, agent="zzz")
    assert dis == ["/all"]
    delay, dis = parse_robots_text(BODIES[2], agent="anything")
    assert delay == 3.0 and dis == ["/a"]
    # fractional delays are the documented superset vs robotparser
    assert parse_robots_text("User-agent: *\nCrawl-delay: 2.5\nDisallow: /d\n")[0] == 2.5


def test_render_parse_round_trip_matches_rules_table(spark, site_cfg):
    """synth robots.txt bodies → parse_robots_txt ≡ the hand-built rules
    table build_robots_df — a real crawl can start from bytes."""
    from web_scraper_spark.synth import build_robots_df
    from web_scraper_spark.synth.sitegen import build_robots_txt_df

    direct = {
        r["host"]: (r["crawl_delay"], list(r["disallow"]))
        for r in build_robots_df(spark, site_cfg).collect()
    }
    parsed = {
        r["host"]: (r["crawl_delay"], list(r["disallow"]))
        for r in parse_robots_txt(
            build_robots_txt_df(spark, site_cfg), default_delay=1.0
        ).collect()
    }
    assert parsed == direct


def test_parsed_rules_drive_robots_filter(spark, site_cfg):
    """robots_filter over the PARSED rules keeps exactly the URLs the
    direct rules table keeps."""
    from web_scraper_spark.frontier.politeness import robots_filter
    from web_scraper_spark.synth import build_robots_df
    from web_scraper_spark.synth.sitegen import build_robots_txt_df

    robots_direct = build_robots_df(spark, site_cfg)
    robots_parsed = parse_robots_txt(
        build_robots_txt_df(spark, site_cfg), default_delay=1.0
    )
    hosts = [r["host"] for r in robots_direct.select("host").collect()]
    dis = {r["host"]: list(r["disallow"]) for r in robots_direct.collect()}
    rows = []
    for h in hosts:
        rows.append((f"https://{h}/ok/page", h))
        for p in dis[h][:2]:
            rows.append((f"https://{h}{p}blocked", h))
    frontier = spark.createDataFrame(rows, "url_canon string, host string")
    keep = lambda robots: {
        r["url_canon"] for r in robots_filter(frontier, robots).collect()
    }
    got = keep(robots_parsed)
    assert got == keep(robots_direct)
    assert all("/ok/" in u for u in got) and got  # blocked prefixes gone


def test_null_and_missing_bodies_default_open(spark):
    bodies = spark.createDataFrame(
        [("a.example", None), ("b.example", "")], "host string, robots_txt string"
    )
    rows = {r["host"]: r for r in
            parse_robots_txt(bodies, default_delay=2.0).collect()}
    for h in ("a.example", "b.example"):
        assert rows[h]["crawl_delay"] == 2.0 and list(rows[h]["disallow"]) == []
