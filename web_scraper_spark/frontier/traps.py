"""Crawler-trap detection: flag hosts whose URL space explodes.

Infinite URL spaces — calendar pages, session-id/tracking params,
faceted-search permutations — are the classic crawl failure mode: a
polite frontier can sink its entire per-host budget into one template
that generates unbounded distinct URLs. Production crawlers enforce
per-host/per-template budgets for exactly this (IRLbot's STAR budget
enforcement, Heritrix's pathological-URI rules); the reference has no
defense at all — its pagination walk (CrawlPaperVNExpress.py:222-235)
would follow a calendar trap forever.

The detector is a pure rollup over the frontier's distinct URL set:
collapse every digit run in the path to ``N`` (the URL *template*), then
ask which hosts have templates generating pathologically many distinct
URLs. Two map-side-combined groupBys — (host, template) then host — so
rows past the first exchange are (host, template, count) triples; URL
strings never shuffle twice. All expressions are whole-stage-codegen
regex/string ops, RE2-safe on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# flag a host when its worst template has generated this many distinct
# URLs (the per-template budget a frontier would enforce)
TRAP_TEMPLATE_URLS = 100


def url_template(url):
    """The URL's path template: scheme+host stripped, every digit run
    collapsed to ``N``, query string kept (session ids live there)."""
    path = F.regexp_replace(url, r"^[a-z]+://[^/]+", "")
    return F.regexp_replace(path, "[0-9]+", "N")


def url_template_sql(url: str) -> str:
    return (
        f"regexp_replace(regexp_replace({url}, '^[a-z]+://[^/]+', ''),"
        " '[0-9]+', 'N', 'g')"
    )


def trap_stats(urls: DataFrame, template_cap: int = TRAP_TEMPLATE_URLS) -> DataFrame:
    """Per-host URL-space rollup over a frontier's DISTINCT URLs:
    ``n_urls``, ``n_templates``, ``max_template_urls`` (the worst
    template's distinct-URL count), ``urls_per_template`` (mean), and
    ``trap`` — the worst template exceeded ``template_cap``.

    Input: one ``url`` column (duplicates tolerated — the first groupBy
    de-duplicates by construction since a URL maps to exactly one
    (host, template) cell only when counted distinctly, so the plan
    starts with the (host, template, url) distinct). At 10^10-URL scale
    both aggregates are map-side combined and everything after the
    first exchange carries counts, not URLs.
    """
    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    per_template = (
        urls.select(
            host.alias("host"),
            url_template(F.col("url")).alias("template"),
            F.col("url"),
        )
        .distinct()
        .groupBy("host", "template")
        .agg(F.count("*").cast("bigint").alias("t_urls"))
    )
    return (
        per_template.groupBy("host")
        .agg(
            F.sum("t_urls").cast("bigint").alias("n_urls"),
            F.count("*").cast("bigint").alias("n_templates"),
            F.max("t_urls").cast("bigint").alias("max_template_urls"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            "max_template_urls",
            F.round(
                F.col("n_urls").cast("double") / F.col("n_templates"), 6
            ).alias("urls_per_template"),
            (F.col("max_template_urls") > template_cap).alias("trap"),
        )
    )


def trap_stats_sql(urls_cte: str, template_cap: int = TRAP_TEMPLATE_URLS) -> str:
    """DuckDB twin over a CTE producing a single ``url`` column."""
    tmpl = url_template_sql("url")
    return f"""
        WITH urls AS ({urls_cte}),
        per_template AS (
            SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                   {tmpl} AS template,
                   count(DISTINCT url)::BIGINT AS t_urls
            FROM urls GROUP BY 1, 2
        )
        SELECT host,
               sum(t_urls)::BIGINT AS n_urls,
               count(*)::BIGINT AS n_templates,
               max(t_urls)::BIGINT AS max_template_urls,
               round(sum(t_urls)::DOUBLE / count(*), 6) AS urls_per_template,
               (max(t_urls) > {template_cap}) AS trap
        FROM per_template GROUP BY 1
    """
