"""Composed frontier-round scheduler: every hygiene signal in one plan.

Round 4 left the crawl-scheduler signals — redirect resolution
(redirects.py), per-host health gating (health.py), trap detection
(traps.py), recrawl cadence (recrawl.py), inlink priority (linkgraph.py)
— as individually-oracled operators that the round selector never
consumed. This module composes them into the selection policy a
10^10-URL frontier actually schedules with (the reference's single-site
loop — `/root/reference/CrawlPaper_TuoiTre.py` — needs none of these;
Heritrix/Nutch-class crawlers need all of them):

1. **Redirect-resolve before seen-insert** — every frontier URL maps to
   its terminal target (pointer-doubling resolve_redirects); URLs whose
   chain cycles or exceeds the hop bound are dropped (unfetchable).
   Aliases collapsing to one terminal URL merge: min depth wins,
   alias count is kept as evidence.
2. **Health gate** — hosts whose fetch-log error rate trips the
   suspension threshold are circuit-broken out of the round entirely;
   degraded hosts stay eligible at reduced priority.
3. **Trap gate** — (host, URL-template) cells whose distinct-URL count
   exceeds the per-template budget are dropped (IRLbot STAR budget /
   Heritrix pathological-URI semantics — the calendar-trap defense).
4. **Recrawl cadence** — URLs with fetch history are deferred when the
   Cho–Garcia-Molina change-rate estimator says they are cold; hot pages
   get a priority boost. Never-fetched URLs schedule normally.
5. **Priority queue** — integer priority from inlink evidence and depth
   (linkgraph.frontier_priority's formula, +1-smoothed so zero-inlink
   URLs still order by depth), adjusted by the health/recrawl tiers,
   totally ordered into queue positions by the two-phase global rank
   (no single-task window — the sorted-Iceberg-partitions shape).

Scale shape: the health, trap, and recrawl frames aggregate to
metadata-sized signal tables (one row per host / template cell /
fetched URL with history); health and trap broadcast against the
frontier, the redirect map and recrawl history join hash-on-url (both
co-keyed with the frontier's own partitioning at scale). All gating
arithmetic is exact integers + one 6-dp-rounded ratio per signal, so
the DuckDB twin is value-exact end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.frontier.health import host_health, host_health_sql
from web_scraper_spark.frontier.linkgraph import PRIORITY_SCALE
from web_scraper_spark.frontier.recrawl import change_rate, change_rate_sql
from web_scraper_spark.frontier.redirects import (
    resolve_redirects,
    resolve_redirects_sql,
)
from web_scraper_spark.frontier.traps import (
    TRAP_TEMPLATE_URLS,
    url_template,
    url_template_sql,
)
from web_scraper_spark.operators.ranking import with_global_rank

# priority adjustments (exact integer arithmetic, oracle-portable)
DEGRADED_DIV = 4  # degraded host → priority quartered
HOT_BOOST = 2     # hot-change page → priority doubled


def _host(url) -> F.Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)


def _scored_schedule(
    frontier: DataFrame,
    links: DataFrame,
    redirects: DataFrame,
    fetch_log: DataFrame,
    fetch_history: DataFrame,
    template_cap: int = TRAP_TEMPLATE_URLS,
    max_hops: int = 16,
) -> DataFrame:
    """Everything up to (not including) the queue rank — split out so
    plan tests can assert the gate joins before the two-phase rank's
    eager localCheckpoint truncates the visible lineage."""
    # 1. redirect-resolve, drop cycles/over-bound chains, collapse aliases
    res = resolve_redirects(redirects, max_hops=max_hops)
    resolved = (
        frontier.join(res.withColumnRenamed("url", "r_url"), frontier.url == F.col("r_url"), "left")
        .where(F.col("resolved").isNull() | F.col("resolved"))
        .select(
            F.coalesce(F.col("final_url"), frontier.url).alias("url"),
            "depth",
        )
        .groupBy("url")
        .agg(
            F.min("depth").cast("bigint").alias("depth"),
            F.count("*").cast("bigint").alias("n_aliases"),
        )
    )

    # 2. health gate (metadata-sized: one row per host → broadcast)
    hh = host_health(fetch_log).select("host", F.col("tier").alias("health_tier"))
    gated = (
        resolved.withColumn("host", _host(F.col("url")))
        .join(F.broadcast(hh), "host", "left")
        .withColumn("health_tier", F.coalesce(F.col("health_tier"), F.lit("healthy")))
        .where(F.col("health_tier") != "suspended")
    )

    # 3. trap gate: per-(host, template) distinct-URL budget over the
    # collapsed frontier itself (counts ride one map-side-combined
    # shuffle; the over-cap cell list is metadata-sized → broadcast)
    cells = (
        resolved.select(
            _host(F.col("url")).alias("host"),
            url_template(F.col("url")).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count("*").alias("t_urls"))
        .where(F.col("t_urls") > template_cap)
        .select("host", "template")
    )
    gated = gated.withColumn("template", url_template(F.col("url"))).join(
        F.broadcast(cells), ["host", "template"], "left_anti"
    )

    # 4. recrawl cadence: defer cold pages, mark hot ones
    cr = change_rate(fetch_history).select(
        F.col("url").alias("cr_url"), F.col("tier").alias("recrawl_tier")
    )
    gated = (
        gated.join(cr, gated.url == F.col("cr_url"), "left")
        .withColumn("recrawl_tier", F.coalesce(F.col("recrawl_tier"), F.lit("new")))
        .where(F.col("recrawl_tier") != "cold")
        .drop("cr_url")
    )

    # 5. inlink priority + tier adjustments + two-phase total order
    inl = links.groupBy("dst").agg(F.count("*").cast("bigint").alias("inlinks"))
    scored = (
        gated.join(inl, gated.url == inl.dst, "left")
        .select(
            "url", "depth", "n_aliases", "health_tier", "recrawl_tier",
            F.coalesce(F.col("inlinks"), F.lit(0)).cast("bigint").alias("inlinks"),
        )
        .withColumn(
            "priority",
            F.expr(f"((inlinks + 1) * {PRIORITY_SCALE}) DIV (depth + 1)"),
        )
        .withColumn(
            "priority",
            F.when(
                F.col("health_tier") == "degraded",
                F.expr(f"priority DIV {DEGRADED_DIV}"),
            ).otherwise(F.col("priority")),
        )
        .withColumn(
            "priority",
            F.when(
                F.col("recrawl_tier") == "hot", F.col("priority") * HOT_BOOST
            )
            .otherwise(F.col("priority"))
            .cast("bigint"),
        )
        .withColumn("neg_priority", -F.col("priority"))
    )
    return scored


def frontier_schedule(
    frontier: DataFrame,
    links: DataFrame,
    redirects: DataFrame,
    fetch_log: DataFrame,
    fetch_history: DataFrame,
    template_cap: int = TRAP_TEMPLATE_URLS,
    max_hops: int = 16,
) -> DataFrame:
    """The composed round schedule.

    Inputs: ``frontier (url, depth)``, ``links (src, dst, ...)`` for
    inlink evidence, ``redirects (src, dst)``, ``fetch_log (url,
    status)`` for host health, ``fetch_history (url, fetch_seq,
    content_hash)`` for change rates. Output, one row per SCHEDULED
    terminal URL: ``(url, depth, n_aliases, inlinks, health_tier,
    recrawl_tier, priority, queue_pos)`` — gated URLs (cycles, suspended
    hosts, trap templates, cold recrawls) are absent.
    """
    scored = _scored_schedule(
        frontier, links, redirects, fetch_log, fetch_history,
        template_cap=template_cap, max_hops=max_hops,
    )
    ranked, _handle = with_global_rank(
        scored, [F.col("neg_priority").asc(), F.col("url").asc()], "queue_pos"
    )
    return ranked.select(
        "url", "depth", "n_aliases", "inlinks", "health_tier", "recrawl_tier",
        "priority", F.col("queue_pos").cast("bigint").alias("queue_pos"),
    )


def frontier_schedule_sql(
    frontier_cte: str,
    links_cte: str,
    redirects_cte: str,
    fetch_log_cte: str,
    fetch_history_cte: str,
    template_cap: int = TRAP_TEMPLATE_URLS,
    max_hops: int = 16,
) -> str:
    """DuckDB twin: each stage reuses the component operator's own oracle
    body as a nested CTE subquery, so the composition is value-exact by
    construction wherever the components are. The oracle may use a global
    ROW_NUMBER window — it runs single-node; the Spark side must not
    (plan-asserted)."""
    tmpl = url_template_sql("url")
    return f"""
        WITH frontier AS ({frontier_cte}),
        links AS ({links_cte}),
        res AS ({resolve_redirects_sql(redirects_cte, max_hops=max_hops)}),
        hh AS ({host_health_sql(fetch_log_cte)}),
        cr AS ({change_rate_sql(fetch_history_cte)}),
        resolved AS (
            SELECT coalesce(r.final_url, f.url) AS url,
                   min(f.depth)::BIGINT AS depth,
                   count(*)::BIGINT AS n_aliases
            FROM frontier f LEFT JOIN res r ON f.url = r.url
            WHERE r.resolved IS NULL OR r.resolved
            GROUP BY 1
        ),
        trap_cells AS (
            SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                   {tmpl} AS template
            FROM resolved
            GROUP BY 1, 2
            HAVING count(*) > {template_cap}
        ),
        gated AS (
            SELECT v.url, v.depth, v.n_aliases,
                   coalesce(hh.tier, 'healthy') AS health_tier,
                   coalesce(cr.tier, 'new') AS recrawl_tier
            FROM resolved v
            LEFT JOIN hh
              ON regexp_extract(v.url, '^[a-z]+://([^/]+)', 1) = hh.host
            LEFT JOIN cr ON v.url = cr.url
            WHERE coalesce(hh.tier, 'healthy') <> 'suspended'
              AND coalesce(cr.tier, 'new') <> 'cold'
              AND NOT EXISTS (
                  SELECT 1 FROM trap_cells t
                  WHERE t.host = regexp_extract(v.url, '^[a-z]+://([^/]+)', 1)
                    AND t.template = {url_template_sql("v.url")}
              )
        ),
        scored AS (
            SELECT g.url, g.depth, g.n_aliases, g.health_tier, g.recrawl_tier,
                   coalesce(i.inlinks, 0)::BIGINT AS inlinks,
                   (CASE WHEN g.recrawl_tier = 'hot' THEN {HOT_BOOST} ELSE 1 END
                    * (CASE WHEN g.health_tier = 'degraded'
                            THEN (((coalesce(i.inlinks, 0) + 1) * {PRIORITY_SCALE})
                                  // (g.depth + 1)) // {DEGRADED_DIV}
                            ELSE ((coalesce(i.inlinks, 0) + 1) * {PRIORITY_SCALE})
                                  // (g.depth + 1) END)
                   )::BIGINT AS priority
            FROM gated g
            LEFT JOIN (SELECT dst, count(*)::BIGINT AS inlinks
                       FROM links GROUP BY 1) i
              ON g.url = i.dst
        )
        SELECT url, depth, n_aliases, inlinks, health_tier, recrawl_tier,
               priority,
               row_number() OVER (ORDER BY priority DESC, url)::BIGINT
                   AS queue_pos
        FROM scored
    """
