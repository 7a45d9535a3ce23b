"""Per-host fetch-health gating: the crawl scheduler's circuit breaker.

A host that times out or serves 5xx for most requests should stop
consuming politeness budget long before its URLs individually exhaust
their retry budgets (the reference retries per-article 3× and moves on —
`/root/reference/CrawlPaper_TuoiTre.py:105,135` — but never aggregates
failures per site; Heritrix/Nutch class crawlers suspend the whole queue
of a failing server). This operator rolls the fetch log up per host and
assigns a gating tier:

    suspended  — error rate ≥ SUSPEND_RATE over ≥ MIN_EVIDENCE fetches
    degraded   — error rate ≥ DEGRADE_RATE over ≥ MIN_EVIDENCE fetches
    healthy    — everything else (including hosts with too little
                 evidence to gate: suspending on 2 fetches starves
                 slow-start hosts)

One map-side-combined groupBy on host; the error rate is an exact
integer ratio rounded at 6 dp (the division of two exact BIGINTs is
IEEE-identical across engines), so the DuckDB twin is value-exact. At
10^10-URL scale this is a metadata-sized frame (one row per host) the
selector broadcast-joins against the frontier, the same shape as the
politeness host_state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUSPEND_RATE = 0.5
DEGRADE_RATE = 0.2
MIN_EVIDENCE = 20
ERROR_STATUSES = ("timeout", "http_5xx", "conn_refused")


def host_health(fetches: DataFrame) -> DataFrame:
    """Per-host health rollup from a fetch log of (url, status).

    Output: (host, n_fetches, n_errors, error_rate, tier). Status values
    in ERROR_STATUSES count as errors; everything else (crawled, 2xx,
    http_4xx content errors) counts as served — a 404 is the server
    WORKING, only transport/server failures gate the host.
    """
    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    err = F.when(F.col("status").isin(*ERROR_STATUSES), 1).otherwise(0)
    agg = (
        fetches.select(host.alias("host"), err.alias("err"))
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_fetches"),
            F.sum("err").cast("bigint").alias("n_errors"),
        )
    )
    rate = F.round(F.col("n_errors") / F.col("n_fetches"), 6)
    return agg.select(
        "host",
        "n_fetches",
        "n_errors",
        rate.alias("error_rate"),
        F.when(
            (F.col("n_fetches") >= MIN_EVIDENCE) & (rate >= SUSPEND_RATE),
            F.lit("suspended"),
        )
        .when(
            (F.col("n_fetches") >= MIN_EVIDENCE) & (rate >= DEGRADE_RATE),
            F.lit("degraded"),
        )
        .otherwise(F.lit("healthy"))
        .alias("tier"),
    )


def host_health_sql(fetches_cte: str) -> str:
    """DuckDB twin over a CTE producing (url, status)."""
    errs = ", ".join(f"'{s}'" for s in ERROR_STATUSES)
    return f"""
        WITH fetches AS ({fetches_cte}),
        agg AS (
            SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                   count(*)::BIGINT AS n_fetches,
                   sum(CASE WHEN status IN ({errs}) THEN 1 ELSE 0 END)::BIGINT
                       AS n_errors
            FROM fetches GROUP BY 1
        )
        SELECT host, n_fetches, n_errors,
               round(n_errors / n_fetches, 6) AS error_rate,
               CASE WHEN n_fetches >= {MIN_EVIDENCE}
                         AND round(n_errors / n_fetches, 6) >= {SUSPEND_RATE}
                    THEN 'suspended'
                    WHEN n_fetches >= {MIN_EVIDENCE}
                         AND round(n_errors / n_fetches, 6) >= {DEGRADE_RATE}
                    THEN 'degraded'
                    ELSE 'healthy' END AS tier
        FROM agg
    """
