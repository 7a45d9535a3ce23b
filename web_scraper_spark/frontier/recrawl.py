"""Recrawl scheduling: per-URL change-rate estimation from fetch history.

A frontier that refetches every page at the same cadence wastes its
politeness budget on static pages and staleness on fast-moving ones. The
standard fix (Cho & Garcia-Molina 2003, "Estimating Frequency of
Change") models page change as a Poisson process and estimates the rate
from n periodic fetches of which X observed a change. The naive
estimator −ln(1 − X/n) is biased and blows up at X = n; the paper's
bias-reduced estimator

    λ̂ = −ln((n − X + 0.5) / (n + 0.5))   (changes per fetch interval)

is finite for every (n, X) and is what this module computes, per URL,
as one map-side-combined groupBy over the fetch log.

The reference refetches its three sites on a fixed 3-hour cron
(actions.yml) with no change tracking at all; this is the estimator its
scheduler would grow at 10^10-URL scale, where the frontier can only
afford to revisit pages in proportion to how often they actually change.

Engine portability: n and X are exact integers, the ln argument is one
exact double ratio, and the single libm call is rounded to 6 dp (the
lm_perplexity/source_kl recipe) — value-exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# recrawl priority tiers on the estimated per-interval change rate
HOT_RATE = 0.5    # changes at least every other fetch: tighten cadence
COLD_RATE = 0.05  # change seen ≤ ~1-in-20 fetches: relax cadence


def change_rate(fetches: DataFrame) -> DataFrame:
    """Per-URL change-rate estimate from a fetch log of
    (url, fetch_seq, content_hash): consecutive-fetch changes are
    detected with a lag window INSIDE each url partition (one hash
    shuffle on url — the log's natural partitioning; rows carry url,
    seq, 32-byte hash), then the bias-reduced Cho–Garcia-Molina
    estimator and a three-tier cadence hint are one map-side-combined
    aggregate. Output: (url, n_fetches, n_changes, change_rate, tier)
    with tier ∈ {hot, steady, cold}; single-fetch URLs have n_changes 0
    and land in cold (no evidence of change yet)."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("fetch_seq")
    prev = F.lag("content_hash").over(w)
    marked = fetches.select(
        "url",
        F.when(
            prev.isNotNull() & (F.col("content_hash") != prev), 1
        ).otherwise(0).alias("chg"),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("bigint").alias("n_fetches"),
        F.sum("chg").cast("bigint").alias("n_changes"),
    )
    # + 0.0 normalizes IEEE negative zero: X = 0 gives −ln(1.0) = −0.0,
    # and the two engines render ±0.0 differently in the value hash
    lam = (
        F.round(
            -F.log(
                (F.col("n_fetches") - F.col("n_changes") + 0.5)
                / (F.col("n_fetches") + 0.5)
            ),
            6,
        )
        + F.lit(0.0)
    )
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        lam.alias("change_rate"),
        F.when(lam >= HOT_RATE, F.lit("hot"))
        .when(lam <= COLD_RATE, F.lit("cold"))
        .otherwise(F.lit("steady"))
        .alias("tier"),
    )


def change_rate_sql(fetches_cte: str) -> str:
    """DuckDB twin over a CTE producing (url, fetch_seq, content_hash)."""
    return f"""
        WITH fetches AS ({fetches_cte}),
        marked AS (
            SELECT url,
                   CASE WHEN lag(content_hash) OVER
                             (PARTITION BY url ORDER BY fetch_seq)
                             IS DISTINCT FROM content_hash
                        AND lag(content_hash) OVER
                             (PARTITION BY url ORDER BY fetch_seq)
                             IS NOT NULL
                        THEN 1 ELSE 0 END AS chg
            FROM fetches
        ),
        agg AS (
            SELECT url,
                   count(*)::BIGINT AS n_fetches,
                   sum(chg)::BIGINT AS n_changes
            FROM marked GROUP BY 1
        )
        SELECT url, n_fetches, n_changes,
               (round(-ln((n_fetches - n_changes + 0.5)
                          / (n_fetches + 0.5)), 6) + 0.0) AS change_rate,
               CASE WHEN round(-ln((n_fetches - n_changes + 0.5)
                                   / (n_fetches + 0.5)), 6) >= {HOT_RATE}
                    THEN 'hot'
                    WHEN round(-ln((n_fetches - n_changes + 0.5)
                                   / (n_fetches + 0.5)), 6) <= {COLD_RATE}
                    THEN 'cold'
                    ELSE 'steady' END AS tier
        FROM agg
    """
