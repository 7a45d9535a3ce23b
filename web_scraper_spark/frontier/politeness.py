"""Per-host politeness scheduler + robots filter (SURVEY.md ST5, north-rule).

The reference is polite by being sequential: `time.sleep(uniform(1,3))`
between articles (CrawlPaperVNExpress.py:277-278) and never reads
robots.txt. The engine makes the budget explicit and parallel-safe:

- robots: broadcast-join the (tiny) per-host rules table; drop URLs whose
  path matches a Disallow prefix (`exists` HOF — native).
- budget: per host per round, ``floor(round_seconds / crawl_delay)``
  fetches. Enforced with an UNSALTED window over ``host`` ordered by the
  canonical priority key — the budget is a per-host invariant, so it must
  be computed before any salting (SURVEY.md §7 "Per-host budget under
  salting").
- skew: AFTER selection, the batch is repartitioned on
  ``(host, pmod(url_hash, salt))`` so one hot host's budget spreads over
  ``salt`` tasks instead of serializing on one executor — the reference's
  single-site crawl is exactly the degenerate hot-host case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def priority_order() -> list:
    """Canonical crawl-order key (SURVEY.md T4): the documented
    deterministic order replacing the reference's unstable Python-set
    iteration. (Built lazily — Columns need an active session.)"""
    return [
        F.col("depth").asc(),
        F.col("inlinks").desc(),
        F.col("source_pos").asc(),
        F.col("category_pos").asc(),
        F.col("page_no").asc(),
        F.col("listing_pos").asc(),
        F.col("url_canon").asc(),
    ]


def robots_filter(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop URLs disallowed by their host's robots rules.

    robots(host, crawl_delay, disallow:array<string>) is dimension-sized
    (one row per host) → broadcast join; the prefix test is a native
    ``exists`` lambda over the disallow array (no Python).
    """
    path = F.regexp_extract(F.col("url_canon"), r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)$", 1)
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow")), on="host", how="left"
    )
    allowed = joined.filter(
        F.col("disallow").isNull()
        | ~F.exists("disallow", lambda d: path.startswith(d))
    )
    return allowed.drop("disallow")


def select_round(
    frontier: DataFrame,
    robots: DataFrame,
    round_seconds: float,
    default_crawl_delay: float = 1.0,
    salt: int = 8,
) -> DataFrame:
    """Pick this round's fetch set under the per-host politeness budget.

    Adds ``host_rank`` (1-based fetch position within the host) and
    ``fetch_slot_s`` (scheduled offset = host_rank * crawl_delay — the
    parallel analogue of the reference's inter-article sleeps), then
    spreads hosts over salted partitions for the parse stage.
    """
    with_delay = frontier.join(
        F.broadcast(robots.select("host", "crawl_delay")), on="host", how="left"
    ).withColumn(
        "crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(default_crawl_delay))
    )
    budget = F.floor(F.lit(float(round_seconds)) / F.col("crawl_delay"))
    # Two-phase budget so a hot host never serializes one task:
    #   phase 1 (salted pre-cap): rank within (host, salt) and keep `budget`
    #     rows per salt — the global top-`budget` rows of a host are spread
    #     across salts, and each salt keeps its best `budget`, so every
    #     globally-selected row survives → phase 2's result is EXACTLY the
    #     single-window result, but the big window now sees ≤ salt*budget
    #     rows per host instead of the host's whole frontier.
    w_pre = Window.partitionBy(
        "host", F.pmod(F.col("url_hash"), F.lit(salt))
    ).orderBy(*priority_order())
    precapped = (
        with_delay.withColumn("_pre_rank", F.row_number().over(w_pre))
        .filter(F.col("_pre_rank") <= budget)
        .drop("_pre_rank")
    )
    # phase 2 (exact): the per-host invariant, enforced unsalted
    w = Window.partitionBy("host").orderBy(*priority_order())
    ranked = precapped.withColumn("host_rank", F.row_number().over(w))
    selected = ranked.filter(F.col("host_rank") <= budget).withColumn(
        "fetch_slot_s", (F.col("host_rank") - 1) * F.col("crawl_delay")
    )
    # salted spread: hot host → `salt` tasks (budget already enforced above)
    return selected.repartition(
        F.col("host"), F.pmod(F.col("url_hash"), F.lit(salt))
    )
