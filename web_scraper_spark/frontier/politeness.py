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
    host_state: DataFrame | None = None,
) -> DataFrame:
    """Pick this round's fetch set under the per-host politeness budget.

    Adds ``host_rank`` (1-based fetch position within the host) and
    ``fetch_slot_s`` (scheduled offset into the round — the parallel
    analogue of the reference's inter-article sleeps), then spreads hosts
    over salted partitions for the parse stage.

    Cross-round continuity: ``host_state(host, next_free_s)`` carries each
    host's schedule phase over the round boundary — the host's first slot
    this round is ``next_free_s``, and the budget is the number of slots
    ``next_free_s + i*crawl_delay`` that fit strictly inside the window:
    ``ceil((R - next_free_s)/delay)`` (0 if the debt exceeds the window).
    Two consequences: (a) back-to-back SHORT rounds can never fetch a host
    faster than 1/crawl_delay across the boundary, and (b) a host whose
    crawl_delay exceeds round_seconds is no longer starved — its unused
    window time accumulates as shrinking next_free_s until a slot fits.
    With no carry (next_free_s = 0) and delay dividing the window this is
    exactly the old per-round floor(R/delay) budget."""
    with_delay = frontier.join(
        F.broadcast(robots.select("host", "crawl_delay")), on="host", how="left"
    ).withColumn(
        "crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(default_crawl_delay))
    )
    if host_state is not None:
        with_delay = with_delay.join(
            F.broadcast(host_state.select("host", "next_free_s")), on="host", how="left"
        )
    else:
        with_delay = with_delay.withColumn("next_free_s", F.lit(None).cast("double"))
    with_delay = with_delay.withColumn(
        "next_free_s", F.coalesce(F.col("next_free_s"), F.lit(0.0))
    )
    R = F.lit(float(round_seconds))
    budget = F.when(
        F.col("next_free_s") < R,
        F.ceil((R - F.col("next_free_s")) / F.col("crawl_delay")),
    ).otherwise(F.lit(0))
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
        "fetch_slot_s",
        F.col("next_free_s") + (F.col("host_rank") - 1) * F.col("crawl_delay"),
    ).drop("next_free_s")
    # salted spread: hot host → `salt` tasks (budget already enforced above)
    return selected.repartition(
        F.col("host"), F.pmod(F.col("url_hash"), F.lit(salt))
    )


def next_host_state(
    log: DataFrame,
    prev_state: DataFrame | None,
    robots: DataFrame,
    round_seconds: float,
    default_crawl_delay: float = 1.0,
) -> DataFrame:
    """(host, next_free_s) to commit with this round, for the next round's
    ``select_round``: new debt = max(0, old debt + fetched*delay - window).
    Hosts whose debt decays to zero are dropped (absent == 0), so the
    table only ever holds hosts still owing schedule time — dimension-
    sized, broadcastable. ``log`` is this round's fetch log (every
    selected URL has a row, so count(*) per host == fetches charged)."""
    per = log.groupBy("host").agg(F.count("*").alias("_m"))
    if prev_state is not None:
        base = per.join(
            prev_state.select("host", "next_free_s"), on="host", how="full_outer"
        )
    else:
        base = per.withColumn("next_free_s", F.lit(None).cast("double"))
    return (
        base.join(F.broadcast(robots.select("host", "crawl_delay")), on="host", how="left")
        .select(
            "host",
            F.greatest(
                F.lit(0.0),
                F.coalesce(F.col("next_free_s"), F.lit(0.0))
                + F.coalesce(F.col("_m"), F.lit(0))
                * F.coalesce(F.col("crawl_delay"), F.lit(default_crawl_delay))
                - F.lit(float(round_seconds)),
            ).alias("next_free_s"),
        )
        .where(F.col("next_free_s") > 0)
    )
