"""Redirect-chain resolution: collapse 3xx chains to their terminal URL.

A crawler that stores redirects as raw (src → dst) edges wastes frontier
slots refetching hop URLs and splits per-URL statistics across chain
aliases; the standard hygiene step resolves every source to its terminal
target before seen-set insertion (the reference follows redirects
implicitly inside Selenium page loads — `/root/reference/
CrawlPaper_TuoiTre.py` never sees the chain; an HTTP-level crawler must
resolve them itself).

``resolve_redirects`` is pointer DOUBLING over the redirect mapping —
the dedup_clusters/pointer-jump discipline applied to a path-compression
problem: after i rounds every chain of length ≤ 2^i is fully collapsed,
so ``ceil(log2(max_hops))`` self-joins resolve any bounded chain (4
rounds cover length-16 chains). Each round is ONE self-join of the
current mapping keyed on the jump target — shuffles carry (src, cur,
hops) triples only, nothing is collected, and rounds sever lineage with
eager localCheckpoint exactly like the dedup loop.

This is the repo's first ITERATIVE operator under the value-exact oracle
regime: hop counts and terminal URLs are exact integers/strings, so the
DuckDB twin (a WITH RECURSIVE walk bounded by the same max_hops) must
match bit-for-bit — no rows-only concession.

Cycles (a → b → a, possible in real redirect data) cannot collapse: after
the fixed rounds their ``cur`` still points at a redirecting source and
they are reported with ``resolved = false`` (hops = the doubling bound
walked so far); the oracle's recursive walk stops at the same bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_HOPS = 16  # chains longer than this are reported unresolved


def resolve_redirects(redirects: DataFrame, max_hops: int = MAX_HOPS) -> DataFrame:
    """Resolve every redirecting URL to its terminal target.

    Input: ``(src, dst)`` — one row per redirect edge (src redirects to
    dst); a URL redirects to at most one target (HTTP semantics — callers
    dedup beforehand if a log carries rewrites). Output: ``(url,
    final_url, n_hops, resolved)`` for every src — final_url is the first
    non-redirecting URL reached within ``max_hops``, n_hops the exact
    chain length walked; resolved=false marks cycle/over-bound chains
    (final_url then holds the last hop reached).
    """
    import math

    # Doubling walks exactly 2^rounds hops, so a non-power-of-two bound
    # would silently resolve chains longer than max_hops (up to the next
    # power of two) — contradicting the "longer than this is unresolved"
    # contract. Require a power of two so walked == max_hops exactly.
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    rounds = max(1, math.ceil(math.log2(max_hops)))
    # state: src -> (cur, hops); seed = the edges themselves (hops=1)
    state = redirects.select(
        F.col("src"), F.col("dst").alias("cur"), F.lit(1).cast("bigint").alias("hops")
    )
    # the jump table doubles alongside the state: jump[src] = (cur, hops)
    jump = state
    for _ in range(rounds):
        j = jump.select(
            F.col("src").alias("j_src"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        state = (
            state.join(j, state.cur == j.j_src, "left")
            .select(
                "src",
                F.coalesce(F.col("j_cur"), F.col("cur")).alias("cur"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("j_hops"), F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        jump = state
    # a src whose cur still redirects did not terminate within the bound
    srcs = redirects.select(F.col("src").alias("is_src")).distinct()
    return (
        state.join(srcs, state.cur == srcs.is_src, "left")
        .select(
            F.col("src").alias("url"),
            F.col("cur").alias("final_url"),
            F.least(F.col("hops"), F.lit(max_hops).cast("bigint")).alias("n_hops"),
            F.col("is_src").isNull().alias("resolved"),
        )
    )


def resolve_redirects_sql(redirects_cte: str, max_hops: int = MAX_HOPS) -> str:
    """DuckDB twin: bounded recursive walk. The walk stops when the
    current URL no longer redirects OR the hop bound is hit; the doubling
    implementation's hop count is exact along terminating chains, and
    both sides clamp to ``max_hops`` for unresolved ones. ``max_hops``
    must be a power of two (same contract as resolve_redirects)."""
    import math

    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    rounds = max(1, math.ceil(math.log2(max_hops)))
    doubling_bound = 2 ** rounds
    return f"""
        WITH RECURSIVE redirects AS ({redirects_cte}),
        walk(src, cur, hops) AS (
            SELECT src, dst, 1::BIGINT FROM redirects
            UNION ALL
            SELECT w.src, r.dst, w.hops + 1
            FROM walk w JOIN redirects r ON w.cur = r.src
            WHERE w.hops < {doubling_bound}
        ),
        terminal AS (
            SELECT src, cur, hops,
                   row_number() OVER (PARTITION BY src ORDER BY hops DESC)
                       AS rn
            FROM walk
        )
        SELECT t.src AS url,
               t.cur AS final_url,
               least(t.hops, {max_hops})::BIGINT AS n_hops,
               (r.src IS NULL) AS resolved
        FROM terminal t
        LEFT JOIN (SELECT DISTINCT src FROM redirects) r ON t.cur = r.src
        WHERE t.rn = 1
    """
