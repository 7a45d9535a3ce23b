"""Link-graph enrichment: anchor-text aggregation and the inlink-scored
priority frontier queue.

The reference walks menus/listings and fetches in discovery order
(`/root/reference/CrawlPaper_TuoiTre.py:60-118` — its frontier is a Python
list, its "priority" is insertion order). A web-scale crawler instead
maintains a link graph and orders the frontier by a priority score
(depth + inlink evidence — the BASELINE north-star's "priority frontier
queue"), and a search indexer aggregates the anchor text pointing AT each
page as a ranking/description signal (Brin & Page 1998 §2.2; Nutch's
AnchorIndexer does exactly this aggregation).

Both operators are pure DataFrame programs:

``anchor_summary``
    links(src, dst, anchor) → per-target (url, n_inlinks, n_src_hosts,
    top_anchors). One explode over the anchor tokens, one map-side-
    combined (dst, term) count shuffle, a PARTITIONED top-k window (never
    a global one), and a per-dst stats aggregate joined back on the same
    key — at 100 TB the join is co-partitioned on ``dst`` because both
    sides were just shuffled on it, so no extra exchange.

``frontier_priority``
    frontier(url, depth) ⟕ inlink counts → integer priority
    ``(inlinks·1e6) DIV (depth+1)`` (favor shallow, well-linked pages) and
    a TOTAL-ORDER queue position via the two-phase global rank
    (operators/ranking.py) — the sorted-frontier materialization shape:
    ranks are computed without ever moving the frontier through one task.
    The priority is integer floor-division so the DuckDB oracle is
    value-exact (no float log / reciprocal drift between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_scraper_spark.operators.ranking import with_global_rank
from web_scraper_spark.operators.text import tokens, tokens_sql

TOP_ANCHOR_TERMS = 3
PRIORITY_SCALE = 1_000_000


def _host(url) -> F.Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)


def anchor_summary(links: DataFrame, top_k: int = TOP_ANCHOR_TERMS) -> DataFrame:
    """Aggregate inbound anchor text per target URL.

    Input: ``(src, dst, anchor)`` — one row per hyperlink. Output one row
    per ``url`` (the dst): ``n_inlinks`` (links pointing at it),
    ``n_src_hosts`` (distinct referring hosts — the "independent
    endorsement" count), ``top_anchors`` (the ``top_k`` most frequent
    anchor terms, count-desc then term-asc, space-joined — a string so the
    oracle hash is portable).

    Scale shape: the term count and the per-dst stats are both single
    map-side-combined shuffles keyed on dst; the top-k window is
    partitioned by dst (parallel); nothing is collected.
    """
    terms = links.select(
        "dst", F.explode(tokens(F.col("anchor"))).alias("term")
    )
    tc = terms.groupBy("dst", "term").agg(F.count("*").alias("c"))
    w = Window.partitionBy("dst").orderBy(F.col("c").desc(), F.col("term").asc())
    top = (
        tc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .groupBy("dst")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "term"))),
                    lambda s: s.term,
                ),
                " ",
            ).alias("top_anchors")
        )
    )
    stats = links.groupBy("dst").agg(
        F.count("*").cast("bigint").alias("n_inlinks"),
        F.countDistinct(_host(F.col("src"))).cast("bigint").alias("n_src_hosts"),
    )
    # Left join: a target whose inbound anchors all tokenize to zero terms
    # (empty/punctuation-only anchor text) still has inlinks worth reporting.
    return stats.join(top, "dst", "left").select(
        F.col("dst").alias("url"),
        "n_inlinks",
        "n_src_hosts",
        F.coalesce(F.col("top_anchors"), F.lit("")).alias("top_anchors"),
    )


def anchor_summary_sql(links_cte: str, top_k: int = TOP_ANCHOR_TERMS) -> str:
    """DuckDB twin over a CTE producing ``(src, dst, anchor)``."""
    tok = tokens_sql("anchor")
    return f"""
        WITH links AS ({links_cte}),
        terms AS (SELECT dst, unnest({tok}) AS term FROM links),
        tc AS (SELECT dst, term, count(*) AS c FROM terms GROUP BY 1, 2),
        ranked AS (
            SELECT dst, term,
                   row_number() OVER (PARTITION BY dst
                                      ORDER BY c DESC, term) AS rn
            FROM tc
        ),
        top AS (
            SELECT dst, string_agg(term, ' ' ORDER BY rn) AS top_anchors
            FROM ranked WHERE rn <= {top_k} GROUP BY 1
        ),
        stats AS (
            SELECT dst,
                   count(*)::BIGINT AS n_inlinks,
                   count(DISTINCT regexp_extract(src, '^[a-z]+://([^/]+)', 1)
                        )::BIGINT AS n_src_hosts
            FROM links GROUP BY 1
        )
        SELECT stats.dst AS url, n_inlinks, n_src_hosts,
               coalesce(top_anchors, '') AS top_anchors
        FROM stats LEFT JOIN top ON stats.dst = top.dst
    """


def frontier_priority(frontier: DataFrame, links: DataFrame) -> DataFrame:
    """Priority-queue the frontier: ``(url, depth, inlinks, priority,
    queue_pos)`` where priority = ``(inlinks·PRIORITY_SCALE) DIV (depth+1)``
    and queue_pos is the 1-based global rank under (priority DESC, url) —
    a total order, materialized via the two-phase rank so no single task
    ever sees the whole frontier (the sorted-Iceberg-partitions shape of
    the north star: range-partitioned by descending priority, ranked
    within partitions, offsets folded in from metadata-sized counts).
    """
    inl = links.groupBy("dst").agg(F.count("*").cast("bigint").alias("inlinks"))
    scored = (
        frontier.join(inl, frontier.url == inl.dst, "left")
        .select(
            "url",
            "depth",
            F.coalesce(F.col("inlinks"), F.lit(0)).cast("bigint").alias("inlinks"),
        )
        .withColumn(
            "priority",
            F.expr(f"(inlinks * {PRIORITY_SCALE}) DIV (depth + 1)").cast("bigint"),
        )
        .withColumn("neg_priority", -F.col("priority"))
    )
    ranked, _handle = with_global_rank(
        scored, [F.col("neg_priority").asc(), F.col("url").asc()], "queue_pos"
    )
    return ranked.select(
        "url", "depth", "inlinks", "priority", F.col("queue_pos").cast("bigint").alias("queue_pos")
    )


def frontier_priority_sql(frontier_cte: str, links_cte: str) -> str:
    """DuckDB twin: (frontier CTE producing (url, depth), links CTE
    producing (src, dst, anchor)). The oracle may use a global window —
    it runs single-node; the Spark side must not (plan-asserted)."""
    return f"""
        WITH frontier AS ({frontier_cte}),
        links AS ({links_cte}),
        inl AS (SELECT dst, count(*)::BIGINT AS inlinks FROM links GROUP BY 1),
        scored AS (
            SELECT f.url, f.depth,
                   COALESCE(i.inlinks, 0)::BIGINT AS inlinks,
                   ((COALESCE(i.inlinks, 0) * {PRIORITY_SCALE})
                    // (f.depth + 1))::BIGINT AS priority
            FROM frontier f LEFT JOIN inl i ON f.url = i.dst
        )
        SELECT url, depth, inlinks, priority,
               row_number() OVER (ORDER BY priority DESC, url)::BIGINT
                   AS queue_pos
        FROM scored
    """
