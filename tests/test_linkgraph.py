"""Link-graph tier: anchor-text aggregation + priority frontier queue.

Hand-computed semantics on a tiny literal graph, plus the plan-shape
guarantees: the anchor top-k window is PARTITIONED (never a global
single-task sort) and frontier_priority ranks via the two-phase global
rank (no SinglePartition exchange anywhere in its plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.frontier import linkgraph as lg


def _links(spark):
    rows = [
        # three links at P, from two hosts; anchor term counts:
        # best=3, page=2, rare=1 -> top3 "best page rare"
        ("https://a.example/1", "https://t.example/P", "best page"),
        ("https://a.example/2", "https://t.example/P", "best page rare"),
        ("https://b.example/1", "https://t.example/P", "best"),
        # one link at Q
        ("https://b.example/2", "https://t.example/Q", "only"),
    ]
    return spark.createDataFrame(rows, "src string, dst string, anchor string")


def test_anchor_summary_hand_case(spark):
    out = {
        r["url"]: r
        for r in lg.anchor_summary(_links(spark)).collect()
    }
    p = out["https://t.example/P"]
    assert p["n_inlinks"] == 3
    assert p["n_src_hosts"] == 2
    assert p["top_anchors"] == "best page rare"
    q = out["https://t.example/Q"]
    assert (q["n_inlinks"], q["n_src_hosts"], q["top_anchors"]) == (1, 1, "only")


def test_anchor_top_k_tie_break_is_term_order(spark):
    # equal counts -> lexicographic term order decides both membership
    # and the rendered order
    rows = [("s", "d", "b a c"), ("s", "d", "b a c")]
    links = spark.createDataFrame(rows, "src string, dst string, anchor string")
    out = lg.anchor_summary(links, top_k=2).collect()[0]
    assert out["top_anchors"] == "a b"


def test_frontier_priority_hand_case(spark):
    links = _links(spark)
    frontier = spark.createDataFrame(
        [
            ("https://t.example/P", 3),  # 3 inlinks, depth 3 -> 750000
            ("https://t.example/Q", 0),  # 1 inlink, depth 0 -> 1000000
            ("https://t.example/R", 1),  # 0 inlinks -> 0
        ],
        "url string, depth bigint",
    )
    out = {r["url"]: r for r in lg.frontier_priority(frontier, links).collect()}
    assert out["https://t.example/Q"]["priority"] == 1_000_000
    assert out["https://t.example/P"]["priority"] == 750_000
    assert out["https://t.example/R"]["priority"] == 0
    # queue order: priority desc, url asc
    assert out["https://t.example/Q"]["queue_pos"] == 1
    assert out["https://t.example/P"]["queue_pos"] == 2
    assert out["https://t.example/R"]["queue_pos"] == 3
    # unlinked frontier rows survive the left join with inlinks=0
    assert out["https://t.example/R"]["inlinks"] == 0


def test_frontier_priority_plan_has_no_single_partition(spark, sf_dir):
    from web_scraper_spark.queries import q_frontier_priority

    df = q_frontier_priority(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_anchor_summary_window_is_partitioned(spark, sf_dir):
    from web_scraper_spark.queries import q_anchor_text

    df = q_anchor_text(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
