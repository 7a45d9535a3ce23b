"""End-to-end workflow test: crawl → articles → topics → entities →
relations → knowledge graph, the reference's full cron chain in one call."""

from __future__ import annotations

import os
import tempfile


def test_full_pipeline_end_to_end(spark, site_cfg):
    from web_scraper_spark.pipeline.orchestrate import run_full_pipeline

    out_dir = tempfile.mkdtemp(prefix="pipeline_out_")
    metrics = run_full_pipeline(
        spark, tempfile.mkdtemp(prefix="pipeline_state_"), out_dir, site_cfg
    )
    assert metrics["articles"] > 0
    assert metrics["topics"] > 0
    assert metrics["nodes"] > metrics["articles"]  # + sources/categories/entities
    assert metrics["edges"] >= 2 * metrics["articles"]  # PUBLISHED_BY + HAS_CATEGORY

    for name in ["articles", "doc_topics", "topic_keywords", "entities"]:
        assert os.path.exists(os.path.join(out_dir, name))

    # every article got exactly one topic
    arts = spark.read.parquet(os.path.join(out_dir, "articles"))
    topics = spark.read.parquet(os.path.join(out_dir, "doc_topics"))
    assert topics.count() == arts.count()
    assert topics.select("doc_id").distinct().count() == arts.count()

    # graph referential integrity: every edge endpoint is a node
    nodes = spark.read.parquet(os.path.join(out_dir, "graph/nodes"))
    edges = spark.read.parquet(os.path.join(out_dir, "graph/edges"))
    node_ids = {r["node_id"] for r in nodes.select("node_id").collect()}
    endpoints = {r["src"] for r in edges.select("src").collect()} | {
        r["dst"] for r in edges.select("dst").collect()
    }
    assert endpoints <= node_ids
