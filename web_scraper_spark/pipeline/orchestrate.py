"""Full-workflow orchestration (SURVEY.md §3; the reference's cron order,
actions.yml: crawl ×sources → ConnectAndSave → SummaryPaper →
preprocessing_extract_entity → create_KG → relation_extraction).

One call runs the whole chain over the synthetic site (or any pages
table + seeds) and writes every derived table the reference produces,
re-expressed as parquet datasets:

    out_dir/articles      the preprocessed article table (E2 stage 1)
    out_dir/doc_topics    per-article topic + label      (A8-A10, X17)
    out_dir/topic_keywords top-10 words with pct weights (A10, X18)
    out_dir/entities      per-article entities            (E3 stage 1)
    out_dir/graph/nodes   property-graph nodes            (S8)
    out_dir/graph/edges   typed edges incl. relations     (S9)

Each stage is a lazy DataFrame chain; the only materialization points are
the writes (and the LDA fit). A reference user's cron becomes one
spark-submit of this function per slot.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_full_pipeline(
    spark: SparkSession,
    state_dir: str,
    out_dir: str,
    site_cfg=None,
    crawl_cfg=None,
    lda_k: int = 4,
) -> dict:
    from web_scraper_spark.frontier.engine import CrawlConfig, CrawlEngine
    from web_scraper_spark.operators.topics import fit_topics, topic_labels
    from web_scraper_spark.pipeline.articles import preprocess_articles
    from web_scraper_spark.pipeline.entities import extract_entities
    from web_scraper_spark.pipeline.kg import build_edges, build_nodes, write_graph
    from web_scraper_spark.pipeline.relations import extract_relations
    from web_scraper_spark.synth import build_pages_df, build_robots_df, seed_urls
    from web_scraper_spark.synth.sitegen import SiteConfig

    site = site_cfg or SiteConfig()
    cfg = crawl_cfg or CrawlConfig(
        as_of="2025-12-01T22:30:00", round_seconds=30.0, max_rounds=4
    )
    metrics: dict = {}

    # 1. crawl (E1): the engine's rounds replace the four crawler scripts
    eng = CrawlEngine(
        spark, build_pages_df(spark, site).cache(), build_robots_df(spark, site),
        state_dir, cfg,
    )
    eng.run(seeds=seed_urls(site))
    log = eng.state.read_fetch_log()

    # 2. article preprocess (E2 stage 1, ConnectAndSave preprocess_and_save)
    raw = log.where((F.col("status") == "crawled") & (F.col("depth") == 2)).select(
        "source", "url", F.col("category_name").alias("category"),
        "keyword", "time_str", "title", "content",
    )
    articles = preprocess_articles(raw).withColumn(
        "article_id", F.xxhash64("url")
    )
    articles.write.mode("overwrite").parquet(os.path.join(out_dir, "articles"))
    articles = spark.read.parquet(os.path.join(out_dir, "articles"))
    metrics["articles"] = articles.count()

    # 3. topic model (E2 stage 2: CountVectorizer + LDA + labels)
    lda_in = articles.select(
        F.col("article_id").alias("doc_id"),
        F.col("full_text").alias("text"),
    )
    doc_topics, topic_keywords = fit_topics(lda_in, k=lda_k, max_iter=10)
    labeled = topic_labels(doc_topics, topic_keywords)
    labeled.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_topics"))
    topic_keywords.write.mode("overwrite").parquet(
        os.path.join(out_dir, "topic_keywords")
    )
    metrics["topics"] = topic_keywords.select("topic").distinct().count()

    # 4. entity extraction (E3 stage 1)
    ents = extract_entities(
        articles.select(
            F.col("article_id").alias("doc_id"),
            F.concat_ws(" ", "title", "content").alias("text"),
        ),
        min_freq=2,
    )
    ents.write.mode("overwrite").parquet(os.path.join(out_dir, "entities"))
    ents = spark.read.parquet(os.path.join(out_dir, "entities"))
    metrics["entities"] = ents.count()

    # 5. relations (E3 stage 3) over entity co-occurrence in titles+content
    rel_in = (
        articles.select(
            "article_id", F.concat_ws(" ", "title", "content").alias("sentence")
        )
        .join(ents.select("article_id", "entity"), on="article_id")
    )
    relations = extract_relations(rel_in)
    metrics["relations"] = relations.count()

    # 6. knowledge graph (E3 stage 2 + typed relation edges)
    nodes = build_nodes(articles, ents)
    edges = build_edges(articles, ents, relations)
    write_graph(nodes, edges, os.path.join(out_dir, "graph"))
    metrics["nodes"] = nodes.count()
    metrics["edges"] = edges.count()
    return metrics
