"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the MinHash+LSH near-dup pipeline (the core
                training-data dedup capability) over sf0.001 documents,
                joined with quality + fingerprint columns.
queries()     — one entry per implemented operator family (SURVEY.md §2 +
                training-data pipeline ops); see web_scraper_spark/queries.py.
oracle_sql()  — DuckDB twins, value-exact (portable hash60 — see
                web_scraper_spark/operators/hashing.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from web_scraper_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: per-document dedup dossier — quality score,
    fingerprints, and any near-dup partner found by MinHash+LSH."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality = _registry.q_quality_scores(spark, sf_dir)
    prints = _registry.q_doc_fingerprints(spark, sf_dir)
    pairs = _registry.q_minhash_lsh_pairs(spark, sf_dir)
    partners = (
        pairs.select(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("near_dup"), "jaccard")
        .unionByName(
            pairs.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("near_dup"), "jaccard")
        )
        .groupBy("doc_id")
        .agg(F.min("near_dup").alias("near_dup_id"), F.max("jaccard").alias("max_jaccard"))
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(quality.select("doc_id", "n_tokens", "quality_score"), "doc_id")
        .join(prints.select("doc_id", "content_hash", "min_shingle"), "doc_id")
        .join(partners, "doc_id", "left")
        .orderBy("doc_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
