"""CSV article-table source/sink (SURVEY.md S1/S2/S4/S12).

The reference's interchange format is the fixed 7-column article CSV
(Source, URL, Category, Keyword, Time, Title, Content — utf-8-sig,
header once, append mode). The engine keeps the same on-disk contract so
a reference user can point existing CSVs at the engine:

- read: explicit StructType (never inferred — §1.3 'schema enforced
  nowhere' is the reference bug class this kills), PERMISSIVE mode with a
  _corrupt_record column standing in for on_bad_lines='skip'
  (SummaryPaper.py:39) but keeping the bad rows auditable;
- write: header, escaped quotes, one directory per source — the
  'append-per-crawler then union' layout (SummaryPaper.py:36-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

ARTICLE_COLUMNS = ["Source", "URL", "Category", "Keyword", "Time", "Title", "Content"]

ARTICLE_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in ARTICLE_COLUMNS]
    + [StructField("_corrupt_record", StringType(), True)]
)


def read_articles_csv(spark: SparkSession, path: str, keep_corrupt: bool = False) -> DataFrame:
    """S1/S4: permissive scan with explicit schema. Malformed rows land in
    _corrupt_record instead of silently skipping (auditable version of
    on_bad_lines='skip')."""
    reader = (
        spark.read.schema(ARTICLE_SCHEMA)
        .option("header", True)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", True)
        .option("escape", '"')
    )
    if keep_corrupt:
        # Spark refuses predicates that touch only the internal corrupt
        # column on an uncached raw scan — cache materializes it first
        return reader.option("mode", "PERMISSIVE").csv(path).cache()
    return reader.option("mode", "DROPMALFORMED").csv(path).drop("_corrupt_record")


def write_articles_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2/S12: the 7-column contract, header once per file. 'append' mode
    is the reference's `'a' if crawled_urls else 'w'` — on a table store
    this is an append commit, not a file reopen."""
    df.select(*ARTICLE_COLUMNS).write.mode(mode).option("header", True).option(
        "escape", '"'
    ).csv(path)


def seen_urls_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: the seen-set rebuild — column 2 of the sink CSV
    (load_crawled_urls, CrawlPaperTuoiTre.py:56-67) as a projection, not a
    driver-side set."""
    return read_articles_csv(spark, path).select(F.col("URL").alias("url")).where(
        F.col("url").isNotNull()
    ).distinct()


def refresh_delete_insert(existing: DataFrame, fresh: DataFrame, keys: list[str]) -> DataFrame:
    """S7: the reference's DELETE-WHERE-key + INSERT refresh
    (ConnectAndSave.py:236-257) as anti-join ∪ fresh — idempotent: running
    twice with the same `fresh` yields the same table (MERGE semantics
    without an Iceberg runtime)."""
    return existing.join(fresh.select(*keys).distinct(), on=keys, how="left_anti").unionByName(
        fresh
    )
