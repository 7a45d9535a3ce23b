"""Bucketed-table writes for exchange-free co-located joins (SURVEY.md §4).

At 100 TB the dominant cost of the big fact-fact joins (lineitem ⋈ orders
on orderkey, frontier ⋈ seen on url_hash bucket) is the shuffle. Spark's
native bucketing removes it: both sides written with ``bucketBy(n, key)``
hash-partition their FILES by the join key at write time, so a later
sort-merge join reads matching buckets directly — the physical plan shows
SortMergeJoin with NO Exchange on either side (asserted in
tests/test_plans.py). This is the parquet-native analogue of the Iceberg
bucket-partitioned frontier/seen layout README.md sizes out.

Works with Spark's built-in (in-memory/derby) catalog — no Hive needed;
``spark.sql.sources.bucketing.enabled`` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.
    Matching ``n_buckets`` + ``bucket_cols`` on both join sides is what
    makes the join exchange-free; sorting within buckets additionally
    removes the per-task Sort."""
    w = df.write.format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key — with both
    sides bucketed identically, Catalyst plans a shuffle-free SMJ."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
