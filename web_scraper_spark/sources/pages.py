"""Day-partitioned pages store: the Iceberg ``days(warc_ts)`` layout on
plain parquet (SURVEY.md §4 O2/O3; the input-hint table shape).

The input table is (url, warc_ts, html, text, lang). Every time-scoped
crawl read — the 3-hour slot filter (F2), month/week/quarter rollup scans
(S5), the early-exit listing scan (O2) — wants partition pruning on the
capture day, which Iceberg gets from a ``days(warc_ts)`` transform
partition. On plain parquet the transform column must be materialized
(``p_day = to_date(warc_ts)``) and the reader must re-derive the
partition predicate from the timestamp bounds — exactly the rewrite
Iceberg's scan planning performs automatically. ``read_pages_slot`` does
that rewrite, so the scan shows BOTH:

- ``PartitionFilters`` on ``p_day`` (directory-level pruning: days
  outside the slot are never listed, let alone read), and
- ``PushedFilters`` on ``warc_ts`` (row-group min/max skipping inside
  the surviving days),

asserted in tests/test_sources.py. At the 100 TB design point this is
the difference between scanning one day and scanning the corpus.

Reference analogue: the slot filter re-filters every fetched page in
Python per run (CrawlPaperTuoiTre.py:21-27,93-97); the stringly month
scans (`WHERE time LIKE 'YYYY-MM%'`, ConnectAndSave.py:175-182) rescan
the whole table.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def write_pages_partitioned(pages: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the pages table partitioned by capture day (the Iceberg
    ``days(warc_ts)`` analogue). ``repartition`` on the partition column
    keeps one task per day writing (no small-file explosion when many
    tasks each hold a sliver of every day)."""
    (
        pages.withColumn("p_day", F.to_date("warc_ts"))
        .repartition(F.col("p_day"))
        .write.mode(mode)
        .partitionBy("p_day")
        .parquet(path)
    )


def read_pages_slot(
    spark: SparkSession, path: str, slot_start: datetime, slot_end: datetime
) -> DataFrame:
    """Pages whose warc_ts lies in [slot_start, slot_end): the reader
    derives the day-partition predicate from the timestamp bounds (the
    Iceberg transform-pruning rewrite), so the row filter prunes
    directories, not just row groups."""
    lo, hi = F.lit(slot_start), F.lit(slot_end)
    # the upper bound is EXCLUSIVE on warc_ts, so the last day that can
    # contribute is the day of (hi - 1µs) — a midnight bound excludes its
    # own day's directory entirely
    hi_day = F.to_date(hi - F.expr("INTERVAL 1 MICROSECOND"))
    return (
        spark.read.parquet(path)
        .where(
            F.col("p_day").between(F.to_date(lo), hi_day)
            & (F.col("warc_ts") >= lo)
            & (F.col("warc_ts") < hi)
        )
        .drop("p_day")
    )
