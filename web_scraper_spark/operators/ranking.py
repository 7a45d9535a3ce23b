"""Distributed total-order ranking (the zipWithIndex shape, DataFrame-only).

``Window.orderBy(...)`` with no partitionBy moves EVERY row through one
task (Spark warns: "No Partition Defined for Window operation") — the
classic scale-killer behind deterministic id assignment (SURVEY.md X15)
and canonical crawl order (T4). This module replaces it with the standard
two-phase construction:

    1. range-repartition on the order key (contiguous key ranges per
       partition) and pin the layout with a persist — the partition id
       column is materialized once, so the counting job and the ranking
       job see identical partitioning regardless of AQE decisions;
    2. per-partition row_number (a PARTITIONED window — parallel);
    3. global offset = cumulative count of preceding partitions, a
       metadata-sized aggregate (one int per partition) folded in via a
       broadcast literal map.

Semantics are identical to the global window iff the order key is a TOTAL
order (callers pass a unique tie-breaker as the last key — url_canon for
the crawl, doc_id for id assignment); ranks are then deterministic on any
cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    out_col: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Attach ``out_col`` = 1-based global rank of each row under
    ``order_cols`` (must be a total order). Returns (result, handle); the
    handle's storage is RDD-scoped (localCheckpoint) so it is freed by the
    ContextCleaner when the result frame is dropped — callers may still
    unpersist it eagerly after their terminal action, but discarding it
    (as assign_ids does) no longer leaks a session-lifetime cache entry."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # localCheckpoint, not persist(): pins the materialized layout (the
    # partition-id column must not be recomputed under a different AQE
    # plan) AND scopes the storage to the returned frames' lifetime.
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # one row per partition — metadata-scale, like AQE's own shuffle stats
    counts = ranged.groupBy("_gr_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_gr_pid"]):
        offsets[r["_gr_pid"]] = acc
        acc += r["count"]
    if offsets:
        off_map = F.create_map(
            *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
        )
        offset_expr = F.coalesce(off_map[F.col("_gr_pid")], F.lit(0))
    else:
        offset_expr = F.lit(0)
    w = Window.partitionBy("_gr_pid").orderBy(*order_cols)
    out = (
        ranged.withColumn("_gr_local", F.row_number().over(w))
        .withColumn(out_col, (F.col("_gr_local") + offset_expr).cast("long"))
        .drop("_gr_pid", "_gr_local")
    )
    return out, ranged


def with_global_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Attach ``out_col`` = EXCLUSIVE global prefix sum of ``val_col``
    (an integer column) under the total order ``order_cols`` — the
    cumulative-sum analog of :func:`with_global_rank`, same two-phase
    construction: range-repartition pinned with an eager localCheckpoint,
    a partitioned exclusive window sum, and per-partition value totals
    (one bigint per partition — metadata-scale) folded in as broadcast
    literal offsets. Never a single-partition window. Returns
    (result, handle) with the same storage contract as with_global_rank.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_gc_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = ranged.groupBy("_gc_pid").agg(
        F.sum(F.col(val_col).cast("bigint")).alias("_gc_sum")
    ).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(sums, key=lambda r: r["_gc_pid"]):
        offsets[r["_gc_pid"]] = acc
        acc += int(r["_gc_sum"] or 0)
    if offsets:
        off_map = F.create_map(
            *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
        )
        offset_expr = F.coalesce(off_map[F.col("_gc_pid")], F.lit(0))
    else:
        offset_expr = F.lit(0)
    w = (
        Window.partitionBy("_gc_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(
        F.sum(F.col(val_col).cast("bigint")).over(w), F.lit(0)
    )
    out = ranged.withColumn(
        out_col, (local + offset_expr).cast("long")
    ).drop("_gc_pid")
    return out, ranged
