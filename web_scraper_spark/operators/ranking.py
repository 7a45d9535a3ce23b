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
    2. per-partition row_number / window sum (a PARTITIONED window —
       parallel);
    3. global offset = cumulative count (rank) or value total (cumsum)
       of preceding partitions, a metadata-sized aggregate (one number
       per partition) folded in via a broadcast literal map.

Semantics are identical to the global window iff the order key is a TOTAL
order (callers pass a unique tie-breaker as the last key — url_canon for
the crawl, doc_id for id assignment); ranks are then deterministic on any
cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_tp_pid"  # partition-id column of the pinned two-phase layout


def _pinned_ranged(
    df: DataFrame, order_cols: list, num_partitions: int | None
) -> DataFrame:
    """Phase 1: range-repartition on the order key with the partition id
    materialized and the layout pinned. localCheckpoint, not persist():
    pins the layout (the partition-id column must not be recomputed
    under a different AQE plan) AND scopes the storage to the returned
    frames' lifetime (freed by the ContextCleaner when dropped)."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    return (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def _offset_expr(per_pid_rows, val_key: str) -> Column:
    """Phase 3: exclusive prefix over the per-partition aggregate rows
    (one row per partition — metadata-scale, like AQE's own shuffle
    stats), folded back in as a broadcast literal map keyed by _PID."""
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(per_pid_rows, key=lambda r: r[_PID]):
        offsets[r[_PID]] = acc
        acc += int(r[val_key] or 0)
    if not offsets:
        return F.lit(0)
    off_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    return F.coalesce(off_map[F.col(_PID)], F.lit(0))


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
    ranged = _pinned_ranged(df, order_cols, num_partitions)
    offset = _offset_expr(ranged.groupBy(_PID).count().collect(), "count")
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    out = (
        ranged.withColumn("_gr_local", F.row_number().over(w))
        .withColumn(out_col, (F.col("_gr_local") + offset).cast("long"))
        .drop(_PID, "_gr_local")
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
    cumulative-sum analog of :func:`with_global_rank`: same pinned
    layout, a partitioned exclusive window sum, and per-partition value
    TOTALS (instead of row counts) as the broadcast offsets. Never a
    single-partition window. Returns (result, handle) with the same
    storage contract as with_global_rank."""
    ranged = _pinned_ranged(df, order_cols, num_partitions)
    totals = ranged.groupBy(_PID).agg(
        F.sum(F.col(val_col).cast("bigint")).alias("_tp_sum")
    ).collect()
    offset = _offset_expr(totals, "_tp_sum")
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(val_col).cast("bigint")).over(w), F.lit(0))
    out = ranged.withColumn(out_col, (local + offset).cast("long")).drop(_PID)
    return out, ranged
