"""As-of join: for each left row, the latest right row with
right.ts <= left.ts per key — the temporal lookup Spark has no native
operator for.

Scalable composition (no per-key UDF, no range cross-join):

    union the two sides tagged, shuffle ONCE by key, sort within the
    window by (ts, right-first tie-break), carry the right side's payload
    forward with last_value(ignorenulls) over rows unbounded preceding,
    keep left rows.

One shuffle on the join key; skew behaves like any keyed window (AQE).
The DuckDB oracle uses the native ASOF JOIN — two independent
formulations agreeing value-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """left columns + payload_cols of the as-of matching right row
    (null when no right row is early enough)."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows (0) sort before ties
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{n}:{t}" for n, t in left.dtypes) + ">"
        ).alias("_left"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_left",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload_cols
        ],
    )
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c_{c}").alias(c) for c in payload_cols],
    )
    return out
