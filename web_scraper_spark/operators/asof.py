"""As-of join: for each left row, the latest right row with
right.ts <= left.ts per key — the temporal lookup Spark has no native
operator for.

Scalable composition (no per-key UDF, no range cross-join):

    union the two sides tagged, shuffle ONCE by key, sort within the
    window by (ts, right-first tie-break), carry the right side's payload
    forward with ONE last_value(ignorenulls) over a single struct of all
    payload columns, keep left rows, unpack the struct.

    The struct is what makes the match atomic per right row: carrying each
    payload column independently would mix values from different right
    rows whenever a right row holds NULL in one payload column but not
    another (and would resurrect an older row's value where the true
    match's payload is genuinely NULL).

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
    rtypes = dict(right.dtypes)
    payload_type = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in payload_cols) + ">"
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows (0) sort before ties
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(payload_type).alias("_p"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{n}:{t}" for n, t in left.dtypes) + ">"
        ).alias("_left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_left",
        F.last("_p", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c.{c}").alias(c) for c in payload_cols],
    )
    return out
