"""JDBC source/sink (SURVEY.md S5/S6/S7).

The reference reads with ``pandas.read_sql(... WHERE ...)`` (S5,
ConnectAndSave.py) and writes with ``cursor.executemany`` batch INSERTs
(S6, ConnectAndSave.py:90-108) plus delete-then-insert refresh (S7).
Spark-first: ``spark.read.format("jdbc")`` with predicate pushdown (the
WHERE clause executes in the remote engine — ``PushedFilters`` visible in
the scan node) and ``df.write.format("jdbc")`` with ``batchsize`` (each
partition streams batched INSERTs over its own connection — the
distributed executemany).

Verified end-to-end against the embedded Derby engine that ships in
Spark's own jars (derby-*.jar) — an in-JVM SQL database, so the round
trip exercises the real JDBC code path with zero extra dependencies; a
production deployment swaps only the url/driver strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_memory_url(name: str) -> str:
    """In-memory Derby database URL (lives inside the Spark JVM)."""
    return f"jdbc:derby:memory:{name};create=true"


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1000,
    driver: str | None = None,
) -> None:
    """S6 batch insert (mode='append') / S7 delete-then-insert refresh
    (mode='overwrite' drops and rewrites the table atomically from the
    reader's view). ``batchsize`` is the per-connection executemany batch."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 1,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S5 predicate scan: filters applied to the returned frame push down
    into the remote engine's WHERE clause (assert ``PushedFilters`` in the
    scan node). With ``partition_column`` + bounds the scan splits into
    ``num_partitions`` parallel range queries — the distributed read the
    reference's single read_sql cannot do."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return r.load()
