"""Streaming window/dedup operators (ST1/ST3).

Each runs a real Structured Streaming query over the events parquet as a
file-source stream with Trigger.AvailableNow — the exact incremental-batch
shape the reference's 3-hour cron approximates (actions.yml cron lines
4-12) — and returns the materialized result. On a live deployment the
same code points at an arriving-files directory or Kafka source; nothing
in the plan changes.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

_stream_dirs: dict[str, str] = {}


def events_stream_dir(sf_dir: str) -> str:
    """The parquet file-source requires a DIRECTORY (arriving-files
    semantics); expose the single events.parquet through a symlinked temp
    dir. On a live deployment this is simply the landing directory."""
    if sf_dir not in _stream_dirs:
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet"))
        _stream_dirs[sf_dir] = d
    return _stream_dirs[sf_dir]


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming frame to completion (AvailableNow) into a
    memory sink; return the result table."""
    name = f"stream_{uuid.uuid4().hex[:10]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_stream_dir(sf_dir))


def stream_slot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling 3-hour event windows with a 1-hour watermark.

    Complete output mode over AvailableNow equals the batch aggregation
    (analytics.slot_window_events) — which is exactly the oracle the
    driver checks it against."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "3 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal-exact sum (same contract as analytics.dec_sum): the
            # streaming agg must hash-match its batch/DuckDB oracle exactly
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("slot_start"), "event_type", "n_events", "sum_value"
        )
    )
    return _run_to_memory(agg, "complete")


def stream_dedup_counts(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """ST3: stateful cross-batch dedup on the event key, then per-type
    counts. The dedup state is BOUNDED by an event-time watermark
    (dropDuplicatesWithinWatermark): keys older than the watermark are
    evicted from the state store, so state size tracks the watermark
    horizon, not the stream's lifetime — plain dropDuplicates would grow
    state forever, the unbounded-state scale-killer on a 100 TB stream.
    Duplicates arriving later than the watermark horizon are the accepted
    trade (same contract as the crawl's slot-window skip)."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", watermark)
    dedup = ev.dropDuplicatesWithinWatermark(["event_id"])
    agg = dedup.groupBy("event_type").agg(F.count("*").alias("n_unique"))
    return _run_to_memory(agg, "complete")
