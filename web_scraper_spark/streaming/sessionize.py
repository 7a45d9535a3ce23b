"""Sessionization: batch (window functions) + streaming-stateful
(applyInPandasWithState) implementations of the same operator.

A session = a user's maximal event run with gaps < GAP_MINUTES. The batch
form is pure SQL (lag + conditional cumsum — both engines express it, so
it is oracle-checked). The streaming form keeps per-user open-session
state across micro-batches via applyInPandasWithState — the custom
stateful-operator pattern (SURVEY.md §2.9) the crawl engine's seen-table
externalizes; tests assert stream == batch on the same input.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GAP_MINUTES = 30


def sessionize_batch(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end) via
    lag + cumulative sum of boundary flags — one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    # unix_timestamp, not cast: TIMESTAMP_NTZ→BIGINT casts are rejected in
    # Spark 4's ANSI mode; unix seconds also match DuckDB's epoch()
    secs = F.unix_timestamp(F.col("ts"))
    boundary = F.when(secs - F.lag(secs).over(w) > gap_s, 1).otherwise(0)
    with_sess = events.withColumn(
        "session_id", F.sum(boundary).over(w).cast("int")
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def sessionize_batch_sql(table: str = "events", gap_minutes: int = GAP_MINUTES) -> str:
    gap_s = gap_minutes * 60
    return f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) > {gap_s}
                        THEN 1 ELSE 0 END AS boundary
            FROM {table}
        ),
        sess AS (
            SELECT user_id, ts,
                   (sum(boundary) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING))::INT AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY 1, 2
    """


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_id int, n_events bigint, "
    "session_start timestamp_ntz, session_end timestamp_ntz"
)
# timestamps ride through state as INTEGER microseconds (never float
# seconds): the emitted session bounds must be microsecond-identical to
# the batch tier for the shared value-exact oracle, and integer micros
# also make the gap comparison exact at the boundary.
SESSION_STATE_SCHEMA = "next_id int, last_ts bigint, open_count bigint, open_start bigint"


_session_stream_dirs: dict[str, str] = {}


def _sessionize_stream_dir(spark: SparkSession, sf_dir: str, gap_s: float) -> str:
    """A dedicated stream directory for sessionization: the events parquet
    plus a per-user SENTINEL file (one event per user at
    global_max_ts + 2*gap) that forces every real session to close before
    the stream ends. Separate from windows.events_stream_dir so the
    sentinel rows never contaminate the slot-window/dedup stream queries."""
    import os
    import tempfile
    from datetime import timedelta

    # memo key includes gap_s: the sentinel's flush_ts depends on the gap,
    # so a dir built for one gap would silently fail to close sessions
    # under a larger one (ADVICE r2)
    memo_key = (sf_dir, gap_s)
    if memo_key in _session_stream_dirs:
        return _session_stream_dirs[memo_key]
    d = tempfile.mkdtemp(prefix="events_sess_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet")
    )
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    flush_ts = max_ts + timedelta(seconds=2 * gap_s + 60)
    sentinel = ev.select("user_id").distinct().select(
        F.lit(-1).cast("bigint").alias("event_id"),
        F.lit(flush_ts).alias("ts"),
        "user_id",
        F.lit("__flush__").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    # the file stream source lists top-level files only → surface the
    # sentinel as a sibling .parquet file, not a subdirectory
    import shutil

    tmp = os.path.join(d, "_sentinel_tmp")
    sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(d, "sentinel.parquet"))
    shutil.rmtree(tmp)
    _session_stream_dirs[memo_key] = d
    return d


def sessionize_stream(spark: SparkSession, sf_dir: str, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Streaming-stateful sessionize over the events file stream.

    State per user: (next session id, last event ts, open-session count &
    start). Emits CLOSED sessions as they close. Completeness: a sentinel
    flush event per user (ts > any real event + gap) rides at the end of
    the stream, so every REAL session closes and is emitted — the output
    equals sessionize_batch exactly. The sentinel's own one-event run is
    the only open session left in state and is (correctly) never emitted.
    On an unbounded deployment the same effect comes from a state timeout
    (GroupStateTimeout.EventTimeTimeout) instead of a sentinel.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from web_scraper_spark.streaming.windows import (
        EVENTS_SCHEMA,
        _run_to_memory,
    )

    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fn(key: Any, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            next_id, last_ts, open_count, open_start = state.get
        else:
            next_id, last_ts, open_count, open_start = 0, None, 0, None
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                t = int(ts.value) // 1000  # exact integer microseconds
                if last_ts is None:
                    open_count, open_start = 1, t
                elif t - last_ts > gap_us:
                    closed.append((user_id, next_id, open_count, open_start, last_ts))
                    next_id += 1
                    open_count, open_start = 1, t
                else:
                    open_count += 1
                last_ts = t
        state.update((next_id, last_ts, open_count, open_start))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
            )
            for c in ("session_start", "session_end"):
                out[c] = pd.to_datetime(out[c], unit="us")
            yield out

    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(_sessionize_stream_dir(spark, sf_dir, float(gap_minutes * 60)))
        .select("user_id", "ts", "event_id")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, "append")
