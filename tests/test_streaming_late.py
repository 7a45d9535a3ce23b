"""ST2 late/early-data semantics as a real watermarked stream.

The reference's rule: out-of-window articles are skipped-but-not-sealed —
they stay eligible until their window comes up (SURVEY.md F3/ST2). The
streaming analogue: a watermarked windowed aggregation across TWO
micro-batch runs sharing a checkpoint — late events inside the watermark
still update their window; events older than the watermark are dropped."""

from __future__ import annotations

import os
import tempfile
import uuid
from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def _write_batch(dir_: str, name: str, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # micro-second unit: pandas' default nanos write as INT64 without the
    # logical type Spark's vectorized reader accepts as timestamp
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(dir_, name))


def _run_once(spark, src_dir: str, ckpt: str, out_dir: str):
    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "3 hours").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("slot_start"), "n")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermarked_window_late_data(spark):
    src = tempfile.mkdtemp(prefix="late_src_")
    ckpt = tempfile.mkdtemp(prefix="late_ckpt_")
    out = tempfile.mkdtemp(prefix="late_out_")

    def ev(i, ts):
        return (i, ts, 1, "view", 1.0, "{}")

    # batch 1: events in the 00:00 and 06:00 windows, max ts 07:00 →
    # watermark after batch = 06:00 → the 00:00-03:00 window finalizes
    _write_batch(src, "b1.parquet", [
        ev(1, "2024-01-01 00:30:00"),
        ev(2, "2024-01-01 01:30:00"),
        ev(3, "2024-01-01 06:10:00"),
        ev(4, "2024-01-01 07:00:00"),
    ])
    _run_once(spark, src, ckpt, out)

    # batch 2: one late event for the STILL-OPEN 06:00 window (accepted),
    # one too-late event for the finalized 00:00 window (dropped), and an
    # advancing event that closes the 06:00 window so it gets emitted
    _write_batch(src, "b2.parquet", [
        ev(5, "2024-01-01 06:20:00"),   # late but within watermark
        ev(6, "2024-01-01 00:45:00"),   # older than watermark → dropped
        ev(7, "2024-01-01 12:00:00"),   # advances watermark past 06:00+wm
    ])
    _run_once(spark, src, ckpt, out)

    got = {
        r["slot_start"]: r["n"]
        for r in spark.read.schema("slot_start timestamp, n long").parquet(out).collect()
    }
    assert got[datetime(2024, 1, 1, 0, 0)] == 2   # finalized without event 6
    assert got[datetime(2024, 1, 1, 6, 0)] == 3   # events 3,4 + late 5
