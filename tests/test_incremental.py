"""Seen-table compaction + O8 incremental-recompute tests."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from web_scraper_spark.operators.incremental import (
    classify_groups,
    group_hashes,
    incremental_refresh,
)


def test_seen_compaction_preserves_reads(spark, site_cfg):
    from web_scraper_spark.frontier.engine import CrawlConfig, CrawlEngine
    from web_scraper_spark.synth import build_pages_df, build_robots_df, seed_urls

    cfg = CrawlConfig(as_of="2025-12-01T22:30:00", round_seconds=30.0, max_rounds=3)
    eng = CrawlEngine(
        spark, build_pages_df(spark, site_cfg).cache(),
        build_robots_df(spark, site_cfg), tempfile.mkdtemp(prefix="compact_"), cfg,
    )
    eng.run(seeds=seed_urls(site_cfg))
    last = eng.state.last_committed_round()
    before = {r["url_canon"] for r in eng.state.read_seen(last).collect()}
    assert before

    k = eng.state.compact_seen(last - 1)  # fold all but the newest delta
    assert k == last - 1
    after = {r["url_canon"] for r in eng.state.read_seen(last).collect()}
    assert after == before  # base + tail ≡ union of deltas

    # resume after compaction continues and dedups correctly
    cfg2 = CrawlConfig(as_of=cfg.as_of, round_seconds=30.0, max_rounds=2)
    eng2 = CrawlEngine(
        spark, build_pages_df(spark, site_cfg), build_robots_df(spark, site_cfg),
        eng.state.dir, cfg2,
    )
    eng2.run(resume=True)
    final = {r["url_canon"] for r in
             eng2.state.read_fetch_log().select("url_canon").collect()}
    assert len(final) == eng2.state.read_fetch_log().count()  # no double fetch


def test_incremental_compaction_links_untouched_buckets(spark):
    """compact_seen is an Iceberg overwritePartitions analogue: a second
    compaction rewrites ONLY the buckets the delta tail touched; every
    untouched bucket's files are hard-linked (same inode) from the prior
    base, so compaction cost tracks churned partitions, not table size."""
    import os

    from web_scraper_spark.frontier.state import CrawlState

    d = tempfile.mkdtemp(prefix="inc_compact_")
    st = CrawlState(spark, d, n_buckets=8)

    def delta(rows):
        return spark.createDataFrame(
            [(h, h % 8, f"u{h}") for h in rows], "url_hash long, bucket int, url_canon string"
        ).withColumn("round", F.lit(0))

    from web_scraper_spark.frontier.state import FETCH_LOG_SCHEMA, FRONTIER_SCHEMA

    fr = spark.createDataFrame([], FRONTIER_SCHEMA)
    log = spark.createDataFrame([], FETCH_LOG_SCHEMA)

    # round 1 seals URLs in all 8 buckets → first (full) compaction
    st.commit_round(1, fr, delta(range(16)), log, {})
    st.compact_seen(1)
    base1 = os.path.join(d, "seen_compact=0001", "data")
    inodes1 = {
        name: {f: os.stat(os.path.join(base1, name, f)).st_ino
               for f in os.listdir(os.path.join(base1, name)) if f.endswith(".parquet")}
        for name in os.listdir(base1) if name.startswith("bucket=")
    }
    assert len(inodes1) == 8

    # round 2 seals URLs in buckets {0, 1} only → incremental compaction
    st.commit_round(2, fr, delta([16, 17, 24]), log, {})  # 16,24→b0, 17→b1
    st.compact_seen(2)
    base2 = os.path.join(d, "seen_compact=0002", "data")
    for name, files in inodes1.items():
        b = int(name.split("=")[1])
        got = {f: os.stat(os.path.join(base2, name, f)).st_ino
               for f in os.listdir(os.path.join(base2, name)) if f.endswith(".parquet")}
        if b in (0, 1):
            # churned partition: rewritten, none of the old inodes carried
            assert not (set(got.values()) & set(files.values()))
        else:
            # untouched partition: pure metadata carry (hard links)
            assert got == files

    # and the read contract is unchanged: base+tail ≡ union of all deltas
    got_urls = {r["url_canon"] for r in st.read_seen(2).collect()}
    assert got_urls == {f"u{h}" for h in list(range(16)) + [16, 17, 24]}


def test_incremental_refresh_only_recomputes_stale(spark):
    data_v1 = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "c"), ("g3", "d")],
        "grp string, payload string",
    )
    cache_v1 = group_hashes(data_v1, "grp", "payload")

    calls = []

    def compute(rows):
        got = sorted(r["grp"] for r in rows.select("grp").distinct().collect())
        calls.append(got)
        return rows.groupBy("grp").agg(F.count("*").alias("n"))

    prev = compute(data_v1)
    assert calls[-1] == ["g1", "g2", "g3"]

    # v2: g1 changed, g2 unchanged, g3 retired, g4 new
    data_v2 = spark.createDataFrame(
        [("g1", "a"), ("g1", "B"), ("g2", "c"), ("g4", "e")],
        "grp string, payload string",
    )
    states = {r["group_key"]: r["state"] for r in
              classify_groups(group_hashes(data_v2, "grp", "payload"), cache_v1).collect()}
    assert states == {"g1": "stale", "g2": "unchanged", "g3": "retired", "g4": "stale"}

    results, cache_v2 = incremental_refresh(
        data_v2, cache_v1, prev, "grp", "payload", compute
    )
    got = {r["grp"]: r["n"] for r in results.collect()}
    assert got == {"g1": 2, "g2": 1, "g4": 1}  # g3 gone
    assert calls[-1] == ["g1", "g4"]  # expensive stage saw only stale groups
    assert cache_v2.count() == 3
