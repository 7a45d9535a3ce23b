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


def _pair_set(df):
    return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 6)) for r in df.collect()}


def test_delta_near_dups_equals_union_subset(spark):
    """delta_near_dups(corpus_sk, delta) == minhash_lsh_pairs(corpus ∪ delta)
    restricted to delta-involving pairs — the operator's contract — AND the
    DuckDB oracle (minhash_lsh_pairs_sql + delta-membership filter) agrees
    value-exactly."""
    import duckdb

    from web_scraper_spark.operators import dedup as dd

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)

    corpus_sk = dd.sketch_docs(corpus).localCheckpoint(eager=True)
    got = _pair_set(dd.delta_near_dups(corpus_sk, delta, tau=0.4))

    union_pairs = dd.minhash_lsh_pairs(docs, tau=0.4).where(
        (F.col("doc_a") % 10 == 0) | (F.col("doc_b") % 10 == 0)
    )
    assert got == _pair_set(union_pairs)
    assert got  # non-vacuous: the synthetic corpus has near-dup clones

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = con.execute(
        f"SELECT * FROM ({dd.minhash_lsh_pairs_sql('documents', tau=0.4)}) "
        "WHERE doc_a % 10 = 0 OR doc_b % 10 = 0"
    ).fetchall()
    assert got == {(a, b, round(j, 6)) for a, b, j in oracle}


def test_delta_near_dups_reuses_persisted_sketch(spark, tmp_path):
    """The corpus side enters as a persisted parquet signature table: the
    corpus TEXT contributes zero Python stages (exactly ONE Arrow pass — the
    delta sketch — in the optimized plan), and two different deltas reuse
    the same index without resketching."""
    from web_scraper_spark.operators import dedup as dd

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 > 1)

    skp = str(tmp_path / "corpus_sk")
    dd.sketch_docs(corpus).write.parquet(skp)
    corpus_sk = spark.read.parquet(skp)

    for m in (0, 1):  # two batches against the same persisted table
        delta = docs.where(F.col("doc_id") % 10 == m)
        out = dd.delta_near_dups(corpus_sk, delta, tau=0.4)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # the delta's one Arrow sketch ran EAGERLY at construction
        # (localCheckpoint → LogicalRDD); the remaining lazy plan is pure
        # codegen over the persisted corpus parquet + that RDD — zero
        # Python stages touch the corpus
        assert plan.count("MapInPandas") == 0 and plan.count("LogicalRDD") > 0
        expect = dd.minhash_lsh_pairs(corpus.unionByName(delta), tau=0.4).where(
            (F.col("doc_a") % 10 == m) | (F.col("doc_b") % 10 == m)
        )
        assert _pair_set(out) == _pair_set(expect)


def test_delta_near_dups_cap_counts_both_sides(spark):
    """A bucket pushed over max_bucket only by the DELTA's arrival is
    dropped, exactly as the union run would drop it."""
    from web_scraper_spark.operators import dedup as dd

    text = "mot hai ba bon nam sau bay tam"  # identical docs → one bucket/band
    corpus = spark.createDataFrame(
        [(i, text) for i in range(1, 5)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(100 + i, text) for i in range(4)], "doc_id long, text string"
    )
    sk = dd.sketch_docs(corpus).localCheckpoint(eager=True)
    # 4 corpus + 4 delta = 8 > cap 6 → everything dropped
    assert dd.delta_near_dups(sk, delta, max_bucket=6).count() == 0
    # cap 8 admits the bucket: 4x4 cross + C(4,2) delta pairs, all j=1.0
    got = _pair_set(dd.delta_near_dups(sk, delta, max_bucket=8))
    assert len(got) == 16 + 6 and all(j == 1.0 for _, _, j in got)


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


# ---------------------------------------------------------------------------
# snapshot_diff (doc-level changelog between snapshots)
# ---------------------------------------------------------------------------


def test_snapshot_diff_hand_changelog(spark):
    from web_scraper_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta CHANGED"), (4, "delta"), (5, "epsilon")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    # 1 and 4 unchanged -> absent; 2 modified; 3 removed; 5 added
    assert out == {2: "modified", 3: "removed", 5: "added"}


def test_snapshot_diff_empty_when_identical(spark):
    from web_scraper_spark.operators.incremental import snapshot_diff

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, text string")
    assert snapshot_diff(df, df).count() == 0
