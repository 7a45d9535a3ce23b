"""Search tier semantics + plan shape (value-exactness vs DuckDB is in
tests/test_oracle_replica.py / tests/oracle_check.py)."""

import math

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators import search as se


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_keyword_search_is_conjunctive(spark):
    rows = [
        (1, "spark join spark join extra words"),   # both terms
        (2, "spark only here no second term"),      # missing 'join'
        (3, "join but nothing else relevant"),      # missing 'spark'
        (4, "spark and join and merge and sort"),   # two queries match
    ]
    out = se.keyword_search(_docs(spark, rows))
    got = {(r["query"], r["doc_id"]): r["total_tf"] for r in out.collect()}
    assert got[("spark_join", 1)] == 4  # tf(spark)=2 + tf(join)=2
    assert ("spark_join", 2) not in got and ("spark_join", 3) not in got
    assert got[("spark_join", 4)] == 2
    assert got[("merge_sort", 4)] == 2
    assert ("merge_sort", 1) not in got


def test_bm25_ranks_higher_tf_first_and_matches_reference(spark):
    # same doc length → the doc with more 'spark'+'join' mass ranks first
    rows = [
        (1, "spark join spark join spark join pad pad"),
        (2, "spark join pad pad pad pad pad pad"),
        (3, "pad pad pad pad pad pad pad pad"),
    ]
    out = se.bm25_topk(_docs(spark, rows), k=10)
    ranked = {
        r["rank"]: (r["doc_id"], r["score"])
        for r in out.filter(F.col("query") == "spark_join").collect()
    }
    assert [ranked[i][0] for i in sorted(ranked)] == [1, 2]  # doc 3: no terms
    assert ranked[1][1] > ranked[2][1]

    # exact score vs an independent python BM25 (same formula, N=3, avgdl=8)
    def bm25(tf, df, dl, n_docs=3, avgdl=8.0, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * dl) / avgdl))

    want_doc2 = round(
        round(bm25(1, 2, 8), 6) + round(bm25(1, 2, 8), 6), 6
    )  # per-term decimal(18,6) casts, then exact decimal sum
    assert ranked[2][1] == pytest.approx(want_doc2, abs=2e-6)


def test_bm25_plan_shape(spark):
    rows = [(i, "spark join merge sort window filter stream") for i in range(40)]
    plan = se.bm25_topk(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    # the rank window partitions by query (WindowGroupLimit pushes the
    # top-k below the shuffle); the only SinglePartition exchange allowed
    # is the 1-row corpus-stats scalar aggregate, which Spark marks with
    # IdentityBroadcastMode right above it — windows must never be global
    assert "WindowGroupLimit [query" in plan
    assert "windowspecdefinition(query" in plan
    for line in plan.splitlines():
        if "Window [" in line:  # every Window node is key-partitioned:
            # rank by query, document-frequency count by term
            assert "windowspecdefinition(query" in line or (
                "windowspecdefinition(term" in line
            )
    assert "CartesianProduct" not in plan


def test_incremental_bm25_equals_full_and_skips_corpus_tokenization(spark, tmp_path):
    """r3 VERDICT item 5: bm25_topk_incremental(index(corpus), delta) must
    equal bm25_topk(corpus ∪ delta) value-for-value, and the incremental
    plan must contain exactly ONE token explode (the delta's) — the corpus
    enters as a parquet postings scan, never re-tokenized."""
    rows = [
        (i, f"spark join data stream filler{i % 7} merge window sort hash")
        for i in range(60)
    ]
    corpus = _docs(spark, [r for r in rows if r[0] % 10 != 0])
    delta = _docs(spark, [r for r in rows if r[0] % 10 == 0])
    idx = str(tmp_path / "bm25idx")
    se.build_postings_index(corpus, idx)

    inc = se.bm25_topk_incremental(spark, idx, delta, k=10)
    full = se.bm25_topk(_docs(spark, rows), k=10)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))

    plan = inc._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial sections — count the Final plan only
    plan = plan.split("== Initial Plan ==")[0]
    # exactly one Generate (explode): the delta tokenization. Two would
    # mean the corpus text was re-tokenized.
    n_generate = sum(1 for ln in plan.splitlines() if "Generate explode" in ln)
    assert n_generate == 1, plan
    # the corpus side is a columnar parquet scan of the postings index
    # (paths are truncated in plan strings — match the scan schema)
    assert any(
        "FileScan parquet" in ln
        and "struct<doc_id:bigint,dl:int,term:string,tf:bigint>" in ln
        for ln in plan.splitlines()
    ), plan


def test_delta_postings_disjoint_merge(spark, tmp_path):
    """delta_postings keeps one row per (doc, term) when doc_ids are
    disjoint, and document frequencies reflect the merged corpus."""
    corpus = _docs(spark, [(1, "spark join"), (2, "spark sort")])
    delta = _docs(spark, [(3, "spark join join")])
    idx = str(tmp_path / "idx")
    se.build_postings_index(corpus, idx)
    from web_scraper_spark.operators.search import POSTINGS_SCHEMA

    merged = se.delta_postings(
        spark.read.schema(POSTINGS_SCHEMA).parquet(f"{idx}/postings"), delta
    )
    got = {(r["doc_id"], r["term"]): r["tf"] for r in merged.collect()}
    assert got[(3, "join")] == 2 and got[(1, "spark")] == 1
    assert len(got) == len({k for k in got})  # unique (doc, term)
    # df('spark') over merged == 3
    dfc = merged.groupBy("term").count().where("term = 'spark'").first()["count"]
    assert dfc == 3


def test_bm25_incremental_query_registered(spark):
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert "bm25_topk_incremental" in qs and "bm25_topk_incremental" in os_
    out = qs["bm25_topk_incremental"](spark, "/root/testdata/sf0.001")
    full = qs["bm25_topk"](spark, "/root/testdata/sf0.001")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))
