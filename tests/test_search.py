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
