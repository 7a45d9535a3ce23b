"""Exact-phrase search (operators/phrase.py): hand-computed semantics
(overlaps, repeated terms, cross-sentence boundaries), DuckDB twin
equality on real documents, and plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.phrase import (
    PHRASE_QUERIES,
    phrase_search,
    phrase_search_sql,
)


def test_phrase_semantics_handcrafted(spark):
    rows = [
        # one match at token position 2 ("customer order")
        (1, "big customer order arrived"),
        # phrase terms present but not adjacent → no match
        (2, "customer placed an order"),
        # reversed order → no match
        (3, "order customer"),
        # repeated-term phrase: "data data data" = 2 overlapping matches
        (4, "data data data"),
        # 3-term phrase spanning mid-text + a second match later
        (5, "a window filter stream b window filter stream"),
        # case folding: uppercase doesn't break it (tokens are whitespace
        # units — attached punctuation is a different token by design,
        # matching the twin's tokenizer exactly)
        (6, "Customer ORDER"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["query"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs).collect()
    }
    assert got[("customer_order", 1)] == (1, 2)
    assert ("customer_order", 2) not in got
    assert ("customer_order", 3) not in got
    assert got[("data_data", 4)] == (2, 1)
    assert got[("window_filter_stream", 5)] == (2, 2)
    assert got[("customer_order", 6)] == (1, 1)


def test_phrase_duckdb_twin_equality(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in phrase_search(docs).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(phrase_search_sql()).fetchall())
    assert got == want
    assert len(got) > 0


def test_phrase_plan_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = phrase_search(docs)._jdf.queryExecution().executedPlan().toString()
    # query metadata rides a broadcast, never a shuffled or cartesian join
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the vocabulary filter reaches the posting stream (scan-stage prune,
    # compiled to an INSET directly above the token Generate): only
    # phrase-vocab terms survive into the anchor aggregation
    assert "INSET" in plan
    # no Python in the plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
