"""Co-citation link similarity (frontier/cocitation.py).

Value-exactness vs DuckDB on the registered synthetic link graph is
covered by the oracle replica (`co_citation_pairs`); these tests pin the
measure's semantics, the deterministic fanout cap, and the twin on a
planted graph.
"""

import duckdb
import pandas as pd

from web_scraper_spark.frontier import cocitation as cc


def _links(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_counts_common_sources(spark):
    rows = [
        ("s1", "a"), ("s1", "b"),
        ("s2", "a"), ("s2", "b"),
        ("s3", "a"), ("s3", "c"),
        ("s1", "a"),  # duplicate edge must not double-count
    ]
    out = {(r["url_a"], r["url_b"]): r["n_common_srcs"]
           for r in cc.co_citation(_links(spark, rows), min_common=1).collect()}
    assert out[("a", "b")] == 2
    assert out[("a", "c")] == 1
    assert ("b", "c") not in out  # no source links both


def test_min_common_threshold(spark):
    rows = [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "c")]
    out = cc.co_citation(_links(spark, rows), min_common=2).collect()
    assert out == []  # every pair shares only one source


def test_fanout_cap_is_deterministic(spark):
    # source s links 5 targets; cap 3 keeps the 3 smallest dsts in BOTH
    # engines, so pairs form only among {a, b, c}
    rows = [("s", d) for d in ["e", "c", "a", "d", "b"]] + [
        ("t", "a"), ("t", "b"), ("t", "c"),
    ]
    out = {(r["url_a"], r["url_b"]): r["n_common_srcs"]
           for r in cc.co_citation(_links(spark, rows), fanout_cap=3,
                                   min_common=1).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(v == 2 for v in out.values())


def test_duckdb_twin_on_planted(spark):
    rows = [(f"s{i % 7}", f"d{(i * 3) % 11}") for i in range(60)]
    df = cc.co_citation(_links(spark, rows), fanout_cap=4, min_common=1)
    sdata = sorted(map(tuple, df.collect()))
    con = duckdb.connect()
    con.register("planted", pd.DataFrame(rows, columns=["src", "dst"]))
    odata = sorted(map(tuple, con.execute(
        cc.co_citation_sql("SELECT src, dst FROM planted",
                           fanout_cap=4, min_common=1)).fetchall()))
    assert sdata == odata


def test_coupling_is_transpose(spark):
    rows = [
        ("s1", "a"), ("s1", "b"),
        ("s2", "a"), ("s2", "b"),
        ("s3", "b"),
    ]
    out = {(r["url_a"], r["url_b"]): r["n_common_dsts"]
           for r in cc.bib_coupling(_links(spark, rows), min_common=1).collect()}
    # s1 and s2 share {a, b}; s3 shares only b with each
    assert out[("s1", "s2")] == 2
    assert out[("s1", "s3")] == 1 and out[("s2", "s3")] == 1


def test_coupling_duckdb_twin(spark):
    rows = [(f"s{i % 5}", f"d{(i * 7) % 9}") for i in range(40)]
    df = cc.bib_coupling(_links(spark, rows), fanout_cap=3, min_common=1)
    sdata = sorted(map(tuple, df.collect()))
    con = duckdb.connect()
    con.register("planted", pd.DataFrame(rows, columns=["src", "dst"]))
    odata = sorted(map(tuple, con.execute(
        cc.bib_coupling_sql("SELECT src, dst FROM planted",
                            fanout_cap=3, min_common=1)).fetchall()))
    assert sdata == odata


def test_plan_shape(spark):
    df = cc.co_citation(_links(spark, [("s", "a"), ("s", "b")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
