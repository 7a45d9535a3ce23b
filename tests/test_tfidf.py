"""TF-IDF keyword extraction (operators/tfidf.py).

Value-exactness vs DuckDB is covered by the oracle replica
(`tfidf_keywords` is a registered oracled query); these tests pin the
SEMANTICS on planted corpora plus determinism/partition invariance.
"""

import math

from web_scraper_spark.operators import tfidf


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.repartition(parts) if parts else df


def _planted(n=12):
    """"the" appears in every doc (idf 0); each doc also carries one
    unique marker term and a shared-by-half term."""
    rows = []
    for i in range(n):
        half = "alpha" if i % 2 == 0 else "beta"
        rows.append((i, f"the quick {half} report the marker{i} file the end"))
    return rows


def test_unique_marker_beats_ubiquitous_term(spark):
    out = tfidf.tfidf_keywords(_docs(spark, _planted())).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        top = min(rows, key=lambda r: r["rnk"])
        assert top["term"] == f"marker{d}"
        # "the" occurs in every doc: idf = ln(1) = 0, never a keyword
        # unless fewer than top_k positive terms exist
        the = [r for r in rows if r["term"] == "the"]
        assert all(r["tfidf"] == 0.0 for r in the)


def test_tfidf_value_matches_formula(spark):
    rows = _planted(8)
    out = tfidf.tfidf_keywords(_docs(spark, rows)).collect()
    n_docs = len(rows)
    r = next(x for x in out if x["term"] == "marker3")
    expect = round(r["tf"] * round(math.log(n_docs / r["df"]), 6), 6)
    assert r["tf"] == 1 and r["df"] == 1
    assert abs(r["tfidf"] - expect) < 1e-9


def test_top_k_per_doc(spark):
    out = tfidf.tfidf_keywords(_docs(spark, _planted()), top_k=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per_doc.values())


def test_deterministic_and_partition_invariant(spark):
    rows = _planted(10)
    a = sorted(map(tuple, tfidf.tfidf_keywords(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, tfidf.tfidf_keywords(_docs(spark, rows, 5)).collect()))
    assert a == b


def test_plan_is_python_free_and_never_single_partition(spark):
    """The scoring must stay in codegen and the per-doc rank window is
    doc_id-PARTITIONED — no SinglePartition exchange anywhere."""
    df = tfidf.tfidf_keywords(_docs(spark, _planted()))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
