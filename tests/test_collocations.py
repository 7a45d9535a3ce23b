"""PMI collocations (operators/collocations.py).

Value-exactness vs DuckDB is covered by the oracle replica
(`pmi_collocations` is a registered oracled query); these tests pin the
SEMANTICS on planted corpora plus determinism/partition invariance.
"""

import math

from web_scraper_spark.operators import collocations


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.repartition(parts) if parts else df


def _planted(n=40):
    """"hong kong" always adjacent (a true collocation) while every other
    word cycles through different neighbors, so no other pair reaches its
    co-occurrence rate."""
    templates = [
        "hong kong report red tea green item",
        "green red hong kong tea item report",
        "tea item red green report hong kong",
    ]
    return [(i, templates[i % 3]) for i in range(n)]


def test_planted_collocation_ranks_first(spark):
    out = collocations.pmi_collocations(_docs(spark, _planted()), min_count=5).collect()
    assert out, "planted corpus must yield collocations"
    by_rank = sorted(out, key=lambda r: r["rnk"])
    assert by_rank[0]["gram"] == "hong kong"
    # PMI of a pair that always co-occurs ~= -ln p(w) + ln(N_uni^2/N_bi*N)
    # > PMI of independent frequent words; just pin the ordering property:
    grams = {r["gram"]: r for r in out}
    assert "hong kong" in grams
    # rank is 1-based, dense over the returned set
    assert by_rank[0]["rnk"] == 1
    assert [r["rnk"] for r in by_rank] == list(range(1, len(by_rank) + 1))


def test_pmi_value_matches_formula(spark):
    rows = _planted(20)
    out = {r["gram"]: r for r in
           collocations.pmi_collocations(_docs(spark, rows), min_count=5).collect()}
    r = out["hong kong"]
    # recompute from the row's own counts and the corpus totals
    toks = [t for _, text in rows for t in text.lower().split()]
    n_uni = len(toks)
    n_bi = sum(max(len(text.split()) - 1, 0) for _, text in rows)
    expect = round(
        math.log(r["c_pair"] / n_bi)
        - math.log(r["c_w1"] / n_uni)
        - math.log(r["c_w2"] / n_uni),
        6,
    )
    assert abs(r["pmi"] - expect) < 1e-9


def test_min_count_filters_rare_pairs(spark):
    rows = _planted(20) + [(900, "unique singleton pairing once only")]
    out = {r["gram"] for r in
           collocations.pmi_collocations(_docs(spark, rows), min_count=5).collect()}
    assert "unique singleton" not in out
    assert all(r not in out for r in ("singleton pairing", "pairing once"))


def test_top_k_truncates_total_order(spark):
    full = collocations.pmi_collocations(_docs(spark, _planted()), min_count=5)
    top3 = collocations.pmi_collocations(
        _docs(spark, _planted()), min_count=5, top_k=3
    )
    f = sorted(map(tuple, full.collect()))
    t = sorted(map(tuple, top3.collect()))
    assert len(t) == 3
    prefix = sorted(
        map(tuple, full.filter(full.rnk <= 3).collect())
    )
    assert t == prefix and len(f) > 3


def test_deterministic_and_partition_invariant(spark):
    rows = _planted(30)
    a = sorted(map(tuple, collocations.pmi_collocations(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, collocations.pmi_collocations(_docs(spark, rows, 7)).collect()))
    assert a == b


def test_plan_is_python_free_and_never_single_partition(spark):
    """The PMI expression must stay in whole-stage codegen (no Arrow/
    batch Python eval) and the top-k rank must ride the two-phase
    global rank, never a SinglePartition window exchange."""
    df = collocations.pmi_collocations(_docs(spark, _planted()), min_count=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
