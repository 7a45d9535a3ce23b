"""Sequence packing placement map (operators/packing.py).

Value-exactness vs DuckDB on the real corpus is covered by the oracle
replica (`pack_chunks` is a registered oracled query); these tests pin
the placement semantics against a Python twin, boundary cases, the
two-phase cumsum's partition invariance, and the plan shape.
"""

from web_scraper_spark.operators import packing
from web_scraper_spark.operators.ranking import with_global_cumsum


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.repartition(parts) if parts else df


def _py(rows, budget):
    out = {}
    start = 0
    for doc_id, text in sorted(rows):
        nt = len(text.strip().split()) if text.strip() else 0
        first = start // budget
        last = (start + nt - 1) // budget if nt > 0 else first
        out[doc_id] = (nt, start, first, last, last - first + 1, last > first)
        start += nt
    return out


def test_matches_python_twin(spark):
    rows = [(i, "w " * (3 + 5 * i)) for i in range(12)] + [(99, "")]
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_tok"], r["pack_first"], r["pack_last"],
            r["n_packs_spanned"], r["crosses_boundary"],
        )
        for r in packing.pack_chunks(_docs(spark, rows), budget=16).collect()
    }
    assert got == _py(rows, 16)


def test_boundary_cases(spark):
    # budget 10: doc0 fills pack 0 exactly, doc1 sits inside pack 1,
    # doc2 straddles packs 1-2, empty doc occupies nothing
    rows = [(0, "a " * 10), (1, "b " * 6), (2, "c " * 7), (3, "")]
    out = {r["doc_id"]: r for r in
           packing.pack_chunks(_docs(spark, rows), budget=10).collect()}
    assert out[0]["pack_first"] == 0 and out[0]["pack_last"] == 0
    assert not out[0]["crosses_boundary"]
    assert out[1]["start_tok"] == 10 and out[1]["pack_first"] == 1
    assert out[1]["pack_last"] == 1
    assert out[2]["start_tok"] == 16 and out[2]["pack_first"] == 1
    assert out[2]["pack_last"] == 2 and out[2]["crosses_boundary"]
    assert out[3]["n_tokens"] == 0 and out[3]["n_packs_spanned"] == 1
    assert not out[3]["crosses_boundary"]


def test_stream_is_gapless(spark):
    rows = [(i, "tok " * (1 + i % 9)) for i in range(40)]
    out = sorted(
        packing.pack_chunks(_docs(spark, rows)).collect(),
        key=lambda r: r["doc_id"],
    )
    pos = 0
    for r in out:
        assert r["start_tok"] == pos
        pos += r["n_tokens"]


def test_partition_invariant(spark):
    rows = [(i, "x " * (2 + i % 13)) for i in range(30)]
    a = sorted(map(tuple, packing.pack_chunks(_docs(spark, rows, 1), budget=32).collect()))
    b = sorted(map(tuple, packing.pack_chunks(_docs(spark, rows, 7), budget=32).collect()))
    assert a == b


def test_cumsum_helper_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 5 + 1) for i in range(50)], "k bigint, v bigint"
    )
    for parts in (1, 4, 16):
        out, _ = with_global_cumsum(df, ["k"], "v", "c", num_partitions=parts)
        got = {r["k"]: r["c"] for r in out.collect()}
        acc = 0
        for i in range(50):
            assert got[i] == acc
            acc += (i * 7) % 5 + 1


def test_plan_never_single_partition(spark):
    df = packing.pack_chunks(_docs(spark, [(i, "w " * 20) for i in range(8)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
