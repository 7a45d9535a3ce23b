"""Winnowing fingerprints (operators/winnow.py).

Value-exactness vs DuckDB is covered by the oracle replica
(`winnow_fingerprints` is a registered oracled query); these tests pin
the SEMANTICS against a from-scratch Python twin, the Schleimer et al.
overlap guarantee, short-doc behavior, and partition invariance.
"""

import functools

from web_scraper_spark.operators import winnow
from web_scraper_spark.operators.hashing import hash60_py


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.repartition(parts) if parts else df


def _py_selected(text, k=winnow.GRAM_K, w=winnow.WINDOW_W):
    """Python twin: selected fingerprint multiset {fp: n_windows}."""
    tok = text.strip().lower().split()
    grams = [" ".join(tok[i : i + k]) for i in range(max(len(tok) - k + 1, 0))]
    hs = [hash60_py(g) for g in grams]
    sel = {}
    for p in range(len(hs)):
        fp = min(hs[p : p + w])  # shrinking suffix windows at the tail
        sel[fp] = sel.get(fp, 0) + 1
    return sel


def _py_summary(text):
    sel = _py_selected(text)
    if not sel:
        return (0, 0, 0, 0, 0)
    return (
        sum(sel.values()),
        len(sel),
        min(sel),
        max(sel),
        functools.reduce(lambda a, b: a ^ b, sel.keys()),
    )


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _sentence(seed, n):
    return " ".join(WORDS[(seed * 7 + i * 3) % len(WORDS)] for i in range(n))


def test_matches_python_twin(spark):
    rows = [(i, _sentence(i, 12 + i)) for i in range(8)]
    out = {r["doc_id"]: r for r in winnow.winnow_fingerprints(_docs(spark, rows)).collect()}
    for doc_id, text in rows:
        r = out[doc_id]
        assert (
            r["n_grams"], r["n_fps"], r["fp_min"], r["fp_max"], r["fp_xor"]
        ) == _py_summary(text)


def test_short_docs(spark):
    rows = [
        (0, "a b c"),        # 3 tokens < k=4: zero grams
        (1, "a b c d"),      # exactly k tokens: 1 gram, 1 fp
        (2, ""),             # empty text
    ]
    out = {r["doc_id"]: r for r in winnow.winnow_fingerprints(_docs(spark, rows)).collect()}
    assert out[0]["n_grams"] == 0 and out[0]["n_fps"] == 0 and out[0]["fp_xor"] == 0
    assert out[1]["n_grams"] == 1 and out[1]["n_fps"] == 1
    assert out[1]["fp_min"] == out[1]["fp_max"] == out[1]["fp_xor"]
    assert out[2]["n_grams"] == 0
    for doc_id, text in rows:
        r = out[doc_id]
        assert (
            r["n_grams"], r["n_fps"], r["fp_min"], r["fp_max"], r["fp_xor"]
        ) == _py_summary(text)


def test_overlap_guarantee(spark):
    """Any shared run of k + w - 1 = 8 tokens yields a common selected
    fingerprint (Schleimer et al. §3) — checked on the python twin, which
    test_matches_python_twin proves equal to the operator."""
    shared = "one two three four five six seven eight"  # 8 tokens
    a = f"{_sentence(1, 10)} {shared} {_sentence(2, 10)}"
    b = f"{_sentence(3, 6)} {shared} {_sentence(4, 14)}"
    common = set(_py_selected(a)) & set(_py_selected(b))
    assert common, "winnowing guarantee violated"


def test_density_bound(spark):
    """Selected distinct fps ≤ windows, and well below gram count for a
    long doc (the ~2/(w+1) density property, loose bound here)."""
    text = _sentence(5, 400)
    sel = _py_selected(text)
    n_grams = sum(sel.values())
    assert n_grams == 400 - winnow.GRAM_K + 1
    assert len(sel) < n_grams / 2


def test_overlap_pairs_detect_shared_passage(spark):
    """Two docs sharing an 8-token passage must pair up (the winnowing
    guarantee carried through the matching step); unrelated docs with
    distinct vocabulary must not."""
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (0, f"{_sentence(1, 10)} {shared} {_sentence(2, 10)}"),
        (1, f"{_sentence(3, 6)} {shared} {_sentence(4, 14)}"),
        (2, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh"),
    ]
    out = {(r["doc_a"], r["doc_b"]): r["n_shared_fps"]
           for r in winnow.winnow_overlap_pairs(
               _docs(spark, rows), min_shared=1).collect()}
    assert (0, 1) in out and out[(0, 1)] >= 1
    assert not any(2 in p for p in out)


def test_overlap_pairs_boilerplate_cap(spark):
    """A fingerprint held by more than max_fp_df docs is dropped before
    pair formation — a boilerplate page replicated everywhere must not
    produce all-pairs output (every one of its fps has df = 6 > cap)."""
    boiler = "standard footer text appears on every page here today"
    rows = [(i, boiler) for i in range(6)]
    out = winnow.winnow_overlap_pairs(
        _docs(spark, rows), max_fp_df=3, min_shared=1).collect()
    assert out == []
    # with the cap above the replica count the same corpus is all-pairs
    out2 = winnow.winnow_overlap_pairs(
        _docs(spark, rows), max_fp_df=6, min_shared=1).collect()
    assert len(out2) == 15


def test_overlap_pairs_duckdb_twin(spark):
    import duckdb
    import pandas as pd

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, f"{_sentence(i, 8)} {shared} {_sentence(i + 3, 8)}")
            for i in range(5)] + [(9, _sentence(9, 25))]
    df = winnow.winnow_overlap_pairs(_docs(spark, rows), min_shared=1)
    sdata = sorted(map(tuple, df.collect()))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    odata = sorted(map(tuple, con.execute(
        winnow.winnow_overlap_pairs_sql(min_shared=1)).fetchall()))
    assert sdata == odata and len(sdata) >= 10  # the 5 sharers all pair


def test_incremental_equals_union_subset(spark):
    """The delta-vs-corpus incremental matcher must equal the full
    union run restricted to delta-involving pairs — including the cap
    interplay (a fingerprint pushed over max_fp_df by the delta drops
    on both paths)."""
    shared = "red orange yellow green blue indigo violet ultra"
    boiler = "common banner words repeated on every single page now"
    corpus_rows = [
        (0, f"{boiler} {_sentence(0, 8)} {shared}"),
        (1, f"{boiler} {_sentence(1, 12)}"),
        (2, f"{boiler} {shared} {_sentence(2, 9)}"),
        (3, _sentence(3, 20)),
    ]
    delta_rows = [
        (10, f"{boiler} {shared} {_sentence(4, 7)}"),
        (11, f"{_sentence(5, 10)} {shared}"),
    ]
    kw = dict(max_fp_df=4, min_shared=1)
    corpus_fps = winnow.build_winnow_index(_docs(spark, corpus_rows))
    inc = sorted(map(tuple, winnow.winnow_overlap_incremental(
        corpus_fps, _docs(spark, delta_rows), **kw).collect()))
    union = winnow.winnow_overlap_pairs(
        _docs(spark, corpus_rows + delta_rows), **kw)
    delta_ids = {10, 11}
    full = sorted(
        t for t in map(tuple, union.collect())
        if t[0] in delta_ids or t[1] in delta_ids
    )
    assert inc == full and len(inc) >= 3  # the sharers pair up


def test_incremental_plan_never_touches_corpus_text(spark):
    """The corpus is never re-fingerprinted: fingerprinting costs one
    Generate (the gram explode), and the incremental matcher's own plan
    has ZERO — the delta's single explode ran inside its eager
    checkpoint job and the corpus enters as the persisted fingerprint
    table."""
    sel_plan = (
        winnow.build_winnow_index(_docs(spark, [(9, _sentence(9, 15))]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert sel_plan.count("Generate") == 1, sel_plan
    corpus_fps = winnow.build_winnow_index(
        _docs(spark, [(i, _sentence(i, 15)) for i in range(4)])
    ).localCheckpoint(eager=True)
    df = winnow.winnow_overlap_incremental(
        corpus_fps, _docs(spark, [(9, _sentence(9, 15))]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 0, plan
    assert "SinglePartition" not in plan


def test_partition_invariant(spark):
    rows = [(i, _sentence(i, 30)) for i in range(10)]
    a = sorted(map(tuple, winnow.winnow_fingerprints(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, winnow.winnow_fingerprints(_docs(spark, rows, 7)).collect()))
    assert a == b


def test_plan_shape(spark):
    """Python-free, no SinglePartition exchange, and the doc_id shuffle is
    REUSED: window + both aggregates ride one Exchange (plus the fan-out
    repartition) — no per-step reshuffle."""
    df = winnow.winnow_fingerprints(_docs(spark, [(i, _sentence(i, 20)) for i in range(6)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
    # exchanges: fan-out RoundRobin + hashpartitioning(doc_id) for the
    # window/agg chain + the final left-join's exchanges; the window→
    # distinct→rollup chain must not introduce one exchange per step
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 3, plan
