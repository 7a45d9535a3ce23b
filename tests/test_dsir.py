"""DSIR importance resampling (operators/dsir.py).

Value-exactness vs DuckDB is covered by the oracle replica
(`dsir_sample` is a registered oracled query); these tests pin the
SEMANTICS on planted corpora plus determinism/partition invariance.
"""

from web_scraper_spark.operators import dsir


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.repartition(parts) if parts else df


_TARGETISH = "the encyclopedia article describes the structured history of science"
_OFFTARGET = "zzz buy cheap pills now click here winner casino jackpot zzz"


def _planted(n=70):
    """Target split (doc_id % 7 == 0) speaks vocabulary A; raw docs
    alternate between target-like (even) and off-target (odd)."""
    rows = []
    for i in range(n):
        if i % 7 == 0:
            rows.append((i, _TARGETISH))
        elif i % 2 == 0:
            rows.append((i, _TARGETISH + f" variant{i % 3}"))
        else:
            rows.append((i, _OFFTARGET + f" spam{i % 3}"))
    return rows


def test_targetlike_docs_outweigh_offtarget(spark):
    out = {r["doc_id"]: r for r in dsir.dsir_sample(_docs(spark, _planted())).collect()}
    # target docs themselves are not scored (they define the target model)
    assert all(d % 7 != 0 for d in out)
    like = [r["logw"] for d, r in out.items() if d % 2 == 0]
    off = [r["logw"] for d, r in out.items() if d % 2 == 1]
    assert min(like) > max(off)
    # Gumbel top-k at keep 1/4 must pick exclusively from the
    # target-like half: the weight separation dominates the noise
    kept = [d for d, r in out.items() if r["selected"]]
    assert kept and all(d % 2 == 0 for d in kept)
    assert len(kept) == len(out) // 4


def test_deterministic_and_partition_invariant(spark):
    rows = _planted(50)
    a = sorted(map(tuple, dsir.dsir_sample(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, dsir.dsir_sample(_docs(spark, rows, 7)).collect()))
    assert a == b


def test_empty_docs_excluded(spark):
    rows = _planted(30) + [(101, ""), (103, "   ")]
    ids = {r["doc_id"] for r in dsir.dsir_sample(_docs(spark, rows)).collect()}
    assert 101 not in ids and 103 not in ids
