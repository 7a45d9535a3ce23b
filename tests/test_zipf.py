"""Zipf-law fit (operators/zipf.py).

Value-exactness vs DuckDB on the real corpus is covered by the oracle
replica (`zipf_fit` is a registered oracled query); these tests pin the
regression against numpy on a planted power-law corpus, the min-terms
gate, tie determinism, and partition invariance (the dec-sum
order-independence property).
"""

import math

import numpy as np

from web_scraper_spark.operators import zipf


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    return df.repartition(parts) if parts else df


def _power_law_corpus(n_types=40, s=1.0):
    """One doc whose term frequencies follow freq(r) = ceil(C / r^s)."""
    words = []
    for r in range(1, n_types + 1):
        f = max(1, round(200 / r**s))
        words += [f"t{r:03d}"] * f
    return " ".join(words)


def test_recovers_planted_slope(spark):
    rows = [(0, "en", _power_law_corpus(s=1.0))]
    out = zipf.zipf_fit(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # planted s=1.0 (quantized by ceil/min floors): slope near -1
    assert -1.15 < r["zipf_slope"] < -0.85
    assert r["n_terms"] == 40


def test_matches_numpy_regression(spark):
    rows = [(0, "en", _power_law_corpus(n_types=30, s=0.8))]
    r = zipf.zipf_fit(_docs(spark, rows)).collect()[0]
    # rebuild (x, y) exactly as the operator defines them
    freqs = sorted(
        (max(1, round(200 / k**0.8)) for k in range(1, 31)), reverse=True
    )
    x = np.array([round(math.log(i + 1), 6) for i in range(len(freqs))])
    y = np.array([round(math.log(f), 6) for f in freqs])
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxy = np.round(x * y, 6).sum()
    sxx = np.round(x * x, 6).sum()
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert abs(r["zipf_slope"] - slope) < 2e-6
    assert r["n_tokens"] == sum(freqs)


def test_min_terms_gate_and_tie_break(spark):
    rows = [
        (0, "en", _power_law_corpus()),
        (1, "xx", "only three distinct words only three distinct"),
    ]
    out = {r["lang"]: r for r in zipf.zipf_fit(_docs(spark, rows)).collect()}
    assert "xx" not in out  # below MIN_TERMS
    assert "en" in out


def test_partition_invariant(spark):
    """The dec-sum regression must be identical under any partitioning —
    the property double sums would violate."""
    rows = [(i, "en", _power_law_corpus(n_types=25, s=1.1)) for i in range(6)]
    a = sorted(map(tuple, zipf.zipf_fit(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, zipf.zipf_fit(_docs(spark, rows, 7)).collect()))
    assert a == b


def test_plan_shape(spark):
    df = zipf.zipf_fit(_docs(spark, [(0, "en", _power_law_corpus())]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
