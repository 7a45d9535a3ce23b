"""Bigram-LM perplexity (operators/lm.py).

Value-exactness vs DuckDB is covered by the oracle replica
(`lm_perplexity` is a registered oracled query); these tests pin the
SEMANTICS on constructed corpora plus the plan shape.
"""

from collections import Counter

from web_scraper_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# train docs (doc_id % 5 != 0) all speak the same bigram language
_PATTERN = "the quick brown fox jumps over the lazy dog again and again"
TRAIN = [(i, _PATTERN) for i in range(1, 9) if i % 5 != 0]


def test_in_distribution_scores_lower_perplexity(spark):
    rows = TRAIN + [
        (10, _PATTERN),                                # held-out, in-distribution
        (15, "zyx wvu tsr qpo nml kji hgf edc ba zz"),  # out-of-distribution
    ]
    out = {r["doc_id"]: r for r in lm.lm_perplexity(_docs(spark, rows)).collect()}
    assert out[10]["ppl"] < out[15]["ppl"]
    # the lone out-of-distribution doc lands in the worst third
    assert out[15]["bucket"] == "tail"


def test_short_docs_excluded_and_buckets_are_thirds(spark):
    rows = [(i, _PATTERN + f" extra{i % 7}") for i in range(1, 32)] + [
        (100, "single"),  # 1 token -> no bigrams -> excluded
        (101, ""),
    ]
    out = lm.lm_perplexity(_docs(spark, rows)).collect()
    ids = {r["doc_id"] for r in out}
    assert 100 not in ids and 101 not in ids
    sizes = Counter(r["bucket"] for r in out)
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # exact ntile thirds
    # bucket order respects the ppl order
    by_bucket = {b: [r["ppl"] for r in out if r["bucket"] == b] for b in sizes}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_plan_has_no_single_partition_window(spark):
    rows = TRAIN + [(10, _PATTERN)]
    plan = (
        lm.lm_perplexity(_docs(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
