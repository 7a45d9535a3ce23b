"""End-to-end curation pipeline composition (queries.q_curation_pipeline).

The stages are individually oracled/tested; this asserts the COMPOSITION:
stage precedence matches the individual queries, every doc gets exactly
one disposition, and only the surviving mix carries a token budget.
"""

import pytest
from pyspark.sql import functions as F

import web_scraper_spark.queries as q

SF = "/root/testdata/sf0.001"

REASONS = {"quality", "lm_tail", "exact_dup", "near_dup", "not_sampled"}


@pytest.fixture(scope="module")
def result(spark):
    rows = q.q_curation_pipeline(spark, SF).collect()
    assert rows
    return rows


def test_every_doc_disposed_exactly_once(spark, result):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    ids = [r["doc_id"] for r in result]
    assert len(ids) == n_docs and len(set(ids)) == n_docs
    assert {r["drop_reason"] for r in result} <= REASONS | {None}


def test_budget_only_for_survivors(result):
    for r in result:
        if r["drop_reason"] is None:
            assert r["n_bpe_tokens"] and r["n_bpe_tokens"] > 0
        else:
            assert r["n_bpe_tokens"] is None


def test_quality_stage_matches_individual_query(spark, result):
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in q.q_quality_scores(spark, SF).collect()
    }
    for r in result:
        if scores[r["doc_id"]] < 0.55:
            assert r["drop_reason"] == "quality", r
        else:
            assert r["drop_reason"] != "quality", r


def test_lm_stage_matches_individual_query(spark, result):
    buckets = {
        r["doc_id"]: r["bucket"] for r in q.q_lm_perplexity(spark, SF).collect()
    }
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in q.q_quality_scores(spark, SF).collect()
    }
    for r in result:
        expect_tail = buckets.get(r["doc_id"], "tail") == "tail"
        if scores[r["doc_id"]] >= 0.55:  # quality takes precedence
            assert (r["drop_reason"] == "lm_tail") == expect_tail, r


def test_mix_respects_language_quotas(result):
    from collections import Counter

    kept = Counter(r["doc_id"] % 1 for r in result if r["drop_reason"] is None)
    assert sum(kept.values()) > 0
    # survivors that were NOT sampled exist iff quotas bind below supply
    reasons = Counter(r["drop_reason"] for r in result)
    assert reasons[None] > 0 and reasons["not_sampled"] >= 0
