"""Trained quality classifier (pipeline/quality_clf.py) — graded on
OUTPUT, the model-tier contract: held-out accuracy floors, per-junk-mode
recall, codegen-only featurization, and a sane probability ordering.
"""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.pipeline import quality_clf as qc

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = qc.quality_classifier(docs).collect()
    assert rows
    return rows


def test_heldout_accuracy_floor(result):
    correct = sum(1 for r in result if (r["pred"] == 0) == r["is_junk"])
    acc = correct / len(result)
    print(f"quality_clf held-out accuracy: {acc:.4f} on {len(result)} rows")
    assert acc >= 0.95


def test_per_mode_junk_recall(result):
    # junk doc_id = original + 10_000_000; mode = original % 3
    by_mode = {0: [], 1: [], 2: []}
    for r in result:
        if r["is_junk"]:
            by_mode[(r["doc_id"] - 10_000_000) % 3].append(r["pred"] == 0)
    for mode, hits in by_mode.items():
        assert hits, f"mode {mode} absent from held-out junk"
        recall = sum(hits) / len(hits)
        print(f"junk mode {mode} recall: {recall:.4f} ({len(hits)} rows)")
        assert recall >= 0.9, f"mode {mode} recall {recall}"


def test_prob_separation(result):
    clean_p = [r["prob_clean"] for r in result if not r["is_junk"]]
    junk_p = [r["prob_clean"] for r in result if r["is_junk"]]
    assert sum(clean_p) / len(clean_p) > 0.8
    assert sum(junk_p) / len(junk_p) < 0.2


def test_featurization_is_codegen_only(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        qc.feature_frame(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    junk_plan = (
        docs.select(qc.corrupt_text(F.col("text"), F.col("doc_id")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in junk_plan and "ArrowEvalPython" not in junk_plan


def test_scoring_partition_invariant_accuracy(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    model = qc.fit_quality_clf(docs.filter(F.col("doc_id") % 5 != 0))
    held = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    a = {r["doc_id"]: r["pred"] for r in qc.score_quality(model, held).collect()}
    b = {
        r["doc_id"]: r["pred"]
        for r in qc.score_quality(model, held.repartition(13)).collect()
    }
    assert a == b  # scoring is a pure projection — partitioning can't matter
