"""Spark-ML-LDA vs independent-optimizer parity (r3 VERDICT item 3,
SURVEY A8-A10, reference ConnectAndSave.py:201-212 sklearn LDA).

sklearn is not installed in this container, so the independent optimizer
is tests/lda_twin.py — batch variational Bayes, the same mean-field
family sklearn's LatentDirichletAllocation implements — fed the IDENTICAL
doc-term matrix Spark's CountVectorizer produced. Spark ML runs
collapsed EM; the pair therefore differs exactly the way Spark-vs-sklearn
would: same objective, different optimizer.

Measured (deterministic, seed 42, k=5, maxIter=20):
- planted-topic corpus (5 mostly-disjoint vocabularies, purity 0.85):
  ARI(spark, truth) = ARI(twin, truth) = ARI(spark, twin) = 1.0
  → when the data HAS topic structure the optimizers agree completely;
- the sf0.001 synthetic documents table (random word soup, 31-term
  vocabulary, no latent structure): ARI(spark, twin) = 0.0706
  → with nothing to recover, the two optimizers partition arbitrarily.

The twin reads X in a canonical sorted-term basis (CountVectorizer
breaks frequency ties by partition order, which varies across suite
runs) and keeps the best of 4 seeded restarts by variational data fit —
without restarts a single unlucky init can merge two planted topics
(observed: ARI 0.78 under one tie-order permutation).

That second number is WHY lda_topics is registered rows-only: the
divergence is legitimate optimizer behavior, now measured instead of
assumed."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.lda_twin import adjusted_rand, vb_lda_doc_topics


def _spark_lda_assignments(spark, docs_df, tokens_col, k=5, seed=42):
    """CountVectorizer + Spark ML EM LDA → (argmax topics, count matrix),
    row-aligned by doc_id order."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.functions import vector_to_array

    toks = docs_df.select("doc_id", tokens_col.alias("tokens"))
    cvm = CountVectorizer(
        inputCol="tokens", outputCol="features", vocabSize=2000, minDF=1.0
    ).fit(toks)
    vec = cvm.transform(toks)
    model = LDA(
        k=k, seed=seed, maxIter=20, optimizer="em", featuresCol="features"
    ).fit(vec)
    dist = vector_to_array(F.col("topicDistribution"))
    rows = (
        model.transform(vec)
        .select(
            "doc_id",
            "features",
            (F.array_position(dist, F.array_max(dist)) - 1).cast("int").alias("t"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assign = np.array([r["t"] for r in rows])
    X = np.zeros((len(rows), len(cvm.vocabulary)))
    for i, r in enumerate(rows):
        v = r["features"]
        X[i, np.array(v.indices, dtype=int)] = v.values
    # canonical term basis: CountVectorizer breaks equal-frequency ties by
    # partition order, which is suite-run-dependent; the VB twin's seeded
    # init is basis-sensitive, so hand it deterministically ordered columns
    X = X[:, np.argsort(np.array(cvm.vocabulary))]
    return assign, X


def _planted_corpus(n_docs=400, k=5, words_per_topic=30, doc_len=60,
                    purity=0.85, seed=11):
    rng = random.Random(seed)
    topics = [[f"t{t}w{i}" for i in range(words_per_topic)] for t in range(k)]
    docs, truth = [], []
    for d in range(n_docs):
        t = d % k
        words = [
            rng.choice(topics[t if rng.random() < purity else rng.randrange(k)])
            for _ in range(doc_len)
        ]
        docs.append((d, " ".join(words)))
        truth.append(t)
    return docs, np.array(truth)


def test_lda_optimizers_agree_on_planted_structure(spark):
    docs, truth = _planted_corpus()
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    spark_t, X = _spark_lda_assignments(spark, df, F.split("text", " "))
    twin_t = vb_lda_doc_topics(X, k=5, seed=42)
    assert adjusted_rand(spark_t, truth) >= 0.9  # measured 1.0
    assert adjusted_rand(twin_t, truth) >= 0.9  # measured 1.0
    assert adjusted_rand(spark_t, twin_t) >= 0.9  # measured 1.0


def test_lda_divergence_on_unstructured_corpus_is_measured(spark):
    """The sf0.001 documents are structureless word soup: the optimizers
    legitimately disagree (measured ARI 0.0706). Pin that the divergence
    IS large — if this ever jumps above 0.5 the rows-only justification
    for lda_topics should be revisited (and the oracle story upgraded)."""
    from web_scraper_spark.operators.text import clean_text, tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark_t, X = _spark_lda_assignments(
        spark, docs, tokens(clean_text(F.col("text")))
    )
    twin_t = vb_lda_doc_topics(X, k=5, seed=42)
    ari = adjusted_rand(spark_t, twin_t)
    assert -0.2 <= ari < 0.5, ari
    # both are still valid 5-way assignments over all docs
    assert set(spark_t) <= set(range(5)) and set(twin_t) <= set(range(5))
    assert len(spark_t) == len(twin_t) == docs.count()
