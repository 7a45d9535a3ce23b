"""Corpus-trained word segmentation tests (pipeline/segment.py — the
ViTokenizer-tier model, reference ConnectAndSave.py:81).

Three layers: greedy maximal-matching semantics on hand-built streams,
fit determinism/ordering on a tiny known corpus, and Spark-vs-driver
twin equality over the real documents table (the Arrow pass must produce
byte-identical segmented strings to the sequential recompute).
"""

import re

import pytest

from web_scraper_spark.pipeline.segment import (
    _split_lexicon,
    fit_lexicon,
    segment_docs,
    segment_tokens,
)


def _seg(words, lexicon):
    lex2, lex3 = _split_lexicon(lexicon)
    return segment_tokens(words, lex2, lex3)


def test_greedy_prefers_trigram_over_bigram():
    lexicon = ["a b", "a b c"]
    assert _seg(["a", "b", "c"], lexicon) == ["a_b_c"]
    # without the trigram the bigram fires and c stands alone
    assert _seg(["a", "b", "c"], ["a b"]) == ["a_b", "c"]


def test_greedy_consumption_is_left_to_right():
    """Once 'b c' is consumed by the match starting at b, 'c d' cannot
    fire — maximal matching consumes, it does not overlap."""
    lexicon = ["b c", "c d"]
    assert _seg(["a", "b", "c", "d"], lexicon) == ["a", "b_c", "d"]
    # and a match at position 0 shifts the rest of the scan
    assert _seg(["b", "c", "d"], lexicon) == ["b_c", "d"]


def test_no_match_is_identity_and_empty_ok():
    assert _seg(["x", "y"], ["a b"]) == ["x", "y"]
    assert _seg([], ["a b"]) == []


def test_fit_lexicon_counts_and_ordering(spark):
    """Known tiny corpus: 'big data' appears 3x, 'fast scan' 2x, trigram
    'big data table' 3x. min_count=2 keeps all three; order is count desc
    then phrase asc."""
    rows = [(i, "big data table now") for i in range(3)] + [
        (i + 10, "fast scan here") for i in range(2)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    lex = fit_lexicon(docs, min_count=2, max_phrases=100)
    assert lex == [
        # count 3, alphabetical
        "big data", "big data table", "data table", "data table now", "table now",
        # count 2, alphabetical
        "fast scan", "fast scan here", "scan here",
    ]
    # min_count filters: a 3-doc corpus yields nothing at min_count=4
    assert fit_lexicon(docs, min_count=4, max_phrases=100) == []


def test_fit_is_partitioning_invariant(spark):
    rows = [(i, "alpha beta gamma alpha beta") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    lex1 = fit_lexicon(docs.repartition(1), min_count=3, max_phrases=50)
    lex8 = fit_lexicon(docs.repartition(8), min_count=3, max_phrases=50)
    assert lex1 == lex8 and lex1


_WORD_RE = re.compile(r"[^\w\s]")
_WS_RE = re.compile(r"\s+")


def _words_twin(text):
    """Independent recompute of segment._words (regex in Python, not
    Catalyst)."""
    t = _WS_RE.sub(" ", _WORD_RE.sub(" ", text.lower()).strip())
    return t.split(" ") if t else []


def test_spark_apply_equals_sequential_twin(spark):
    """segment_docs over the real documents table == driver-side greedy
    recompute, doc by doc, string-exact."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lexicon = fit_lexicon(docs, min_count=5, max_phrases=5000)
    assert lexicon, "corpus must yield collocations for the model to be real"
    got = {r["doc_id"]: r for r in segment_docs(docs, lexicon).collect()}
    lex2, lex3 = _split_lexicon(lexicon)
    merged_somewhere = False
    for row in docs.select("doc_id", "text").collect():
        words = _words_twin(row["text"])
        seg = segment_tokens(words, lex2, lex3)
        r = got[row["doc_id"]]
        assert r["segmented"] == " ".join(seg)
        assert (r["n_tokens"], r["n_words"]) == (len(words), len(seg))
        merged_somewhere |= len(seg) < len(words)
    assert merged_somewhere, "lexicon never fired — segmentation was identity"


def test_word_segment_query_shape(spark):
    from web_scraper_spark.queries import q_word_segment

    out = q_word_segment(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert len(rows) == n_docs
    assert {f.name for f in out.schema.fields} == {
        "doc_id", "n_tokens", "n_words", "seg_hash"
    }
    assert all(r["n_words"] <= r["n_tokens"] for r in rows)
