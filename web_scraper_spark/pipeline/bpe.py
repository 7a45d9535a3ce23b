"""Trained byte-pair-encoding tokenizer (the token-budget model tier).

SURVEY's text-analysis lineup asks for "token counting (whitespace + a
BPE-ish regex)"; operators/text.py ships that heuristic. This module is
the REAL thing: a BPE tokenizer trained on the corpus and applied
distributed — the stage a training pipeline runs to budget token counts
and pack sequences.

Training follows the standard published recipe (Sennrich et al. 2016):
pre-tokenize to words, reduce the corpus to a WORD-FREQUENCY table
(vocabulary-bounded — the same sanctioned bounded collect as the
segmenter's lexicon, pipeline/segment.py:59-82, NOT a data-sized
collect; the word-frequency reduction itself is one distributed
map-side-combined groupBy capped at ``max_words``), then run the merge
loop on the frequency dict driver-side in pure Python — exactly how
real BPE trainers work (the corpus pass is O(N), the merge loop is
O(vocab)). Applying the merges is embarrassingly parallel: the ranked
merge table broadcasts (closure-shipped list of pairs), one Arrow pass
per batch.

BPE is reversible by construction: concatenating a word's tokens
restores the word — the roundtrip identity is test-asserted
(tests/test_bpe.py), alongside determinism, partition invariance, and a
hand-computed merge sequence on a tiny corpus.

Reference: the scraper counts nothing; token accounting is what its
data consumers need at 100 TB (token counts ARE the currency of
training-data budgeting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import clean_text, tokens

END = "</w>"  # end-of-word marker (the classic formulation)


def word_freq_table(
    docs: DataFrame, text_col: str = "text", max_words: int = 20000
) -> list[tuple[str, int]]:
    """(word, count) rows, top ``max_words`` by (count desc, word) —
    deterministic and vocabulary-bounded."""
    tok = tokens(F.lower(clean_text(F.col(text_col))))
    top = (
        docs.select(F.explode(tok).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
    )
    return [(r["w"], r["c"]) for r in top.collect()]


def train_bpe(word_freqs: list[tuple[str, int]], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word-frequency table (driver-side
    pure Python over the bounded dict — the standard trainer shape).
    Ties break lexicographically so training is fully deterministic."""
    # each word as a tuple of symbols, char-split + end marker
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_freqs:
        sym = tuple(list(w) + [END])
        vocab[sym] = vocab.get(sym, 0) + c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        cnt = max(pairs.values())
        if cnt < 2:
            break
        pair = min(p for p, c in pairs.items() if c == cnt)  # lexicographic tie-break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by merge RANK (lowest first) —
    the canonical BPE apply order."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_docs(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """doc_id, n_words, n_bpe_tokens, bpe_per_word (compression signal)
    — ONE Arrow pass with the broadcast merge ranks; per-word encodes
    are memoized per batch (Zipf makes the word set tiny vs the stream)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def run(it):
        for pdf in it:
            memo: dict[str, int] = {}
            n_words, n_tok = [], []
            for text in pdf[text_col]:
                ws = [w for w in (text or "").lower().split() if w]
                t = 0
                for w in ws:
                    if w not in memo:
                        memo[w] = len(encode_word(w, ranks))
                    t += memo[w]
                n_words.append(len(ws))
                n_tok.append(t)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_bpe_tokens": n_tok,
                }
            )
            out["bpe_per_word"] = (
                out["n_bpe_tokens"] / out["n_words"].clip(lower=1)
            ).round(6)
            yield out

    # normalize EXACTLY like the trainer (clean + lower) so memo keys match
    base = docs.select(
        "doc_id",
        F.lower(clean_text(F.col(text_col))).alias(text_col),
    )
    return base.mapInPandas(
        run,
        schema="doc_id bigint, n_words bigint, n_bpe_tokens bigint, bpe_per_word double",
    )


def bpe_tokens(docs: DataFrame, n_merges: int = 200, train_mod: int = 5) -> DataFrame:
    """Registered-query composition: train on the doc_id % train_mod != 0
    split, encode every document. Rows-only (trained model applied in an
    Arrow pass); roundtrip/determinism/hand-computed-merge tests in
    tests/test_bpe.py."""
    train = docs.filter(F.col("doc_id") % train_mod != 0)
    merges = train_bpe(word_freq_table(train), n_merges=n_merges)
    return bpe_encode_docs(docs, merges)
