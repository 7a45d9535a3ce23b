"""Relation-extraction stage (SURVEY.md E3 stage 3 / relation_extraction.py).

Hybrid classifier, staged by cost (O6, relation_extraction.py:175-187):

1. regex tier — native ``rlike`` against a pattern vocabulary (the
   reference ships a 19-type × ~1,121-pattern JSON; the engine treats the
   vocab as runtime CONFIG — ``RelationVocab`` loads any {rel_type:
   [patterns]} dict; a small built-in English vocab serves tests).
   First-matching-type-wins, in deterministic vocab order.
2. LLM tier — only sentences the regex tier could not classify, deduped
   first (ST8), batched through ``mapInPandas``. The external call is
   stubbed (no network): the default ``classify_fn`` returns 'RELATED_TO',
   deterministic; a real deployment injects the API call + key-rotation
   (O9) inside the same UDF.

Edges: per sentence, unordered entity pairs (J5) via the sentence-grouped
self-join; typed-edge dedup keeps the first example sentence per
(e1, e2, rel) — first-writer-wins (S9, relation_extraction.py:229-236).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Built-in mini-vocab (mechanism demo; production loads the full JSON vocab
# as config — same structure as the reference's relation_vocab.json)
DEFAULT_VOCAB: dict[str, list[str]] = {
    "CAUSE_EFFECT": [r"\bbecause\b", r"\bdue to\b", r"\bcauses?\b", r"\bslow\b"],
    "TEMPORAL": [r"\bbefore\b", r"\bafter\b", r"\bwhen\b", r"\bwindow\b"],
    "COMPARISON": [r"\bfaster\b", r"\bthan\b", r"\bfast\b"],
    "DATA_FLOW": [r"\bjoin\b", r"\bmerge\b", r"\bshuffle\b", r"\bstream\b"],
}


def compile_vocab(raw: dict[str, list[str]]) -> dict[str, list[str]]:
    """Literal (non-regex) patterns are escaped and word-bounded so the
    rlike tier matches them as phrases; patterns that already look like
    regexes pass through. \\b and re.escape output behave identically in
    Java regex and RE2, keeping the oracle twin exact."""
    import re as _re

    vocab: dict[str, list[str]] = {}
    for rel, pats in raw.items():
        cleaned = []
        for p in pats:
            if any(ch in p for ch in r"\[](){}|+*?^$"):
                cleaned.append(p)  # already a regex
            else:
                cleaned.append(r"\b" + _re.escape(p) + r"\b")
        vocab[rel] = cleaned
    return vocab


def load_vocab(path: str) -> dict[str, list[str]]:
    """Load a {rel_type: [patterns]} vocabulary file — the reference's
    relation_vocab.json (19 types × ~1,121 literal patterns) loads
    unchanged. The full-size synthetic twin (functions.vocab.synth_vocab)
    runs through the same compile path in the driver gate and bench."""
    import json

    return compile_vocab(json.load(open(path, encoding="utf-8")))


def sanitize_rel_type(col: Column) -> Column:
    """X12 (relation_extraction.py:200-215)."""
    up = F.upper(F.regexp_replace(col, "[^a-zA-Z0-9_]", "_"))
    return F.when(up.rlike("^[0-9]"), F.concat(F.lit("REL_"), up)).otherwise(up)


def regex_tier(sentence: Column, vocab: dict[str, list[str]] | None = None) -> Column:
    """First-matching-type-wins CASE chain, fully native (rlike).

    One combined alternation per relation type — at 1,000+ patterns per
    type this compiles to a single Java regex per type, evaluated inside
    codegen; no UDF, no shuffle."""
    vocab = vocab or DEFAULT_VOCAB
    expr = F.lit(None).cast("string")
    for rel in reversed(list(vocab)):
        pat = "|".join(f"(?:{p})" for p in vocab[rel])
        expr = F.when(F.lower(sentence).rlike(pat), F.lit(rel)).otherwise(expr)
    return expr


def regex_tier_sql(sentence_expr: str, vocab: dict[str, list[str]] | None = None) -> str:
    vocab = vocab or DEFAULT_VOCAB
    chain = " ".join(
        f"WHEN regexp_matches(lower({sentence_expr}), "
        f"'{'|'.join(f'(?:{p})' for p in pats)}') THEN '{rel}'"
        for rel, pats in vocab.items()
    )
    return f"(CASE {chain} ELSE NULL END)"


def _default_classify(batch: pd.Series) -> pd.Series:
    """LLM-tier stub: deterministic fallback label. A real deployment
    injects :class:`LlmClassifier` with an HTTP transport instead."""
    return pd.Series(["RELATED_TO"] * len(batch), index=batch.index)


class RateLimitError(RuntimeError):
    """Transport signal for a quota/429 response → rotate the API key."""


class LlmClassifier:
    """The external-tier call harness (O9/ST7), running INSIDE the UDF so
    every partition gets its own instance — bounded partitions = bounded
    API concurrency, no driver coordination.

    Reference semantics (relation_extraction.py:21-33,127-171): sentences
    go out in fixed-size batches; a rate-limit response rotates to the
    next API key (the reference cycles a key list) and retries with
    exponential backoff, up to ``max_retries`` attempts per batch; a batch
    that exhausts its retries falls back to the deterministic default
    label rather than failing the job. ``transport(key, sentences) ->
    labels`` is injectable — tests use a fake; a deployment supplies the
    HTTP call. ``calls`` records (key, n_items, attempt) per transport
    invocation for test inspection.
    """

    FALLBACK = "RELATED_TO"

    def __init__(
        self,
        transport,
        api_keys: tuple[str, ...] = ("key0",),
        batch_size: int = 32,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        sleep=None,
    ):
        import time

        self.transport = transport
        self.api_keys = tuple(api_keys)
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.sleep = sleep if sleep is not None else time.sleep
        self._key_ix = 0
        self.calls: list[tuple[str, int, int]] = []

    def __call__(self, batch: pd.Series) -> pd.Series:
        out: list[str] = []
        for lo in range(0, len(batch), self.batch_size):
            chunk = list(batch.iloc[lo : lo + self.batch_size])
            labels = None
            for attempt in range(self.max_retries):
                key = self.api_keys[self._key_ix % len(self.api_keys)]
                self.calls.append((key, len(chunk), attempt))
                try:
                    labels = list(self.transport(key, chunk))
                    break
                except RateLimitError:
                    self._key_ix += 1  # rotate key, then back off
                    self.sleep(self.backoff_s * (2**attempt))
                except Exception:
                    self.sleep(self.backoff_s * (2**attempt))
            if labels is None:  # retry budget exhausted → deterministic fallback
                labels = [self.FALLBACK] * len(chunk)
            out.extend(labels)
        return pd.Series(out, index=batch.index)


def llm_tier(
    residual: DataFrame,
    classify_fn: Callable[[pd.Series], pd.Series] = _default_classify,
) -> DataFrame:
    """(sentence) → (sentence, rel_type) for regex-misses only, deduped
    upstream (ST8). Bounded partitions = bounded API concurrency."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {"sentence": pdf["sentence"], "rel_type": classify_fn(pdf["sentence"])}
            )

    return residual.select("sentence").mapInPandas(
        run, schema="sentence string, rel_type string"
    )


def classify_sentences(
    sentences: DataFrame, vocab: dict[str, list[str]] | None = None
) -> DataFrame:
    """Hybrid classify: regex tier native; residual → dedup → LLM tier →
    union. Input (sentence), output (sentence, rel_type)."""
    tagged = sentences.select(
        "sentence", regex_tier(F.col("sentence"), vocab).alias("rel_type")
    )
    hit = tagged.filter(F.col("rel_type").isNotNull())
    residual = tagged.filter(F.col("rel_type").isNull()).select("sentence").distinct()
    return hit.unionByName(llm_tier(residual))


def extract_relations(
    doc_sentences: DataFrame, vocab: dict[str, list[str]] | None = None
) -> DataFrame:
    """Full stage: (article_id, sentence, entity) rows → typed edges
    (e1, e2, rel_type, example) with first-writer-wins examples.

    The entity-pair join is sentence-grouped (A6+J5): pairs form only
    within one sentence's entity set — the inverted-index shape again."""
    ents = doc_sentences.select("article_id", "sentence", "entity").distinct()
    a, b = ents.alias("a"), ents.alias("b")
    pairs = (
        a.join(b, on=["article_id", "sentence"])
        .where(F.col("a.entity") < F.col("b.entity"))
        .select(
            F.col("a.entity").alias("e1"),
            F.col("b.entity").alias("e2"),
            "sentence",
        )
    )
    # fan out before the regex tier: AQE coalesces the BYTE-small distinct
    # to one partition, but cost here is CPU per row (19 compiled
    # alternations over each sentence) — a single task would serialize it
    # (no-op at scale where the shuffle stays wide)
    from web_scraper_spark.operators.dedup import _fan_out

    classified = classify_sentences(_fan_out(pairs.select("sentence").distinct()), vocab)
    edges = pairs.join(classified, on="sentence").select(
        "e1", "e2", sanitize_rel_type(F.col("rel_type")).alias("rel_type"), "sentence"
    )
    # S9 first-writer-wins: keep one example per (e1, e2, rel_type),
    # deterministically (min sentence ≈ first in canonical order)
    return edges.groupBy("e1", "e2", "rel_type").agg(
        F.min("sentence").alias("example"), F.count("*").alias("n_sentences")
    )
