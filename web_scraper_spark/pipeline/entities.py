"""Entity-extraction stage (SURVEY.md E3 stage 1 /
preprocessing_extract_entity.py).

Pipeline: sentence split (X10) → NER (P2, vectorized) → entity normalize
(X11) → validity filter (F10) → per-article dedup (A4) → case-insensitive
dedup (A5) → min-frequency gate (F11).

The reference's NER model (underthesea) is not in this container; the
model call is isolated behind ``ner_batches`` — a mapInPandas UDF whose
BIO-merge logic (merge_consecutive_entities,
preprocessing_extract_entity.py:185-238) is real and unit-tested, with the
tagger swappable: the default deterministic tagger marks capitalized token
runs as entities (the reference's own capitalization fallback,
preprocessing_extract_entity.py:283-298). Swapping in underthesea changes
one function, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import EN_STOPWORDS


def split_sentences(col: Column) -> Column:
    """X10 as a native expression: split on sentence punctuation followed
    by a whitespace run. (underthesea.sent_tokenize would run here as a
    pandas_udf when available; the regex split is the deterministic
    fallback and the oracle-checkable path.)

    The whitespace class is spelled out ([\\t\\n\\f\\r ]) rather than \\s:
    Java's \\s includes \\x0B where RE2's does not, so the explicit class
    is the only spelling that behaves identically in both engines."""
    parts = F.split(col, r"(?<=[.!?])[\t\n\f\r ]+")
    return F.filter(
        F.transform(parts, lambda s: F.trim(s)), lambda s: F.length(s) >= 10
    )  # F12 sentence length gate


def split_sentences_sql(expr: str) -> str:
    # RE2 has no lookbehind: split on punctuation + whitespace-run (same
    # explicit class as the Spark side) keeping the punctuation via a
    # marker that cannot appear in cleaned text
    inner = f"regexp_replace({expr}, '([.!?])[\\t\\n\\f\\r ]+', '\\1\x01', 'g')"
    return (
        f"list_filter(list_transform(string_split({inner}, '\x01'), s -> trim(s)), "
        f"s -> length(s) >= 10)"
    )


def normalize_entity(col: Column) -> Column:
    """X11 (preprocessing_extract_entity.py:123-137): whitespace collapse,
    strip wrapping brackets/quotes, strip leading/trailing non-word."""
    c = F.regexp_replace(F.trim(col), r"\s+", " ")
    c = F.regexp_replace(c, r"""^["'\[\(\{]+|["'\]\)\}]+$""", "")
    return F.regexp_replace(c, r"^[^\w]+|[^\w]+$", "")


def tag_tokens(tokens: list[str]) -> list[str]:
    """Deterministic fallback tagger: BIO tags from capitalization runs
    (the reference's fallback heuristic). Swap point for a real model."""
    tags = []
    prev_ent = False
    for t in tokens:
        is_ent = bool(t) and t[0].isupper() and not t.isupper()
        if is_ent:
            tags.append("I-NP" if prev_ent else "B-NP")
        else:
            tags.append("O")
        prev_ent = is_ent
    return tags


def merge_bio(tokens: list[str], tags: list[str]) -> list[tuple[str, str]]:
    """BIO-merge (preprocessing_extract_entity.py:185-238): consecutive
    B-/I- tokens of one type merge into a single entity span."""
    out: list[tuple[str, str]] = []
    cur: list[str] = []
    cur_type = ""
    for tok, tag in zip(tokens, tags):
        if tag.startswith("B-"):
            if cur:
                out.append((" ".join(cur), cur_type))
            cur = [tok]
            cur_type = tag[2:]
        elif tag.startswith("I-") and cur and tag[2:] == cur_type:
            cur.append(tok)
        else:
            if cur:
                out.append((" ".join(cur), cur_type))
            cur, cur_type = [], ""
    if cur:
        out.append((" ".join(cur), cur_type))
    return out


NER_SCHEMA = "sentence string, entity string, entity_type string"


def ner_batches(sentences: DataFrame, tagger=None) -> DataFrame:
    """P2: (sentence) → (sentence, entity, entity_type) rows, Arrow-batched.
    Keyed by the sentence text itself so the ST8 pattern works: callers
    run this over DISTINCT sentences only and equi-join results back to
    the (article, position) index — the model never sees a sentence twice.

    ``tagger(tokens) -> BIO tags`` is the model swap point: the default is
    the reference's capitalization fallback; a real deployment passes the
    underthesea chunker's tag stream (multi-type B-/I- with type switches
    and orphan I- tags — merge_bio handles all of them, test-covered)."""
    tagger = tagger or tag_tokens

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                toks = (r.sentence or "").split()
                for ent, etype in merge_bio(toks, tagger(toks)):
                    rows.append((r.sentence, ent, etype or "NP"))
            yield pd.DataFrame(rows, columns=["sentence", "entity", "entity_type"])

    return sentences.select("sentence").mapInPandas(run, schema=NER_SCHEMA)


def valid_entity(col: Column) -> Column:
    """F10 — the 8-rule conjunctive predicate (shared with
    analytics.valid_entity_filter; duplicated at the reference too,
    relation_extraction.py:190-197)."""
    t = col
    words = F.split(t, " ")
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    repeated = t == F.repeat(F.substring(t, 1, 1), F.length(t))
    return (
        (F.length(t) >= 2)
        & (F.length(t) <= 100)
        & t.rlike("[A-Za-z]")
        & ~t.rlike("^[0-9]+$")
        & ~repeated
        & (F.size(F.array_except(F.transform(words, F.lower), stop)) > 0)
        & ~F.lower(F.element_at(words, 1)).isin(EN_STOPWORDS)
        & ~F.lower(F.element_at(words, -1)).isin(EN_STOPWORDS)
    )


def extract_entities(docs: DataFrame, min_freq: int = 2, tagger=None) -> DataFrame:
    """Full E3 stage-1 chain over documents(doc_id, text):
    returns (article_id, entity, entity_type, n_mentions).

    ``tagger`` threads through to the ner_batches swap point — pass
    pipeline/perceptron_ner.default_tagger() for the in-repo statistical
    model (multi-type BIO), or leave None for the capitalization fallback."""
    sent = docs.select(
        F.col("doc_id").alias("article_id"),
        F.posexplode(split_sentences(F.col("text"))).alias("sentence_pos", "sentence"),
    )
    # ST8: NER is the expensive stage → run it once per DISTINCT sentence
    # (relation_cache analogue, relation_extraction.py:66-67), then
    # equi-join entities back to every (article, position) occurrence.
    # Fanned out: AQE coalesces the small distinct-shuffle to ONE
    # partition at test SF, which would serialize the whole model stage
    # through a single Python worker (no-op at scale — many partitions).
    from web_scraper_spark.operators.dedup import _fan_out

    ents = (
        ner_batches(_fan_out(sent.select("sentence").distinct()), tagger=tagger)
        .withColumn("entity", normalize_entity(F.col("entity")))
        .filter(valid_entity(F.col("entity")))
    )
    keyed = sent.join(ents, on="sentence").select(
        "article_id", "sentence_pos", "entity", "entity_type"
    )
    # A4: per-article dedup, first mention wins (discovery order = sentence_pos)
    from pyspark.sql import Window

    w = Window.partitionBy("article_id", "entity", "entity_type").orderBy("sentence_pos")
    per_article = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # F11: global min-frequency gate via semi-join
    freq = per_article.groupBy("entity").agg(F.count("*").alias("n_mentions"))
    kept = freq.filter(F.col("n_mentions") >= min_freq)
    return (
        per_article.join(kept, on="entity", how="left_semi")
        .join(freq, on="entity")
        .select("article_id", "entity", "entity_type", "n_mentions")
    )
