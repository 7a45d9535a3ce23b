"""Exact-phrase search over positional postings — pure relational shape.

Extends the search tier (operators/search.py) with the capability the
reference's pandas ``str.contains`` keyword passes can't express
scalably: exact consecutive-token phrase matching. The plan is the
classic positional-index formulation with NO per-row Python and no
arrays shipped through joins:

1. positional postings: one posexplode over the token stream, filtered
   to the phrase vocabulary INSIDE the same codegen pipeline — only
   phrase-term rows survive the scan stage;
2. each phrase term carries its offset within the phrase (broadcast);
   anchoring ``p0 = pos - offset`` turns "consecutive positions" into a
   plain GROUP BY: an anchor p0 matches iff all ``len(phrase)`` distinct
   offsets appear at it (repeated phrase terms fall out naturally — one
   posting row per (pos, offset) pair);
3. per-(query, doc) rollup: match count + first match position.

Shuffles: one for the (query, doc_id, p0) anchor aggregate, one for the
per-doc rollup — both keyed on already-filtered posting rows, never raw
text. The DuckDB twin mirrors the relational steps exactly (positions
1-based on both sides: Spark ``posexplode + 1``, DuckDB
``generate_subscripts``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
)

# Fixed phrase workload over the synthetic corpus vocabulary; includes a
# 3-term phrase and a repeated-term phrase (the anchor-cover edge case).
PHRASE_QUERIES: dict[str, list[str]] = {
    "customer_order": ["customer", "order"],
    "merge_sort": ["merge", "sort"],
    "window_filter_stream": ["window", "filter", "stream"],
    "data_data": ["data", "data"],
    "fast_hash_join": ["fast", "hash", "join"],
}


def _phrase_vocab() -> list[str]:
    return sorted({t for ts in PHRASE_QUERIES.values() for t in ts})


def _pos_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term) positional postings for phrase-vocab terms,
    positions 1-based. Fanned out first (operators/dedup._fan_out) for
    the same single-file-scan reason as search._postings."""
    from web_scraper_spark.operators.dedup import _fan_out

    tok = tokens(F.lower(clean_text(F.col("text"))))
    return (
        _fan_out(docs)
        .select("doc_id", F.posexplode(tok).alias("pos0", "term"))
        .filter(F.col("term").isin(_phrase_vocab()))
        .select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "term")
    )


def _phrase_qdf(spark):
    rows = [
        (q, t, off, len(ts))
        for q, ts in PHRASE_QUERIES.items()
        for off, t in enumerate(ts)
    ]
    return spark.createDataFrame(rows, "query string, term string, off int, qn int")


def phrase_search(docs: DataFrame) -> DataFrame:
    """Docs containing each exact phrase: (query, doc_id, n_matches,
    first_pos) with first_pos the 1-based token position of the earliest
    match."""
    spark = docs.sparkSession
    anchored = (
        _pos_postings(docs)
        .join(F.broadcast(_phrase_qdf(spark)), on="term")
        .select(
            "query", "doc_id", "qn",
            (F.col("pos") - F.col("off")).cast("int").alias("p0"),
            "off",
        )
    )
    anchors = (
        anchored.groupBy("query", "doc_id", "qn", "p0")
        .agg(F.count_distinct("off").alias("n_off"))
        .filter(F.col("n_off") == F.col("qn"))
    )
    return anchors.groupBy("query", "doc_id").agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.min("p0").cast("int").alias("first_pos"),
    )


def phrase_search_sql() -> str:
    tok = tokens_sql(f"lower({clean_text_sql('text')})")
    in_list = ", ".join(f"'{t}'" for t in _phrase_vocab())
    qrows = ", ".join(
        f"('{q}', '{t}', {off}, {len(ts)})"
        for q, ts in PHRASE_QUERIES.items()
        for off, t in enumerate(ts)
    )
    return f"""
        WITH pp AS (
            SELECT doc_id, pos::INT AS pos, term FROM (
                SELECT doc_id,
                       unnest({tok}) AS term,
                       generate_subscripts({tok}, 1) AS pos
                FROM documents
            ) WHERE term IN ({in_list})
        ),
        qt AS (SELECT * FROM (VALUES {qrows}) AS q(query, term, off, qn)),
        anchors AS (
            SELECT query, doc_id, qn, (pos - off)::INT AS p0
            FROM pp JOIN qt USING (term)
            GROUP BY 1, 2, 3, 4
            HAVING count(DISTINCT off) = qn
        )
        SELECT query, doc_id,
               count(*)::BIGINT AS n_matches,
               min(p0)::INT AS first_pos
        FROM anchors
        GROUP BY 1, 2
    """
