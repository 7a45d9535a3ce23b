"""Full-text search tier: inverted-index keyword search and BM25 top-k.

The webtext capability the reference approximates with pandas
``str.contains`` passes (ConnectAndSave.py keyword filters) re-expressed
as the scalable Spark shape:

- the query term set is a LITERAL ``term.isin(...)`` applied directly on
  the exploded term stream, inside the same whole-stage-codegen pipeline
  as the explode — so only posting rows for query terms reach the
  aggregation, and the one shuffle carries (doc, term) partial counts,
  never raw text or non-query terms;
- query metadata (terms per query, document frequencies, corpus stats)
  are all tiny → broadcast joins; the only shuffle is the posting
  aggregation keyed by (doc_id, dl, term);
- BM25 term scores are summed through DECIMAL(18,6) (operators/
  analytics.dec_sum contract): a double sum is summation-order dependent
  and would flip ranks between engines/cluster sizes, while the per-term
  decimal cast rounds identically everywhere (no double ties at the 7th
  decimal) and the decimal sum is exact;
- ranking windows partition by query — never a global window.

Both operators have exact DuckDB twins (same expression structure, same
operation order, so the double arithmetic inside each term score is
bit-identical before the decimal cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_scraper_spark.operators.analytics import dec_sum, dec_sum_sql
from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
)

# Fixed benchmark query workload over the synthetic corpus vocabulary.
QUERY_TERMS: dict[str, list[str]] = {
    "spark_join": ["spark", "join"],
    "window_filter_stream": ["window", "filter", "stream"],
    "fast_hash": ["fast", "hash"],
    "customer_order_data": ["customer", "order", "data"],
    "merge_sort": ["merge", "sort"],
}

BM25_K1 = 1.2
BM25_B = 0.75


def _all_terms() -> list[str]:
    return sorted({t for ts in QUERY_TERMS.values() for t in ts})


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) for query terms only. dl rides the groupBy
    key (functionally dependent on doc_id) so no separate doc-length join
    is needed.

    The input is fanned out first: a small-SF table is one parquet file,
    and a partial aggregate fused above the token Generate in a single
    task measured 13 s at sf0.1 vs 1.7 s fanned (operators/dedup._fan_out
    — metadata-only probe, no-op on a production multi-file scan)."""
    from web_scraper_spark.operators.dedup import _fan_out

    tok = tokens(F.lower(clean_text(F.col("text"))))
    base = _fan_out(docs).select(
        "doc_id", F.size(tok).alias("dl"), F.explode(tok).alias("term")
    )
    return (
        base.filter(F.col("term").isin(_all_terms()))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def _query_df(spark):
    rows = [(q, t) for q, ts in QUERY_TERMS.items() for t in ts]
    return spark.createDataFrame(rows, "query string, term string")


def keyword_search(docs: DataFrame) -> DataFrame:
    """Conjunctive (AND) keyword search: docs containing EVERY term of a
    query, with the summed term frequency as a relevance proxy."""
    spark = docs.sparkSession
    qdf = _query_df(spark)
    qsize = qdf.groupBy("query").agg(F.count("*").alias("qn"))
    hits = (
        _postings(docs)
        .join(F.broadcast(qdf), on="term")
        .groupBy("query", "doc_id")
        .agg(
            F.count_distinct("term").alias("n_terms_hit"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
    )
    return (
        hits.join(F.broadcast(qsize), on="query")
        .filter(F.col("n_terms_hit") == F.col("qn"))
        .select("query", "doc_id", "total_tf")
    )


def _query_values_sql() -> str:
    rows = ", ".join(
        f"('{q}', '{t}')" for q, ts in QUERY_TERMS.items() for t in ts
    )
    return f"(VALUES {rows}) AS qt(query, term)"


def _postings_sql() -> str:
    tok = tokens_sql(f"lower({clean_text_sql('text')})")
    in_list = ", ".join(f"'{t}'" for t in _all_terms())
    return f"""
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (
            SELECT doc_id, len({tok}) AS dl, unnest({tok}) AS term
            FROM documents
        )
        WHERE term IN ({in_list})
        GROUP BY 1, 2, 3
    """


def keyword_search_sql() -> str:
    return f"""
        WITH qt AS (SELECT * FROM {_query_values_sql()}),
        qsz AS (SELECT query, count(*) AS qn FROM qt GROUP BY 1),
        tf AS ({_postings_sql()})
        SELECT query, doc_id, sum(tf)::BIGINT AS total_tf
        FROM tf JOIN qt USING (term) JOIN qsz USING (query)
        GROUP BY query, doc_id, qn
        HAVING count(DISTINCT term) = qn
    """


def _corpus_stats(docs: DataFrame) -> DataFrame:
    """1-row (n_docs, total_dl) over ALL docs (zero-hit docs still count)."""
    tok = tokens(F.lower(clean_text(F.col("text"))))
    return docs.select(F.size(tok).alias("dl")).agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("bigint").alias("total_dl")
    )


def _bm25_rank(tf: DataFrame, stats: DataFrame, k: int) -> DataFrame:
    """The shared BM25 scoring body: postings (doc_id, dl, term, tf) +
    1-row stats → ranked top-k per query. Factored out so the full and
    incremental paths score IDENTICALLY (same expression tree, same
    decimal sum, same window)."""
    spark = tf.sparkSession
    # document frequency: tf has exactly one row per (doc, term), so a
    # count over a term-partitioned window IS df — one shuffle of the
    # (already tiny) postings frame instead of recomputing the whole
    # explode subtree for a separate df aggregate + join
    df_t = F.count("*").over(Window.partitionBy("term"))
    scored = (
        tf.withColumn("df", df_t)
        .join(F.broadcast(_query_df(spark)), on="term")
        .crossJoin(F.broadcast(stats))
    )
    # expression structure mirrors the SQL twin operation-for-operation
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + (F.lit(BM25_B) * F.col("dl")) / avgdl
    )
    term_score = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom
    per_doc = scored.groupBy("query", "doc_id").agg(
        dec_sum(term_score, 6).alias("score")
    )
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query", "doc_id", "score", "rank")
    )


def bm25_topk(docs: DataFrame, k: int = 10) -> DataFrame:
    """BM25 top-k per query (k1=1.2, b=0.75, idf = ln(1 + (N-df+.5)/(df+.5))).

    Corpus stats (N, total_dl) and per-term document frequencies are
    1-row / |terms|-row aggregates → broadcast; per-(query, doc) scores
    sum through DECIMAL so ranks can't drift with summation order. The
    rank window partitions by query and orders by the POST-rounding score
    (ties broken by doc_id) — deterministic across engines."""
    return _bm25_rank(_postings(docs), _corpus_stats(docs), k)


# ---------------------------------------------------------------------------
# Incremental index maintenance (r3 VERDICT item 5 — the production daily
# batch: new documents arrive, the corpus index must not be re-tokenized)
# ---------------------------------------------------------------------------

STATS_SCHEMA = "n_docs bigint, total_dl bigint"
POSTINGS_SCHEMA = "doc_id bigint, dl int, term string, tf bigint"


def build_postings_index(docs: DataFrame, path: str) -> None:
    """Persist the search index: the query-term postings table plus the
    1-row corpus stats (n_docs, total_dl — BM25 needs them over ALL docs,
    including zero-hit ones, so they can't be rederived from postings).
    The analogue of dedup's persisted sketch side: tokenize once, reuse
    across every delta batch."""
    _postings(docs).write.mode("overwrite").parquet(f"{path}/postings")
    _corpus_stats(docs).write.mode("overwrite").parquet(f"{path}/stats")


def delta_postings(corpus_postings: DataFrame, delta_docs: DataFrame) -> DataFrame:
    """Merge freshly tokenized DELTA postings into the persisted corpus
    postings — the corpus side is a plain parquet scan (no explode, no
    re-tokenization; plan-asserted in tests/test_search.py). Assumes
    delta doc_ids are disjoint from the corpus (append-only ingest), so
    the union keeps the one-row-per-(doc, term) invariant."""
    return corpus_postings.unionByName(_postings(delta_docs))


def bm25_topk_incremental(
    spark, index_path: str, delta_docs: DataFrame, k: int = 10
) -> DataFrame:
    """BM25 over corpus ∪ delta where only the DELTA is tokenized: corpus
    postings/stats come from the persisted index, combined stats are an
    exact bigint sum, and the scoring body is the very same expression
    tree as ``bm25_topk`` — so the result EQUALS bm25_topk(corpus ∪ delta)
    value-for-value (oracled in queries.py).

    At 100 TB this is the O(|delta|) shape: the explode pipeline runs
    over the day's batch, the index scan is column-pruned parquet, and
    df/idf still reflect the full merged corpus."""
    corpus_tf = spark.read.schema(POSTINGS_SCHEMA).parquet(f"{index_path}/postings")
    corpus_stats = spark.read.schema(STATS_SCHEMA).parquet(f"{index_path}/stats")
    tf = delta_postings(corpus_tf, delta_docs)
    stats = (
        corpus_stats.unionByName(_corpus_stats(delta_docs))
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_dl").cast("bigint").alias("total_dl"),
        )
    )
    return _bm25_rank(tf, stats, k)


def bm25_topk_sql(k: int = 10) -> str:
    idf = "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    avgdl = "(total_dl::DOUBLE / n_docs::DOUBLE)"
    denom = f"(tf + {BM25_K1} * (1.0 - {BM25_B} + ({BM25_B} * dl) / {avgdl}))"
    term_score = f"({idf} * (tf * {BM25_K1 + 1.0}) / {denom})"
    return f"""
        WITH qt AS (SELECT * FROM {_query_values_sql()}),
        tf AS ({_postings_sql()}),
        stats AS (
            SELECT count(*) AS n_docs,
                   sum(len({tokens_sql(f"lower({clean_text_sql('text')})")}))::BIGINT AS total_dl
            FROM documents
        ),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        per_doc AS (
            SELECT query, doc_id, {dec_sum_sql(term_score, 6)} AS score
            FROM tf JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
            GROUP BY 1, 2
        )
        SELECT query, doc_id, score, rank FROM (
            SELECT query, doc_id, score,
                   row_number() OVER (
                       PARTITION BY query ORDER BY score DESC, doc_id ASC
                   )::INT AS rank
            FROM per_doc
        ) WHERE rank <= {k}
    """
