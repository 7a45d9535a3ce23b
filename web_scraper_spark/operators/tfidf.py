"""TF-IDF keyword extraction (Spärck Jones 1972; Salton & Buckley 1988).

Per-document keyword extraction — the top-k terms by term-frequency ×
inverse-document-frequency — is the workhorse summarization signal a
web-text pipeline attaches to every page: related-article linking,
topic labeling seeds, and the per-doc keyword column the reference
scraper stores verbatim from the page's own meta tags
(/root/reference/preprocessing_data.py keyword split) without ever
DERIVING it from the text. This operator derives it.

    tfidf(t, d) = c(t, d) · ln(N / df(t))

with raw in-doc counts c(t,d), document frequency df(t) (docs
containing t at least once), and corpus size N. Terms occurring in
every document have idf 0 and can never outrank a discriminative term —
the classic stopword suppression that needs no stopword list.

Everything is relational and the stage carries a value-exact DuckDB
oracle. Engine-exactness (the driver hashes VALUES):

- the idf argument is one exact integer-over-integer double ratio
  (``N::DOUBLE / df::DOUBLE``), its ln rounded to 6 dp (the lm.py
  precedent — a last-ulp libm divergence sits ~10 orders below the
  rounding step);
- tfidf = integer tf × the 6-dp idf, rounded again to 6 dp — identical
  doubles in both engines;
- the per-doc top-k order is TOTAL ((tfidf DESC, term ASC) within
  doc_id), ranked by a doc_id-PARTITIONED row_number — per-key windows
  scale (one hash shuffle on doc_id); only GLOBAL windows need the
  two-phase rank.

Plan shape at 100 TB: one explode feeding a map-side-combined
(doc_id, term) count (the heavy reduce — output is bounded by distinct
terms per doc, not token volume), df as a second aggregate over the
REDUCED frame (never re-touching raw tokens), N a bounded driver
scalar, one co-partitioned vocabulary join attaching idf, and the
doc_id-partitioned rank window riding the count shuffle's partitioning.
Token text shuffles once, as (doc_id, term) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
)

TOP_K = 5  # keywords per document


def _tok(text_col):
    return tokens(F.lower(clean_text(text_col)))


def _tok_sql(text_expr: str) -> str:
    return tokens_sql(f"lower({clean_text_sql(text_expr)})")


def tfidf_keywords(docs: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """Top-``top_k`` TF-IDF keywords per document.

    Returns (doc_id, term, tf, df, tfidf, rnk) with rnk 1..top_k per
    doc ordered by (tfidf DESC, term ASC).
    """
    from web_scraper_spark.operators.dedup import _fan_out

    # _fan_out: a small-SF table is one parquet file; the explode →
    # partial-agg pass would serialize through a single task (the
    # search._postings pathology). No-op at production scale.
    base = _fan_out(docs.select("doc_id", "text")).select(
        "doc_id", _tok(F.col("text")).alias("tok")
    )
    # Eager localCheckpoint (RDD-scoped): tf feeds the df aggregate AND
    # the join below — one explode pass, no recompute, no session cache.
    tf = (
        base.select("doc_id", F.explode("tok").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = base.filter(F.size("tok") > 0).count()  # bounded driver scalar
    df_t = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))

    scored = tf.join(df_t, on="term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * F.round(
                F.log(F.lit(float(max(n_docs, 1))) / F.col("df").cast("double")), 6
            ),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= top_k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


def tfidf_keywords_sql(top_k: int = TOP_K) -> str:
    """DuckDB value-exact twin of :func:`tfidf_keywords`."""
    tok = _tok_sql("text")
    return f"""
        WITH base AS (SELECT doc_id, {tok} AS tok FROM documents),
        tf AS (
            SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(tok) AS term FROM base)
            GROUP BY 1, 2),
        n AS (SELECT greatest(count(*), 1)::BIGINT AS n_docs
              FROM base WHERE len(tok) > 0),
        df_t AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df_t.df,
                   round(tf.tf * round(
                       ln(n.n_docs::DOUBLE / df_t.df::DOUBLE), 6), 6) AS tfidf
            FROM tf JOIN df_t USING (term) CROSS JOIN n),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
            FROM scored)
        SELECT doc_id, term, tf, df, tfidf, rnk
        FROM ranked WHERE rnk <= {top_k}
    """
