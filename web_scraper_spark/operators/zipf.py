"""Zipf-law fit of the corpus frequency distribution (Zipf 1949).

Natural-language token frequencies follow ``freq ∝ rank^(-s)`` with
s ≈ 1 (Zipf 1949; Piantadosi 2014 reviews the fits) — and DEVIATION
from the power law is a working corpus-quality signal: boilerplate
floods flatten the head, spam and generated soup distort the tail. The
fit is the per-language least-squares line over
``(x, y) = (ln rank, ln freq)``:

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

The engine-exactness problem is the SUMS: Σxy etc. are float sums and
double addition is summation-order dependent — the exact failure class
the repo's money contract (operators/analytics.dec_sum) exists for. So
every per-term value is rounded to 6 dp (killing last-ulp libm ln
divergence, the lm.py precedent) and summed as DECIMAL(18,6) — decimal
addition of 6-dp values is EXACT and therefore associative, so any
partial-aggregation order yields the identical sum in both engines; the
closed form then runs on identical doubles.

The reference fits LDA topic models but never characterizes its corpus
distribution (/root/reference/ConnectAndSave.py:198-208); this follows
the published diagnostic.

Plan shape at 100 TB: one explode → map-side-combined (lang, term)
count (output vocabulary-sized, the tfidf/lm shape — the only pass over
token volume), then ONE lang exchange of the vocabulary-sized count
table that both the rank window and the final per-lang aggregate ride.
Token text shuffles once, as (lang, term) pairs; everything after is
vocabulary-sized.
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

MIN_TERMS = 10  # languages with fewer distinct terms than this are skipped


def zipf_fit(docs: DataFrame, min_terms: int = MIN_TERMS) -> DataFrame:
    """Per-language Zipf fit over the token frequency distribution.

    Returns (lang, n_terms, n_tokens, zipf_slope, zipf_intercept); a
    Zipfian corpus has slope ≈ −1. Ties in frequency break by term so
    both engines rank identically.
    """
    from web_scraper_spark.operators.dedup import _fan_out

    tok = tokens(F.lower(clean_text(F.col("text"))))
    tf = (
        _fan_out(docs.select("lang", "text"))
        .select("lang", F.explode(tok).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), "term")
    xy = tf.select(
        "lang",
        "freq",
        F.round(F.log(F.row_number().over(w).cast("double")), 6).alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6).alias("y"),
    ).select(
        "lang",
        "freq",
        "x",
        "y",
        F.round(F.col("x") * F.col("y"), 6).alias("xy"),
        F.round(F.col("x") * F.col("x"), 6).alias("xx"),
    )
    agg = xy.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("freq").cast("bigint").alias("n_tokens"),
        dec_sum(F.col("x"), 6).alias("sx"),
        dec_sum(F.col("y"), 6).alias("sy"),
        dec_sum(F.col("xy"), 6).alias("sxy"),
        dec_sum(F.col("xx"), 6).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.round((n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom, 6)
    intercept = F.round((F.col("sy") - slope * F.col("sx")) / n, 6)
    return agg.where(F.col("n_terms") >= min_terms).select(
        "lang",
        "n_terms",
        "n_tokens",
        slope.alias("zipf_slope"),
        intercept.alias("zipf_intercept"),
    )


def zipf_fit_sql(min_terms: int = MIN_TERMS) -> str:
    """DuckDB value-exact twin of :func:`zipf_fit`."""
    tok = tokens_sql(f"lower({clean_text_sql('text')})")
    return f"""
        WITH tf AS (
            SELECT lang, term, count(*)::BIGINT AS freq
            FROM (SELECT lang, unnest({tok}) AS term FROM documents)
            GROUP BY 1, 2
        ),
        xy0 AS (
            SELECT lang, freq,
                   round(ln((row_number() OVER (
                       PARTITION BY lang
                       ORDER BY freq DESC, term))::DOUBLE), 6) AS x,
                   round(ln(freq::DOUBLE), 6) AS y
            FROM tf
        ),
        xy AS (
            SELECT lang, freq, x, y,
                   round(x * y, 6) AS xy, round(x * x, 6) AS xx
            FROM xy0
        ),
        agg AS (
            SELECT lang,
                   count(*)::BIGINT AS n_terms,
                   sum(freq)::BIGINT AS n_tokens,
                   {dec_sum_sql('x', 6)} AS sx,
                   {dec_sum_sql('y', 6)} AS sy,
                   {dec_sum_sql('xy', 6)} AS sxy,
                   {dec_sum_sql('xx', 6)} AS sxx
            FROM xy GROUP BY 1
        )
        SELECT lang, n_terms, n_tokens,
               round((n_terms * sxy - sx * sy)
                     / (n_terms * sxx - sx * sx), 6) AS zipf_slope,
               round((sy - round((n_terms * sxy - sx * sy)
                                 / (n_terms * sxx - sx * sx), 6) * sx)
                     / n_terms, 6) AS zipf_intercept
        FROM agg
        WHERE n_terms >= {min_terms}
    """
