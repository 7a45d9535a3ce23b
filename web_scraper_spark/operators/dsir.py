"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The published recipe for picking pretraining data that "looks like" a
trusted target domain: featurize every document as hashed n-gram counts,
fit bag-of-hashed-ngram unigram models on the target split and on the
raw pool, weight each raw document by its importance ratio
``log p_target(x) - log p_raw(x)``, then resample with Gumbel top-k
(sampling without replacement proportional to the weights).

Everything is relational, so the whole stage carries a value-exact
DuckDB oracle — and unlike the CCNet LM stage (operators/lm.py), whose
count tables are corpus-vocabulary sized and must shuffle-join, DSIR's
feature space is FIXED at ``B_BUCKETS`` rows: at 100 TB the bucket
model is one map-side-combined aggregate collapsing to <=4096 rows,
then a BROADCAST join onto the exploded grams. No vocabulary-sized
shuffle anywhere; the only corpus-sized exchanges are the per-doc
aggregate and the two-phase global rank.

Engine-exactness (the driver hashes VALUES):
- features are unigrams + word bigrams hashed with the oracle-portable
  ``hash60`` into ``B_BUCKETS`` buckets;
- bucket probabilities are add-one-smoothed integer ratios
  ``(c_b + 1) / (total + B)`` — both engines divide the same integers;
- the per-gram log ratio ``ln p_t(b) - ln p_r(b)`` is rounded to 6 dp
  BEFORE aggregation (the lm.py precedent: a last-ulp libm divergence
  sits ~10 orders below the rounding step), then summed with the
  ``dec_sum`` decimal contract so summation order cannot flip a digit;
- Gumbel noise is derandomized through the portable hash:
  ``u = (hash60('dsir:' || doc_id) + 1) / (2^60 + 2)`` lies strictly in
  (0,1) and is the identical double in both engines, so
  ``g = -ln(-ln(u))`` (rounded 6 dp) is the classic Gumbel-top-k draw
  with a deterministic, engine-portable seed;
- selection takes the top ``n // KEEP_DEN`` raw docs by
  ``(gkey DESC, doc_id)`` — a TOTAL order ranked with the two-phase
  ``with_global_rank`` (never a single-partition window).

Docs with zero tokens have no grams and are excluded (the trivial-empty
class the heuristic gate already drops).

Reference: the scraper keeps every crawled article unconditionally
(/root/reference/Scrapy_TT.py, Scrapy_VNE.py store straight to CSV);
importance-based selection is the published-DSIR capability the graft's
training-data consumers need on top of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.analytics import dec_sum, dec_sum_sql
from web_scraper_spark.operators.hashing import hash60, hash60_sql
from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)

B_BUCKETS = 4096   # hashed feature space: fixed-size, broadcastable
TARGET_MOD = 7     # doc_id % TARGET_MOD == 0 is the trusted target split
KEEP_DEN = 4       # resample keeps the top n // KEEP_DEN raw docs
_U_DEN = (1 << 60) + 2  # even, < 2^63: exactly representable as a double


def _tok(text_col):
    return tokens(F.lower(clean_text(text_col)))


def _tok_sql(text_expr: str) -> str:
    return tokens_sql(f"lower({clean_text_sql(text_expr)})")


def dsir_sample(
    docs: DataFrame,
    target_mod: int = TARGET_MOD,
    n_buckets: int = B_BUCKETS,
    keep_den: int = KEEP_DEN,
) -> DataFrame:
    """Per-raw-document DSIR importance weight + Gumbel top-k selection.

    Returns (doc_id, n_grams, logw, gkey, rnk, selected) for every raw
    (non-target) document with at least one gram.

    Plan shape at 100 TB: ONE pass over the exploded grams feeding a
    map-side-combined groupBy that collapses to <= n_buckets rows (both
    splits counted in the same aggregate via conditional sums), a
    driver-scalar total (bounded collect class), a broadcast of the
    <=4096-row log-ratio table back onto the raw grams, one per-doc
    aggregate, and the two-phase global rank.
    """
    from web_scraper_spark.operators.dedup import _fan_out
    from web_scraper_spark.operators.ranking import with_global_rank

    # _fan_out: a small-SF table is one parquet file; both explode →
    # partial-agg passes would serialize through a single task (the
    # search._postings pathology). No-op at production scale.
    base = _fan_out(docs.select("doc_id", "text")).select(
        "doc_id",
        (F.col("doc_id") % target_mod == 0).alias("is_t"),
        _tok(F.col("text")).alias("tok"),
    )
    bkt = base.select(
        "doc_id",
        "is_t",
        F.explode(F.concat(F.col("tok"), word_shingles(F.col("tok"), 2))).alias("g"),
    ).select("doc_id", "is_t", (hash60(F.col("g")) % n_buckets).alias("b"))

    # Both splits in one aggregate: <= n_buckets output rows, partial
    # (map-side) combine below the exchange. Eager localCheckpoint: the
    # frame feeds the totals scalar AND the broadcast join — materialize
    # once, RDD-scoped storage, no session-lifetime cache.
    counts = (
        bkt.groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("bigint").alias("c_t"),
            F.sum(F.when(F.col("is_t"), 0).otherwise(1)).cast("bigint").alias("c_r"),
        )
        .localCheckpoint(eager=True)
    )
    tot_t, tot_r = counts.select(
        F.sum("c_t").cast("bigint"), F.sum("c_r").cast("bigint")
    ).first()

    lnr = counts.select(
        "b",
        F.round(
            F.log((F.col("c_t") + 1).cast("double") / F.lit(float(tot_t + n_buckets)))
            - F.log((F.col("c_r") + 1).cast("double") / F.lit(float(tot_r + n_buckets))),
            6,
        ).alias("lnr"),
    )

    per_doc = (
        bkt.filter(~F.col("is_t"))
        .join(F.broadcast(lnr), on="b", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            dec_sum(F.col("lnr"), 6).alias("logw"),
        )
    )

    # Derandomized Gumbel: u in (0,1) strictly, identical double in both
    # engines; the inner round(.,6) fixes the libm ulp, the outer one
    # makes the sum a stable 6-dp key.
    u = (hash60(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))) + 1).cast(
        "double"
    ) / F.lit(float(_U_DEN))
    keyed = per_doc.withColumn(
        "gkey", F.round(F.col("logw") + F.round(-F.log(-F.log(u)), 6), 6)
    )

    ranked, _handle = with_global_rank(
        keyed, [F.col("gkey").desc(), F.col("doc_id").asc()], "rnk"
    )
    n = ranked.count()  # bounded driver scalar (sanctioned class)
    return ranked.select(
        "doc_id",
        "n_grams",
        "logw",
        "gkey",
        F.col("rnk").cast("bigint").alias("rnk"),
        (F.col("rnk") <= F.lit(n // keep_den)).alias("selected"),
    )


def dsir_sample_sql(
    target_mod: int = TARGET_MOD,
    n_buckets: int = B_BUCKETS,
    keep_den: int = KEEP_DEN,
) -> str:
    """DuckDB value-exact twin of :func:`dsir_sample`."""
    tok = _tok_sql("text")
    bi = word_shingles_sql("tok", 2)
    return f"""
        WITH base AS (
            SELECT doc_id, doc_id % {target_mod} = 0 AS is_t, {tok} AS tok
            FROM documents),
        bkt AS (
            SELECT doc_id, is_t, {hash60_sql('g')} % {n_buckets} AS b
            FROM (SELECT doc_id, is_t, unnest(tok || {bi}) AS g FROM base)),
        counts AS (
            SELECT b,
                   sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS c_t,
                   sum(CASE WHEN is_t THEN 0 ELSE 1 END)::BIGINT AS c_r
            FROM bkt GROUP BY 1),
        tot AS (SELECT sum(c_t)::BIGINT AS t, sum(c_r)::BIGINT AS r FROM counts),
        lnr AS (
            SELECT b,
                   round(ln((c_t + 1)::DOUBLE / (t + {n_buckets})::DOUBLE)
                       - ln((c_r + 1)::DOUBLE / (r + {n_buckets})::DOUBLE),
                       6) AS lnr
            FROM counts CROSS JOIN tot),
        per_doc AS (
            SELECT doc_id, count(*)::BIGINT AS n_grams,
                   {dec_sum_sql('lnr.lnr', 6)} AS logw
            FROM (SELECT doc_id, b FROM bkt WHERE NOT is_t)
            LEFT JOIN lnr USING (b)
            GROUP BY 1),
        keyed AS (
            SELECT doc_id, n_grams, logw,
                   round(logw + round(-ln(-ln(
                       ({hash60_sql("'dsir:' || doc_id::VARCHAR")} + 1)::DOUBLE
                       / {_U_DEN}::DOUBLE)), 6), 6) AS gkey
            FROM per_doc),
        ranked AS (
            SELECT doc_id, n_grams, logw, gkey,
                   row_number() OVER (ORDER BY gkey DESC, doc_id) AS rnk,
                   count(*) OVER () AS n
            FROM keyed)
        SELECT doc_id, n_grams, logw, gkey, rnk,
               rnk <= n // {keep_den} AS selected
        FROM ranked
    """
