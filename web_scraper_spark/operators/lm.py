"""Bigram language-model perplexity filter (the CCNet KenLM stage).

CCNet's defining quality stage scores every document with a language
model trained on trusted text and buckets the corpus into head / middle
/ tail by perplexity percentile; training pipelines keep head+middle.
KenLM is not in this container, so the model is an in-repo add-k-
smoothed bigram LM — and unlike a KenLM binary, it is FULLY RELATIONAL,
which makes the whole stage DuckDB-oracle-able (the only trained-model
stage in the repo with a value-exact cross-engine twin):

- counts: one map-side-combined groupBy over train-split tokens
  (unigrams) and token bigrams;
- score: explode each doc's bigrams → two co-partitioned joins onto the
  count tables → per-doc aggregate;
- bucket: head/middle/tail thirds by global perplexity rank.

Engine-exactness (the driver hashes VALUES):
- smoothed probability p(w2|w1) = (c(w1w2) + 0.5) / (c(w1) + 0.5·V)
  is computed as the integer-exact double ratio (2c+1)/(2c(w1)+V) —
  both engines divide the same two integers;
- per-bigram ln p is rounded to 6 dp BEFORE aggregation, then averaged
  with the dec_avg decimal contract (exact HALF_UP quotient on both
  engines) — summation order cannot flip a digit;
- perplexity = exp(−avg_logp) rounded to 4 dp (identical double input;
  a last-ulp libm divergence sits ~12 orders below the rounding step);
- the head/middle/tail split uses rank arithmetic (``floor((rank−1)·3 /
  N)`` — the exact ntile() partitioning) over a TOTAL order
  (ppl, doc_id), with the rank produced by the two-phase
  with_global_rank (never a single-partition window).

Docs with fewer than 2 tokens have no bigrams and are excluded (they are
the trivial-short class the heuristic gate already drops).

Reference: the scraper has no LM stage (it stores everything); this is
the published CCNet recipe the graft's training-data consumers need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.analytics import dec_avg, dec_avg_sql
from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)

SMOOTH_NUM = 1  # add-k with k = 0.5, as the integer ratio (2c+1)/(2cw1+V)
TRAIN_MOD = 5   # doc_id % TRAIN_MOD != 0 trains the LM; every doc is scored


def _tok(text_col):
    return tokens(F.lower(clean_text(text_col)))


def _tok_sql(text_expr: str) -> str:
    return tokens_sql(f"lower({clean_text_sql(text_expr)})")


def lm_perplexity(docs: DataFrame, train_mod: int = TRAIN_MOD) -> DataFrame:
    """Per-document bigram-LM perplexity + head/middle/tail bucket.

    Plan shape at 100 TB: two count aggregates over the train split (map-
    side combined, keys are tokens/bigrams), then score = one explode of
    the full corpus joined to the two count tables on their natural keys
    (co-partitioned shuffle joins — the count tables are corpus-vocabulary
    sized, NOT broadcastable at scale, and never carry text beyond the
    gram itself), one per-doc aggregate, and the two-phase global rank.
    """
    from web_scraper_spark.operators.ranking import with_global_rank

    base = docs.select("doc_id", _tok(F.col("text")).alias("tok"))
    train = base.filter(F.col("doc_id") % train_mod != 0)

    # eager localCheckpoint (RDD-scoped): the count table is both counted
    # for V and joined below — materialize once, no recompute, no
    # session-lifetime cache. V itself is a bounded driver scalar (the
    # sanctioned collect class), keeping the plan free of SinglePartition
    # exchanges entirely.
    uni = (
        train.select(F.explode("tok").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
        .localCheckpoint(eager=True)
    )
    v = uni.count()
    bi = (
        train.select(F.explode(word_shingles(F.col("tok"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cg"))
    )

    grams = base.select(
        "doc_id", F.explode(word_shingles(F.col("tok"), 2)).alias("g")
    ).withColumn("w1", F.split(F.col("g"), " ")[0])
    scored = (
        grams.join(bi, on="g", how="left")
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cw", "cw1"),
              on="w1", how="left")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (2 * F.coalesce(F.col("cg"), F.lit(0)) + SMOOTH_NUM).cast("double")
                    / (2 * F.coalesce(F.col("cw1"), F.lit(0)) + F.lit(v)).cast("double")
                ),
                6,
            ).alias("lnp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        dec_avg(F.col("lnp"), 6).alias("avg_logp"),
    ).withColumn("ppl", F.round(F.exp(-F.col("avg_logp")), 4))

    ranked, _handle = with_global_rank(
        per_doc, [F.col("ppl").asc(), F.col("doc_id").asc()], "_rank"
    )
    # N over the rank-checkpointed frame: another bounded driver scalar
    n = ranked.count()
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "avg_logp",
        "ppl",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            (F.floor((F.col("_rank") - 1) * 3 / F.lit(max(n, 1))) + 1).cast("int"),
        ).alias("bucket"),
    )


def lm_perplexity_sql(train_mod: int = TRAIN_MOD) -> str:
    tok = _tok_sql("text")
    bi = word_shingles_sql("tok", 2)
    return f"""
        WITH base AS (SELECT doc_id, {tok} AS tok FROM documents),
        uni AS (
            SELECT w, count(*) AS cw
            FROM (SELECT unnest(tok) AS w FROM base WHERE doc_id % {train_mod} != 0)
            GROUP BY 1
        ),
        vocab AS (SELECT count(*) AS v FROM uni),
        bi AS (
            SELECT g, count(*) AS cg
            FROM (SELECT unnest({bi}) AS g FROM base WHERE doc_id % {train_mod} != 0)
            GROUP BY 1
        ),
        grams AS (
            SELECT doc_id, g, split_part(g, ' ', 1) AS w1
            FROM (SELECT doc_id, unnest({bi}) AS g FROM base)
        ),
        scored AS (
            SELECT grams.doc_id,
                   round(ln(
                       (2 * coalesce(bi.cg, 0) + {SMOOTH_NUM})::DOUBLE
                       / (2 * coalesce(uni.cw, 0) + vocab.v)::DOUBLE
                   ), 6) AS lnp
            FROM grams
            LEFT JOIN bi USING (g)
            LEFT JOIN uni ON uni.w = grams.w1
            CROSS JOIN vocab
        ),
        per_doc AS (
            SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   {dec_avg_sql('lnp', 6)} AS avg_logp
            FROM scored GROUP BY 1
        ),
        ranked AS (
            SELECT doc_id, n_bigrams, avg_logp,
                   round(exp(-avg_logp), 4) AS ppl,
                   row_number() OVER (
                       ORDER BY round(exp(-avg_logp), 4), doc_id) AS rnk,
                   count(*) OVER () AS n
            FROM per_doc
        )
        SELECT doc_id, n_bigrams, avg_logp, ppl,
               (['head', 'middle', 'tail'])[
                   (floor((rnk - 1) * 3 / n) + 1)::INT] AS bucket
        FROM ranked
    """
