"""PMI collocation extraction (Church & Hanks 1990).

Pointwise mutual information over adjacent word pairs is the classic
corpus-linguistics signal for multiword expressions ("hong kong",
"prime minister") — the vocabulary-building step a web-text pipeline
runs before tokenizer training (BPE merges seeded from collocations)
and boilerplate mining (high-PMI pairs recurring across a host are
template text, not prose).

    PMI(w1, w2) = ln p(w1 w2) − ln p(w1) − ln p(w2)

with p from corpus counts: p(w1 w2) = c(g)/N_bi over adjacent-pair
occurrences, p(w) = c(w)/N_uni over token occurrences. Pairs below
``min_count`` are dropped first (Church & Hanks' noise rule: PMI of a
hapax pair is maximal and meaningless), then the top ``top_k`` pairs by
(pmi DESC, gram ASC) are returned with their counts and rank.

Everything is relational, so the stage carries a value-exact DuckDB
oracle. Engine-exactness (the driver hashes VALUES):

- every ln argument is one exact integer-over-integer double ratio
  (``c::DOUBLE / total::DOUBLE``) — identical doubles in both engines;
- the three-term PMI is rounded to 6 dp in one expression (the lm.py /
  dsir.py precedent: a last-ulp libm divergence sits ~10 orders below
  the rounding step), making the sort key a stable 6-dp value;
- the final order is TOTAL ((pmi DESC, gram ASC)) and ranked with the
  two-phase ``with_global_rank`` — never a single-partition window.

Plan shape at 100 TB: two map-side-combined count aggregates over the
exploded tokens/pairs (vocabulary-sized outputs, the lm.py shape), two
driver-scalar totals (bounded collect class), the ``min_count`` filter
BEFORE the two co-partitioned vocabulary joins (so the ranked frame is
the filtered collocation table, a small fraction of the vocabulary),
and the two-phase global rank. Token text never shuffles — only grams
and counts do.

Reference: the scraper's keyword stage splits comma lists verbatim
(/root/reference/preprocessing_data.py keyword handling) — it has no
statistical collocation discovery; this is the published Church & Hanks
capability the graft's vocabulary/boilerplate consumers need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)

MIN_COUNT = 5    # Church & Hanks: drop rare pairs before scoring
TOP_K = 1000     # collocations returned (total-ordered, rank <= TOP_K)


def _tok(text_col):
    return tokens(F.lower(clean_text(text_col)))


def _tok_sql(text_expr: str) -> str:
    return tokens_sql(f"lower({clean_text_sql(text_expr)})")


def pmi_collocations(
    docs: DataFrame, min_count: int = MIN_COUNT, top_k: int = TOP_K
) -> DataFrame:
    """Top-``top_k`` adjacent-pair collocations by PMI.

    Returns (gram, w1, w2, c_pair, c_w1, c_w2, pmi, rnk) for the
    ``top_k`` pairs with corpus frequency >= ``min_count``, ordered by
    (pmi DESC, gram ASC).
    """
    from web_scraper_spark.operators.dedup import _fan_out
    from web_scraper_spark.operators.ranking import with_global_rank

    # _fan_out: a small-SF table is one parquet file; the explode →
    # partial-agg passes would serialize through a single task (the
    # search._postings pathology). No-op at production scale.
    base = _fan_out(docs.select("doc_id", "text")).select(
        _tok(F.col("text")).alias("tok")
    )

    # Eager localCheckpoint (RDD-scoped): each count table feeds its
    # total scalar AND a join below — materialize once, no recompute,
    # no session-lifetime cache.
    uni = (
        base.select(F.explode("tok").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cw"))
        .localCheckpoint(eager=True)
    )
    bi = (
        base.select(F.explode(word_shingles(F.col("tok"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("bigint").alias("c_pair"))
        .localCheckpoint(eager=True)
    )
    # Totals BEFORE the min_count filter (they normalize the full
    # distributions); both are bounded driver scalars (sanctioned class).
    n_uni = uni.select(F.sum("cw")).first()[0] or 0
    n_bi = bi.select(F.sum("c_pair")).first()[0] or 0

    frequent = bi.filter(F.col("c_pair") >= min_count).select(
        "gram",
        F.split(F.col("gram"), " ")[0].alias("w1"),
        F.split(F.col("gram"), " ")[1].alias("w2"),
        "c_pair",
    )
    scored = (
        frequent.join(
            uni.select(F.col("w").alias("w1"), F.col("cw").alias("c_w1")), on="w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cw").alias("c_w2")), on="w2"
        )
        .select(
            "gram",
            "w1",
            "w2",
            "c_pair",
            "c_w1",
            "c_w2",
            F.round(
                F.log(F.col("c_pair").cast("double") / F.lit(float(max(n_bi, 1))))
                - F.log(F.col("c_w1").cast("double") / F.lit(float(max(n_uni, 1))))
                - F.log(F.col("c_w2").cast("double") / F.lit(float(max(n_uni, 1)))),
                6,
            ).alias("pmi"),
        )
    )
    ranked, _handle = with_global_rank(
        scored, [F.col("pmi").desc(), F.col("gram").asc()], "rnk"
    )
    return ranked.filter(F.col("rnk") <= top_k).select(
        "gram",
        "w1",
        "w2",
        "c_pair",
        "c_w1",
        "c_w2",
        "pmi",
        F.col("rnk").cast("bigint").alias("rnk"),
    )


def pmi_collocations_sql(min_count: int = MIN_COUNT, top_k: int = TOP_K) -> str:
    """DuckDB value-exact twin of :func:`pmi_collocations`."""
    tok = _tok_sql("text")
    bi = word_shingles_sql("tok", 2)
    return f"""
        WITH base AS (SELECT {tok} AS tok FROM documents),
        uni AS (
            SELECT w, count(*)::BIGINT AS cw
            FROM (SELECT unnest(tok) AS w FROM base) GROUP BY 1),
        bi AS (
            SELECT gram, count(*)::BIGINT AS c_pair
            FROM (SELECT unnest({bi}) AS gram FROM base) GROUP BY 1),
        tot AS (
            SELECT greatest((SELECT sum(cw) FROM uni), 1)::BIGINT AS n_uni,
                   greatest((SELECT sum(c_pair) FROM bi), 1)::BIGINT AS n_bi),
        scored AS (
            SELECT bi.gram,
                   split_part(bi.gram, ' ', 1) AS w1,
                   split_part(bi.gram, ' ', 2) AS w2,
                   bi.c_pair,
                   u1.cw AS c_w1,
                   u2.cw AS c_w2,
                   round(ln(bi.c_pair::DOUBLE / tot.n_bi::DOUBLE)
                       - ln(u1.cw::DOUBLE / tot.n_uni::DOUBLE)
                       - ln(u2.cw::DOUBLE / tot.n_uni::DOUBLE), 6) AS pmi
            FROM bi
            JOIN uni u1 ON u1.w = split_part(bi.gram, ' ', 1)
            JOIN uni u2 ON u2.w = split_part(bi.gram, ' ', 2)
            CROSS JOIN tot
            WHERE bi.c_pair >= {min_count}),
        ranked AS (
            SELECT *, row_number() OVER (ORDER BY pmi DESC, gram) AS rnk
            FROM scored)
        SELECT gram, w1, w2, c_pair, c_w1, c_w2, pmi, rnk
        FROM ranked WHERE rnk <= {top_k}
    """
