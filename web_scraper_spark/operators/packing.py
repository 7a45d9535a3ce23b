"""Sequence packing for LLM pretraining (concat-and-chunk accounting).

The standard GPT-style pretraining data layout concatenates the token
stream of the whole corpus in a deterministic document order and cuts it
into fixed-size context windows ("packing"; Radford et al. 2019 train on
the concatenated stream, T5/Raffel et al. 2020 pack multiple documents
per sequence; Ding et al. 2024 study the truncation cost). The operator
every packing pipeline needs first is the PLACEMENT MAP: where does each
document land in the global token stream, which chunks does it touch,
and does a chunk boundary split it?

    start(d)     = Σ tokens of all documents before d   (exclusive cumsum)
    pack_first   = floor(start / B)
    pack_last    = floor((start + n_tokens − 1) / B)    (n_tokens > 0)
    crosses      = pack_last > pack_first

with B the context budget in tokens. All integer arithmetic — the DuckDB
oracle is value-exact by construction.

The global exclusive prefix sum is THE scale hazard here: a naive
``Window.orderBy`` with no partitionBy funnels the corpus through one
task. This uses :func:`operators.ranking.with_global_cumsum` — the
repo's two-phase construction (range repartition, partitioned window,
per-partition totals folded in as broadcast literal offsets), so the
plan has one range exchange and a metadata-sized offsets job, never a
SinglePartition window (plan-asserted in tests/test_packing.py).

The reference has no training-data tier at all; this follows the
published packing recipe. Token counts use the whitespace tokenizer
(operators/text.tokens) so the oracle twin is expressible; swapping in
the trained BPE count (pipeline/bpe.py) is a one-column change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.ranking import with_global_cumsum
from web_scraper_spark.operators.text import (
    clean_text,
    clean_text_sql,
    tokens,
    tokens_sql,
)

PACK_BUDGET = 512  # context-window budget in tokens


def pack_chunks(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per-document placement in the concat-and-chunk token stream.

    Returns (doc_id, n_tokens, start_tok, pack_first, pack_last,
    n_packs_spanned, crosses_boundary), documents ordered by doc_id in
    the stream. Zero-token documents occupy no stream positions: they
    report the pack their start offset falls in and never cross.
    """
    sized = docs.select(
        "doc_id",
        F.size(tokens(F.lower(clean_text(F.col("text")))))
        .cast("bigint")
        .alias("n_tokens"),
    )
    out, _handle = with_global_cumsum(
        sized, ["doc_id"], "n_tokens", "start_tok"
    )
    # integer DIV, not floor(double /): double division is exact only to
    # 2^53 token offsets — DIV keeps the map exact at any corpus size
    pack_first = F.expr(f"CAST(start_tok DIV {budget} AS BIGINT)")
    pack_last = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"CAST((start_tok + n_tokens - 1) DIV {budget} AS BIGINT)"),
    ).otherwise(pack_first).cast("bigint")
    return out.select(
        "doc_id",
        "n_tokens",
        "start_tok",
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_last - pack_first + 1).cast("bigint").alias("n_packs_spanned"),
        (pack_last > pack_first).alias("crosses_boundary"),
    )


def pack_chunks_sql(budget: int = PACK_BUDGET) -> str:
    """DuckDB value-exact twin of :func:`pack_chunks`."""
    tok = tokens_sql(f"lower({clean_text_sql('text')})")
    return f"""
        WITH sized AS (
            SELECT doc_id, len({tok})::BIGINT AS n_tokens FROM documents
        ),
        placed AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS start_tok
            FROM sized
        ),
        packs AS (
            SELECT doc_id, n_tokens, start_tok,
                   (start_tok // {budget})::BIGINT AS pack_first,
                   (CASE WHEN n_tokens > 0
                         THEN (start_tok + n_tokens - 1) // {budget}
                         ELSE start_tok // {budget}
                    END)::BIGINT AS pack_last
            FROM placed
        )
        SELECT doc_id, n_tokens, start_tok, pack_first, pack_last,
               (pack_last - pack_first + 1)::BIGINT AS n_packs_spanned,
               (pack_last > pack_first) AS crosses_boundary
        FROM packs
    """
