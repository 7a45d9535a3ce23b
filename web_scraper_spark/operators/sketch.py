"""Engine-portable HyperLogLog cardinality sketch (Flajolet et al. 2007).

The 100 TB primitive behind "how many distinct tokens / URLs / users does
this corpus have": an exact ``count(distinct x)`` shuffles every distinct
value; the HLL sketch reduces each partition to ``m = 2^p`` small integer
registers that merge with ``max`` — so distributed counting is one
map-side-combined groupBy whose shuffle carries at most ``m`` rows per
group, whatever the data volume, and shard sketches from different days /
machines union losslessly (register-wise max). Spark's built-in
``approx_count_distinct`` is exactly this, but its register state is
JVM-private; this version builds the registers RELATIONALLY from
``hash60`` so the DuckDB oracle reproduces them bit-for-bit and the
driver gate can verify the sketch by value, not by trusting a black box.

Register construction (p bucket bits off a 60-bit hash):

    h      = hash60(token)                 # 60 bits, engine-portable
    bucket = h % 2^p                       # low p bits
    rem    = h >> p                        # the remaining 60-p bits
    rank   = (60-p) - bit_length(rem) + 1  # leading zeros + 1
           = maxrank - length(bin(rem))    # bin() is unpadded in BOTH
                                           # engines; rem = 0 -> maxrank
    M_j    = max rank per bucket           # the register

The oracled output is the exact INTEGER register summary per group —
``m``, ``v_zero`` (empty registers) and the harmonic-sum numerator
``s_num = sum_j 2^(maxrank - M_j)`` (empty registers contribute
``2^maxrank``; with p >= 2 the total is <= 2^(p + maxrank) < 2^63, exact
in BIGINT on both engines) — never the floating-point estimate: the
estimate divides and (in the linear-counting branch) takes a log, whose
last-ulp behaviour the two engines' libm need not share, while the
registers are pure integer arithmetic no engine can round differently.
:func:`hll_estimate` turns a summary row into the cardinality estimate
(standard error 1.04/sqrt(m)); accuracy vs exact distinct counts and the
shard-merge property are pytest-asserted (tests/test_sketch.py).

The reference counts nothing at scale (single pandas frames); this is
the published HLL recipe its 100 TB successor needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.hashing import hash60, hash60_sql
from web_scraper_spark.operators.text import clean_text, clean_text_sql, tokens, tokens_sql

HLL_P = 12  # 4096 registers: ~1.6% standard error, 32 KB of state per group


def _maxrank(p: int) -> int:
    return 60 - p + 1


def hll_registers(docs: DataFrame, p: int = HLL_P) -> DataFrame:
    """Per-``lang`` HLL registers ``(lang, bucket, M)`` over the corpus
    token stream (absent buckets are empty registers). ONE token explode ->
    integer bucket/rank projection (pure codegen) -> one map-side-combined
    groupBy max: every partition collapses to <= m rows per lang BEFORE the
    exchange, which is the entire point of the sketch at 100 TB."""
    m = 1 << p
    mr = _maxrank(p)
    tok = tokens(F.lower(clean_text(F.col("text"))))

    from web_scraper_spark.operators.dedup import _fan_out

    toks = _fan_out(docs.select("lang", "text")).select(
        "lang", F.explode(tok).alias("t")
    )
    h = hash60(F.col("t"))
    rem = F.shiftright(h, p)
    ranked = toks.select(
        "lang",
        (h % m).alias("bucket"),
        F.when(rem == 0, F.lit(mr))
        .otherwise(F.lit(mr) - F.length(F.bin(rem)))
        .cast("int")
        .alias("rank"),
    )
    return ranked.groupBy("lang", "bucket").agg(F.max("rank").alias("M"))


def hll_merge(*reg_frames: DataFrame) -> DataFrame:
    """Union shard sketches losslessly: register-wise max. This is why a
    100 TB count is embarrassingly shardable — per-day / per-machine
    register frames (m rows each) merge with one tiny groupBy; the merged
    summary is IDENTICAL to sketching the concatenated data (pytest-
    asserted)."""
    merged = reg_frames[0]
    for r in reg_frames[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy("lang", "bucket").agg(F.max("M").alias("M"))


def hll_summarize(regs: DataFrame, p: int = HLL_P) -> DataFrame:
    """Register frame -> per-lang integer summary ``(lang, m, v_zero,
    s_num)`` (see module docstring for the exact-integer rationale)."""
    m = 1 << p
    mr = _maxrank(p)
    return (
        regs.groupBy("lang")
        .agg(
            F.count("*").alias("present"),
            # SQL expr: the PySpark shiftleft wrapper only takes an int
            # literal for numBits, the SQL function takes a column
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {mr} - M)")).alias(
                "s_present"
            ),
        )
        .select(
            "lang",
            F.lit(m).cast("bigint").alias("m"),
            (F.lit(m) - F.col("present")).cast("bigint").alias("v_zero"),
            (
                F.col("s_present")
                + (F.lit(m) - F.col("present"))
                * F.shiftleft(F.lit(1).cast("bigint"), mr)
            )
            .cast("bigint")
            .alias("s_num"),
        )
    )


def hll_token_sketch(docs: DataFrame, p: int = HLL_P) -> DataFrame:
    """Per-``lang`` HLL register summary over the corpus token stream:
    ``hll_summarize(hll_registers(docs))`` — one explode, one map-side-
    combined register groupBy, one tiny per-lang rollup. No distinct and
    no shuffle of token text anywhere."""
    return hll_summarize(hll_registers(docs, p), p)


def hll_token_sketch_sql(p: int = HLL_P) -> str:
    m = 1 << p
    mr = _maxrank(p)
    tok = tokens_sql(f"lower({clean_text_sql('text')})")
    h = hash60_sql("t")
    return f"""
        WITH toks AS (
            SELECT lang, unnest({tok}) AS t FROM documents
        ),
        ranked AS (
            SELECT lang,
                   {h} % {m} AS bucket,
                   CASE WHEN ({h} >> {p}) = 0 THEN {mr}
                        ELSE {mr} - length(bin({h} >> {p})) END AS rank
            FROM toks
        ),
        regs AS (
            SELECT lang, bucket, max(rank) AS M
            FROM ranked GROUP BY 1, 2
        )
        SELECT lang,
               {m}::BIGINT AS m,
               ({m} - count(*))::BIGINT AS v_zero,
               (sum((1::BIGINT << ({mr} - M)))
                + ({m} - count(*)) * (1::BIGINT << {mr}))::BIGINT AS s_num
        FROM regs GROUP BY 1
    """


def hll_estimate(m: int, v_zero: int, s_num: int, p: int = HLL_P) -> float:
    """Cardinality estimate from a register summary row (Flajolet et al.
    2007 §4): bias-corrected harmonic mean, with the linear-counting
    small-range correction. Driver/test-side — the oracled query carries
    only the integer state (see module docstring for why)."""
    mr = _maxrank(p)
    alpha = 0.7213 / (1 + 1.079 / m)
    # s_num = sum_j 2^(mr - M_j)  =>  sum_j 2^-M_j = s_num / 2^mr
    e = alpha * m * m * float(1 << mr) / s_num
    if e <= 2.5 * m and v_zero > 0:
        return m * math.log(m / v_zero)
    return e
