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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — heavy-hitter counting
# ---------------------------------------------------------------------------
#
# The companion point-FREQUENCY sketch to HLL's cardinality: d hash rows of
# w counters; update adds 1 to one counter per row, the point query reads
# the MINIMUM of a token's d counters (always an overestimate, off by at
# most eN/w with probability 1-(1/2)^d-ish). The state is d*w integers —
# mergeable by cell-wise SUM, so per-shard / per-day sketches roll up with
# one tiny groupBy exactly like the HLL registers roll up with max. Built
# RELATIONALLY from the seeded hash60 family so the DuckDB oracle
# reproduces every counter bit-for-bit (same portability argument as HLL:
# integer state only, no float estimate in the oracled surface).

CMS_D = 4     # depth: 4 independent hash rows
CMS_W = 2048  # width: overestimate <= e*N/2048 per row, before taking min


def cms_registers(docs: DataFrame, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Corpus token-frequency CMS: ``(depth, bucket, cnt)``, absent cells
    are zero. One token explode fanned ×d by a literal depth array (pure
    codegen), then ONE map-side-combined groupBy — every partition
    collapses to <= d*w rows before the exchange, the whole point at
    100 TB."""
    from web_scraper_spark.operators.dedup import _fan_out
    from web_scraper_spark.operators.hashing import seeded_hash60

    tok = tokens(F.lower(clean_text(F.col("text"))))
    toks = _fan_out(docs.select("text")).select(F.explode(tok).alias("t"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("depth"),
                        (seeded_hash60(s, F.col("t")) % w).alias("bucket"),
                    )
                    for s in range(d)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.depth", "cell.bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )


def cms_merge(*reg_frames: DataFrame) -> DataFrame:
    """Union shard sketches losslessly: cell-wise sum (pytest-asserted
    identical to sketching the concatenated corpus)."""
    merged = reg_frames[0]
    for r in reg_frames[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_topk(
    docs: DataFrame, k: int = 20, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Top-k corpus tokens by CMS estimate: ``(token, exact, est)``,
    est = min over the d rows of the token's counter (>= exact always;
    == exact when none of its d cells collides). The candidate probe is
    an exact token groupBy (which also yields ``exact`` for the
    overestimate check); the sketch's scale value is the MERGEABLE d*w
    register state — cross-shard rollup never re-touches token text —
    and the probe join is a broadcast (the register frame is <= d*w rows
    by construction, plan-asserted)."""
    from web_scraper_spark.operators.dedup import _fan_out
    from web_scraper_spark.operators.hashing import seeded_hash60

    regs = cms_registers(docs, d, w)
    tok = tokens(F.lower(clean_text(F.col("text"))))
    toks = _fan_out(docs.select("text")).select(F.explode(tok).alias("t"))
    exact = toks.groupBy("t").agg(F.count("*").cast("bigint").alias("exact"))
    probes = exact.select(
        "t",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("depth"),
                        (seeded_hash60(s, F.col("t")) % w).alias("bucket"),
                    )
                    for s in range(d)
                ]
            )
        ).alias("cell"),
    ).select("t", "exact", "cell.depth", "cell.bucket")
    est = (
        probes.join(F.broadcast(regs), ["depth", "bucket"])
        .groupBy("t", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    return (
        est.orderBy(F.col("est").desc(), F.col("t").asc())
        .limit(k)
        .select(F.col("t").alias("token"), "exact", "est")
    )


def cms_topk_sql(k: int = 20, d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB twin of :func:`cms_topk` over the ``documents`` view."""
    tok = tokens_sql(f"lower({clean_text_sql('text')})")
    h = hash60_sql("CAST(depth AS VARCHAR) || ':' || t")
    depths = ", ".join(str(s) for s in range(d))
    return f"""
        WITH toks AS (
            SELECT unnest({tok}) AS t FROM documents
        ),
        cells AS (
            SELECT depth, {h} % {w} AS bucket, count(*)::BIGINT AS cnt
            FROM toks CROSS JOIN (SELECT unnest([{depths}]) AS depth) ds
            GROUP BY 1, 2
        ),
        exact AS (
            SELECT t, count(*)::BIGINT AS exact FROM toks GROUP BY 1
        ),
        probes AS (
            SELECT t, exact, depth, {h} % {w} AS bucket
            FROM exact CROSS JOIN (SELECT unnest([{depths}]) AS depth) ds
        )
        SELECT p.t AS token, p.exact, min(c.cnt) AS est
        FROM probes p
        JOIN cells c ON c.depth = p.depth AND c.bucket = p.bucket
        GROUP BY 1, 2
        ORDER BY est DESC, token ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Binned quantile sketch — the third mergeable-sketch family
# ---------------------------------------------------------------------------
#
# HLL answers "how many distinct", CMS answers "how often", this answers
# "where do the quantiles sit" — with the same distributed contract: the
# state is a FIXED-SIZE integer histogram (counts per value bin) that
# merges across shards by cell-wise sum, so a 100 TB quantile estimate is
# one map-side-combined groupBy whose shuffle carries <= bins rows per
# group, and per-day shards roll up losslessly. Spark's built-in
# approx_percentile (Greenwald-Khanna) is JVM-private state; the
# fixed-bin histogram trades a bounded, KNOWN quantization error
# (1/bins on a [0,1] domain) for integer state both engines reproduce
# bit-for-bit. Quantile rule: value v_p = lower edge of the first bin
# whose cumulative count reaches ceil(p%·n/100) — pure integer
# arithmetic (no p·n double product to round differently).

QSK_BINS = 1000  # 0.001 quantization on the [0,1] score domain


def quantile_histogram(docs: DataFrame, bins: int = QSK_BINS) -> DataFrame:
    """Per-``lang`` histogram of the C4 quality score: (lang, bin, cnt),
    bin = floor(score·bins) clamped to bins−1 (score = 1.0 lands in the
    top bin). The score is the 6-dp-rounded double both engines compute
    identically, so the IEEE product score·bins and its floor are
    bit-identical cross-engine. Map-side combine collapses every
    partition to <= bins rows per lang before the exchange."""
    from web_scraper_spark.operators.text import quality_columns

    score = quality_columns("text")["quality_score"]
    b = F.least(
        F.floor(score * F.lit(float(bins))).cast("bigint"), F.lit(bins - 1)
    )
    return (
        docs.select("lang", b.alias("bin"))
        .groupBy("lang", "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def quantile_merge(*hist_frames: DataFrame) -> DataFrame:
    """Union shard histograms losslessly: cell-wise sum (pytest-asserted
    identical to sketching the concatenated corpus)."""
    merged = hist_frames[0]
    for h in hist_frames[1:]:
        merged = merged.unionByName(h)
    return merged.groupBy("lang", "bin").agg(F.sum("cnt").alias("cnt"))


def binned_quantiles(
    docs: DataFrame, pcts: tuple = (25, 50, 90), bins: int = QSK_BINS
) -> DataFrame:
    """Approximate per-lang quality-score quantiles off the histogram:
    (lang, pct, qbin, q_lo) where qbin is the first bin whose cumulative
    count reaches ceil(pct·n/100) (integer arithmetic end-to-end) and
    q_lo = qbin/bins is its lower edge as an exact DECIMAL. The
    cumulative window is partitioned by lang over <= bins rows — never a
    data-sized window."""
    from pyspark.sql import Window

    hist = quantile_histogram(docs, bins)
    w = (
        Window.partitionBy("lang")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "lang",
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in pcts])).alias("pct")
    hit = cum.select("lang", "bin", "cum", "n", p).where(
        F.col("cum") >= F.expr("CAST((n * pct + 99) DIV 100 AS BIGINT)")
    )
    return (
        hit.groupBy("lang", "pct")
        .agg(F.min("bin").alias("qbin"))
        .select(
            "lang",
            F.col("pct").cast("bigint").alias("pct"),
            "qbin",
            (F.col("qbin").cast("decimal(18,6)") / bins)
            .cast("decimal(18,6)")
            .alias("q_lo"),
        )
    )


def binned_quantiles_sql(pcts: tuple = (25, 50, 90), bins: int = QSK_BINS) -> str:
    """DuckDB twin of :func:`binned_quantiles` over ``documents``."""
    from web_scraper_spark.operators.text import quality_sql

    score = quality_sql("text")["quality_score"]
    plist = ", ".join(str(int(x)) for x in pcts)
    return f"""
        WITH binned AS (
            SELECT lang,
                   least(CAST(floor(({score}) * {float(bins)}) AS BIGINT),
                         {bins - 1}) AS bin
            FROM documents
        ),
        hist AS (
            SELECT lang, bin, count(*)::BIGINT AS cnt
            FROM binned GROUP BY 1, 2
        ),
        cum AS (
            SELECT lang, bin,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cnt) OVER (PARTITION BY lang) AS n
            FROM hist
        ),
        hit AS (
            SELECT lang, pct, bin, cum, n
            FROM cum CROSS JOIN (SELECT unnest([{plist}]) AS pct) ps
            WHERE cum >= (n * pct + 99) // 100
        )
        SELECT lang, pct::BIGINT AS pct, min(bin) AS qbin,
               CAST(CAST(min(bin) AS DECIMAL(18,6)) / {bins}
                    AS DECIMAL(18,6)) AS q_lo
        FROM hit GROUP BY 1, 2
    """
