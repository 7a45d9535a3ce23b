"""HyperLogLog token-cardinality sketch (operators/sketch.py).

Value-exactness of the register summary vs DuckDB is covered by the
oracle replica (hll_cardinality is a registered oracled query); these
tests pin what SQL can't: estimate ACCURACY vs exact distinct counts in
both HLL branches, the lossless shard-merge property (the 100 TB
sharding story), and partition invariance.
"""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators import sketch as sk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def _vocab_docs(spark, lang, n_distinct, tokens_per_doc=200, reps=2):
    """Documents whose token stream covers exactly n_distinct tokens,
    each appearing `reps`+ times (duplicates must not move the sketch)."""
    words = [f"{lang}_tok{i}" for i in range(n_distinct)]
    rows, did = [], 0
    for _ in range(reps):
        for i in range(0, n_distinct, tokens_per_doc):
            rows.append((did, " ".join(words[i : i + tokens_per_doc]), lang))
            did += 1
    return _docs(spark, rows)


def test_hll_estimate_accuracy_harmonic_branch(spark):
    # 60k distinct >> 2.5*m (m=4096): the bias-corrected harmonic branch.
    # Standard error is 1.04/sqrt(4096) ~ 1.6%; assert a 3-sigma bound.
    n = 60_000
    out = sk.hll_token_sketch(_vocab_docs(spark, "en", n)).collect()
    assert len(out) == 1
    est = sk.hll_estimate(out[0]["m"], out[0]["v_zero"], out[0]["s_num"])
    assert abs(est - n) / n < 0.05


def test_hll_estimate_accuracy_linear_counting_branch(spark):
    # 500 distinct << 2.5*m: the linear-counting correction, much tighter
    n = 500
    out = sk.hll_token_sketch(_vocab_docs(spark, "fr", n)).collect()
    est = sk.hll_estimate(out[0]["m"], out[0]["v_zero"], out[0]["s_num"])
    assert abs(est - n) / n < 0.03


def test_hll_duplicates_never_move_the_sketch(spark):
    # the defining property: registers depend on the SET of tokens only
    once = sk.hll_token_sketch(_vocab_docs(spark, "de", 2_000, reps=1))
    five = sk.hll_token_sketch(_vocab_docs(spark, "de", 2_000, reps=5))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, five.collect()))


def test_hll_shard_merge_is_lossless(spark):
    # sketch(A ∪ B) == summarize(merge(registers(A), registers(B))),
    # including overlapping vocabulary between the shards
    a = _vocab_docs(spark, "en", 3_000)
    b_words = [f"en_tok{i}" for i in range(2_000, 5_000)]  # overlaps a
    b = _docs(
        spark,
        [(i, " ".join(b_words[i * 200 : (i + 1) * 200]), "en") for i in range(15)],
    )
    whole = sk.hll_token_sketch(a.unionByName(b))
    merged = sk.hll_summarize(sk.hll_merge(sk.hll_registers(a), sk.hll_registers(b)))
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_partition_invariance(spark):
    docs = _vocab_docs(spark, "es", 4_000)
    one = sk.hll_token_sketch(docs.repartition(1))
    many = sk.hll_token_sketch(docs.repartition(17, "doc_id"))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_hll_plan_map_side_combine_no_distinct(spark):
    docs = _vocab_docs(spark, "zh", 1_000)
    plan = (
        sk.hll_token_sketch(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial aggregation before the exchange (the sketch's whole point),
    # and no expensive exact-distinct machinery anywhere
    assert "partial_max" in plan or "HashAggregate" in plan
    assert "distinct" not in plan.lower()
    assert "SinglePartition" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_estimate_is_overestimate_and_tight_on_heavy_hitters(spark):
    # 'heavy' appears 400x, a long tail of 300 singletons; with w=2048
    # and only 301 distinct tokens, the heavy hitter's min-cell is almost
    # surely collision-free -> est == exact; and est >= exact ALWAYS.
    rows = [(0, " ".join(["heavy"] * 400), "en")]
    rows += [(i + 1, f"tail{i}", "en") for i in range(300)]
    docs = _docs(spark, rows)
    out = {r["token"]: r for r in sk.cms_topk(docs, k=5).collect()}
    assert out["heavy"]["exact"] == 400
    assert out["heavy"]["est"] == 400  # top cell collision-free at this load
    top = sk.cms_topk(docs, k=5).collect()
    assert top[0]["token"] == "heavy"
    assert all(r["est"] >= r["exact"] for r in top)


def test_cms_shard_merge_is_lossless(spark):
    a = _vocab_docs(spark, "en", 500)
    b = _vocab_docs(spark, "en", 800)  # overlapping vocabulary
    whole = sk.cms_registers(a.unionByName(b))
    merged = sk.cms_merge(sk.cms_registers(a), sk.cms_registers(b))
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_cms_partition_invariance(spark):
    docs = _vocab_docs(spark, "fr", 1_000)
    one = sk.cms_registers(docs.repartition(1))
    many = sk.cms_registers(docs.repartition(13, "doc_id"))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_cms_probe_join_is_broadcast(spark):
    docs = _vocab_docs(spark, "en", 200)
    plan = sk.cms_topk(docs)._jdf.queryExecution().executedPlan().toString()
    # the register frame (<= d*w rows) must reach the probe join as a
    # broadcast, and nothing in the sketch may serialize to one task
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Binned quantile sketch
# ---------------------------------------------------------------------------


def test_quantile_sketch_brackets_exact_percentiles(spark, sf_dir):
    """The sketch's bin lower edge must sit within one bin width of the
    exact interpolated percentile (the quantization-error bound)."""
    from web_scraper_spark.queries import q_quality_percentiles, q_quantile_sketch

    exact = {r["lang"]: r for r in q_quality_percentiles(spark, sf_dir).collect()}
    approx = {}
    for r in q_quantile_sketch(spark, sf_dir).collect():
        approx.setdefault(r["lang"], {})[r["pct"]] = float(r["q_lo"])
    width = 1.0 / sk.QSK_BINS
    for lang, rows in approx.items():
        for pct, col in ((25, "p25"), (50, "p50"), (90, "p90")):
            # lower-edge rule: q_lo <= exact percentile < q_lo + width
            # (interpolated exact can sit a hair past the edge; allow
            # one extra width for the interpolation-vs-rank difference)
            assert rows[pct] - width <= exact[lang][col] <= rows[pct] + 2 * width


def test_quantile_histogram_shard_merge_is_lossless(spark):
    a = _vocab_docs(spark, "en", 300)
    b = _vocab_docs(spark, "en", 700)
    whole = sk.quantile_histogram(a.unionByName(b))
    merged = sk.quantile_merge(sk.quantile_histogram(a), sk.quantile_histogram(b))
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_quantile_sketch_window_is_lang_partitioned(spark, sf_dir):
    from web_scraper_spark.queries import q_quantile_sketch

    plan = (
        q_quantile_sketch(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan and "CartesianProduct" not in plan
