"""Corpus-curation operators: decontamination / PII scrub / repetition.

Value-exactness vs DuckDB is covered by the oracle replica
(tests/oracle_check.py — decontaminate / pii_scrub / repetition_stats are
registered oracled queries); these tests pin the SEMANTICS on constructed
edge cases the parquet corpus can't produce, plus the plan shape that
must survive 100 TB (broadcast gram join, no cartesian products).
"""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators import curation as cu


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

BENCH_TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi"
)


def test_decontaminate_flags_benchmark_copies(spark):
    rows = [
        (0, BENCH_TEXT),  # benchmark (doc_id % 25 == 0)
        (7, "intro words " + BENCH_TEXT + " outro words"),  # contains bench 8-grams
        (9, "totally unrelated words one two three four five six seven eight nine"),
    ]
    out = {r["doc_id"]: r for r in cu.decontaminate(_docs(spark, rows)).collect()}
    assert set(out) == {7, 9}  # benchmark docs excluded from the corpus output
    assert out[7]["contaminated"] and out[7]["n_overlap"] > 0
    # contained copy: every bench 8-gram appears in doc 7 → overlap = bench
    # gram count = 16 tokens → 9 distinct 8-grams
    assert out[7]["n_overlap"] == 9
    assert not out[9]["contaminated"] and out[9]["n_overlap"] == 0


def test_decontaminate_short_docs_empty_gramset(spark):
    rows = [(0, BENCH_TEXT), (1, "too short for an eight gram")]  # 6 tokens < 8
    out = cu.decontaminate(_docs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_grams"] == 0 and not out[0]["contaminated"]


def test_decontaminate_plan_broadcasts_bench_grams(spark):
    rows = [(i, BENCH_TEXT + f" filler{i}") for i in range(60)]
    plan = cu.decontaminate(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    # the benchmark gram inventory must arrive as a broadcast, and nothing
    # in the plan may degenerate to a cartesian product
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------

def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (1, "mail me at a.b-c_d@sub.example.org or root@x.io thanks"),
        (2, "server 10.0.255.3 then call +84-24-3826-8037 done"),
        (3, "clean text with no pii at all"),
    ]
    out = {r["doc_id"]: r for r in cu.pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert "[EMAIL]" in out[1]["scrubbed"] and "@" not in out[1]["scrubbed"]
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 1, 1)
    assert "[IP]" in out[2]["scrubbed"] and "[PHONE]" in out[2]["scrubbed"]
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 0, 0)


def test_pii_scrub_synthesizes_on_mod7(spark):
    # doc_id % 7 == 0 gets deterministic synthetic PII appended (so the
    # redaction paths always see real targets on the PII-free corpus)
    rows = [(14, "base text"), (15, "base text")]
    out = {r["doc_id"]: r for r in cu.pii_scrub(_docs(spark, rows)).collect()}
    assert (out[14]["n_emails"], out[14]["n_ips"], out[14]["n_phones"]) == (1, 1, 1)
    s = out[14]["scrubbed"]
    assert "[EMAIL]" in s and "[IP]" in s and "[PHONE]" in s
    assert out[15]["scrubbed"] == "base text"


def test_pii_scrub_is_idempotent(spark):
    rows = [(1, "x@y.com and 1.2.3.4 and +1-555-0100")]
    first = cu.pii_scrub(_docs(spark, rows)).collect()[0]["scrubbed"]
    again = cu.pii_scrub(
        spark.createDataFrame([(1, first)], "doc_id bigint, text string")
    ).collect()[0]
    assert again["scrubbed"] == first
    assert (again["n_emails"], again["n_ips"], again["n_phones"]) == (0, 0, 0)


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------

def test_repetition_flags_degenerate_doc(spark):
    rows = [
        (1, "spam " * 50),            # one token repeated: everything dups
        (2, "all distinct words here make a healthy document sample"),
    ]
    out = {r["doc_id"]: r for r in cu.repetition_stats(_docs(spark, rows)).collect()}
    d = out[1]
    assert d["n_tokens"] == 50
    assert d["top_token_frac"] == 1.0
    assert d["top_2gram_frac"] == 1.0 and d["dup_2gram_frac"] == 1.0
    assert d["dup_3gram_frac"] == 1.0
    assert d["flagged"]
    h = out[2]
    assert h["dup_2gram_frac"] == 0.0 and h["dup_3gram_frac"] == 0.0
    assert not h["flagged"]
    # 9 distinct tokens → top_token_frac = 1/9
    assert h["top_token_frac"] == pytest.approx(round(1 / 9, 6))


def test_repetition_short_and_empty_docs(spark):
    rows = [(1, ""), (2, "one"), (3, "one two")]
    out = {r["doc_id"]: r for r in cu.repetition_stats(_docs(spark, rows)).collect()}
    assert out[1]["n_tokens"] == 0 and out[1]["top_token_frac"] == 0.0
    assert not out[1]["flagged"]
    assert out[2]["n_tokens"] == 1 and out[2]["top_2gram_frac"] == 0.0
    assert out[3]["n_tokens"] == 2 and out[3]["top_2gram_frac"] == 1.0
    assert out[3]["dup_2gram_frac"] == 0.0  # the one 2-gram occurs once


def test_repetition_partial_duplication_fractions(spark):
    # "a b a b c": tokens a×2 b×2 c×1 → top 2/5; 2-grams: ab×2, ba×1, bc×1
    # → top 2/4, dup 2/4; 3-grams: aba, bab, abc all distinct → dup 0
    rows = [(1, "a b a b c")]
    d = cu.repetition_stats(_docs(spark, rows)).collect()[0]
    assert d["top_token_frac"] == 0.4
    assert d["top_2gram_frac"] == 0.5
    assert d["dup_2gram_frac"] == 0.5
    assert d["dup_3gram_frac"] == 0.0
    assert d["flagged"]  # top_2gram_frac 0.5 > 0.20


# ---------------------------------------------------------------------------
# line_dedup (CCNet-style, first occurrence wins)
# ---------------------------------------------------------------------------

# exactly 2 chunks of 12 tokens
_24_TOKENS = " ".join(f"w{i}" for i in range(24))


def test_line_dedup_first_occurrence_wins(spark):
    rows = [(1, _24_TOKENS), (2, _24_TOKENS)]  # doc 2 is a full copy
    out = {r["doc_id"]: r for r in cu.line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 0
    assert out[2]["dup_line_frac"] == 1.0


def test_line_dedup_within_doc_repeat_and_short_doc(spark):
    # doc 1: same 12-token chunk twice -> second occurrence is a dup;
    # doc 2: 3 tokens -> one short line, unique; doc 3: empty -> 0 lines
    chunk = " ".join(f"t{i}" for i in range(12))
    rows = [(1, chunk + " " + chunk), (2, "just three tokens"), (3, "")]
    out = {r["doc_id"]: r for r in cu.line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["dup_line_frac"] == 0.5
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 1
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_frac"] == 0.0


def test_line_dedup_plan_window_is_hash_partitioned(spark):
    rows = [(i, _24_TOKENS + f" doc{i}") for i in range(40)]
    plan = cu.line_dedup(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# stratified_sample (deterministic mixture quotas)
# ---------------------------------------------------------------------------

def _mix_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_stratified_sample_integer_quotas(spark):
    # avail: en=4, es=2; weights 50/50 -> caps en 8, es 4 -> N=4 -> quota 2+2
    rows = [(i, "x", "en", "s") for i in range(4)] + [
        (10 + i, "x", "es", "s") for i in range(2)
    ]
    out = cu.stratified_sample(
        _mix_docs(spark, rows), weights={"en": 50, "es": 50}
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 2, "es": 2}
    assert all(r["samp_rank"] <= 2 for r in out)


def test_stratified_sample_missing_stratum_empties_mix(spark):
    # a weighted lang with zero availability caps N at 0 -> nothing sampled
    rows = [(i, "x", "en", "s") for i in range(5)]
    out = cu.stratified_sample(
        _mix_docs(spark, rows), weights={"en": 50, "zh": 50}
    ).collect()
    assert out == []


def test_stratified_sample_deterministic_and_excludes_unweighted(spark):
    rows = [(i, "x", ["en", "fr"][i % 2], f"s{i % 3}") for i in range(30)]
    w = {"en": 60, "fr": 40}
    a = sorted(tuple(r) for r in cu.stratified_sample(_mix_docs(spark, rows), w).collect())
    b = sorted(tuple(r) for r in cu.stratified_sample(_mix_docs(spark, rows), w).collect())
    assert a == b and len(a) > 0
    out = cu.stratified_sample(_mix_docs(spark, rows), weights={"en": 100}).collect()
    assert {r["lang"] for r in out} == {"en"}


# ---------------------------------------------------------------------------
# dup_spans (substring-level dedup accounting, Lee et al. 2022)
# ---------------------------------------------------------------------------

_W = "w%d"  # distinct filler vocabulary per position


def _words(n, start=0, tag=""):
    return " ".join(f"{tag}w{start + i}" for i in range(n))


def test_dup_spans_shared_passage_exact_extent(spark):
    # a 12-token passage shared by two otherwise-unique docs: with k=8 the
    # duplicated anchors are positions of grams fully inside the passage,
    # so the reported span covers exactly the 12 shared tokens in each doc
    passage = _words(12, tag="shared_")
    rows = [
        (1, _words(10, tag="a_") + " " + passage + " " + _words(10, tag="b_")),
        (2, _words(10, tag="c_") + " " + passage + " " + _words(10, tag="d_")),
    ]
    out = {r["doc_id"]: r for r in cu.dup_spans(_docs(spark, rows)).collect()}
    for d in (1, 2):
        assert out[d]["n_tokens"] == 32
        assert out[d]["n_spans"] == 1
        assert out[d]["dup_tokens"] == 12
        assert out[d]["longest_span"] == 12
        assert abs(out[d]["dup_frac"] - 12 / 32) < 1e-9


def test_dup_spans_within_doc_repeat_and_clean_docs(spark):
    # repetition of an 8-gram WITHIN one globally-unique doc still counts
    # (count>=2 is corpus-wide, including same-doc); clean docs report zeros
    block = _words(8, tag="rep_")
    rows = [
        (1, block + " " + _words(5, tag="mid_") + " " + block),
        (2, _words(20, tag="clean_")),
        (3, "short doc"),  # < k tokens: zero grams, zero spans
    ]
    out = {r["doc_id"]: r for r in cu.dup_spans(_docs(spark, rows)).collect()}
    assert out[1]["n_spans"] == 2  # the two copies are > k apart -> 2 islands
    assert out[1]["dup_tokens"] == 16 and out[1]["longest_span"] == 8
    assert out[2]["n_spans"] == 0 and out[2]["dup_tokens"] == 0
    assert out[2]["dup_frac"] == 0.0
    assert out[3]["n_tokens"] == 2 and out[3]["n_spans"] == 0


def test_dup_spans_adjacent_windows_merge_into_one_island(spark):
    # two anchors exactly k apart produce touching windows -> ONE span of 2k
    body = _words(16, tag="dbl_")  # 16 tokens = anchors at 0..8; dup'ing the
    rows = [(1, body), (2, body)]  # whole doc -> one island covering all 16
    out = {r["doc_id"]: r for r in cu.dup_spans(_docs(spark, rows)).collect()}
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 16 and out[1]["dup_frac"] == 1.0


def test_dup_spans_plan_no_text_shuffle_no_single_partition_window(spark):
    rows = [(i, _words(30, tag=f"d{i}_")) for i in range(8)]
    df = cu.dup_spans(_docs(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # both windows are partitioned by doc_id — never a global sort
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# strip_dup_spans (first-wins substring removal, Lee et al. 2022)
# ---------------------------------------------------------------------------


def test_strip_dup_spans_keeps_corpus_first_occurrence(spark):
    # a shared 12-token passage survives only in the lowest-doc_id host
    passage = _words(12, tag="shared_")
    rows = [
        (1, _words(10, tag="a_") + " " + passage),
        (2, _words(10, tag="c_") + " " + passage + " " + _words(10, tag="d_")),
    ]
    out = {r["doc_id"]: r for r in cu.strip_dup_spans(_docs(spark, rows)).collect()}
    assert out[1]["n_removed"] == 0 and passage in out[1]["text_clean"]
    assert out[2]["n_removed"] == 12 and passage not in out[2]["text_clean"]
    assert out[2]["text_clean"] == _words(10, tag="c_") + " " + _words(10, tag="d_")


def test_strip_dup_spans_within_doc_repeat_keeps_first_copy(spark):
    block = _words(8, tag="rep_")
    rows = [(1, block + " " + _words(5, tag="mid_") + " " + block)]
    out = cu.strip_dup_spans(_docs(spark, rows)).collect()[0]
    assert out["n_removed"] == 8
    assert out["text_clean"] == block + " " + _words(5, tag="mid_")


def test_strip_dup_spans_case_insensitive_match_original_case_output(spark):
    # grams match case-insensitively; the survivor keeps its original case
    passage = _words(9, tag="Mixed_")
    rows = [
        (1, passage),                      # first occurrence, mixed case
        (2, passage.lower() + " " + _words(9, tag="tail_")),  # lower copy
    ]
    out = {r["doc_id"]: r for r in cu.strip_dup_spans(_docs(spark, rows)).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == passage
    assert out[2]["n_removed"] == 9
    assert out[2]["text_clean"] == _words(9, tag="tail_")


def test_strip_dup_spans_empty_and_short_docs(spark):
    rows = [(1, ""), (2, "just a few words")]
    out = {r["doc_id"]: r for r in cu.strip_dup_spans(_docs(spark, rows)).collect()}
    assert out[1]["n_tokens"] == 0 and out[1]["text_clean"] == ""
    assert out[2]["n_removed"] == 0 and out[2]["text_clean"] == "just a few words"


# ---------------------------------------------------------------------------
# domain_stats (per-source triage rollup)
# ---------------------------------------------------------------------------


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_domain_stats_flags_mirror_farm(spark):
    # host B mirrors host A's pages verbatim: every mirrored doc counts as
    # a dup on BOTH hosts (corpus-wide membership), and B gets flagged
    pages = [_words(30, start=i * 50, tag="p_") for i in range(4)]
    rows = (
        [(i, pages[i], "a.example") for i in range(4)]
        + [(10 + i, pages[i], "b.mirror") for i in range(3)]  # 3 of 4 mirrored
        + [(20, _words(30, tag="own_"), "b.mirror")]          # 1 original
    )
    out = {r["source"]: r for r in cu.domain_stats(_src_docs(spark, rows)).collect()}
    assert out["a.example"]["n_docs"] == 4 and out["a.example"]["dup_docs"] == 3
    assert out["b.mirror"]["n_docs"] == 4 and out["b.mirror"]["dup_docs"] == 3
    assert out["b.mirror"]["dup_frac"] == 0.75 and out["b.mirror"]["flagged"]
    # a.example is ALSO above the 0.5 dup threshold here — corpus-wide
    # membership is symmetric by design (the gate drops whichever side
    # the pipeline ranks lower; the rollup just reports)
    assert out["a.example"]["flagged"]


def test_domain_stats_flags_low_quality_host(spark):
    # digit-soup host: per-doc quality collapses, host flagged on quality
    junk = " ".join("1234567890" for _ in range(40))
    good = ("the quick brown fox and the lazy dog were found in the field "
            "and they were both very happy about it all day long")
    rows = [(i, junk, "spam.example") for i in range(3)] + [
        (10 + i, good + f" extra{i}", "ok.example") for i in range(3)
    ]
    out = {r["source"]: r for r in cu.domain_stats(_src_docs(spark, rows)).collect()}
    assert out["spam.example"]["avg_quality"] < 0.5
    assert out["spam.example"]["flagged"]
    assert out["ok.example"]["avg_quality"] > 0.5
    assert not out["ok.example"]["flagged"]


def test_domain_stats_dup_key_is_normalized(spark):
    # exact_dedup's key: md5(lower(whitespace-clean)) — case and spacing
    # variants of one page are the same content
    rows = [
        (1, "Shared   Page Body here", "x.example"),
        (2, "shared page body HERE", "y.example"),
    ]
    out = {r["source"]: r for r in cu.domain_stats(_src_docs(spark, rows)).collect()}
    assert out["x.example"]["dup_docs"] == 1
    assert out["y.example"]["dup_docs"] == 1


# ---------------------------------------------------------------------------
# source_kl (per-source distribution drift)
# ---------------------------------------------------------------------------


def test_source_kl_zero_for_identical_distributions(spark):
    # two sources with the SAME token mix: KL exactly 0 for both
    text = "alpha beta gamma alpha beta gamma"
    rows = [(1, text, "s1"), (2, text, "s2")]
    out = {r["source"]: r for r in cu.source_kl(_src_docs(spark, rows)).collect()}
    assert out["s1"]["kl_divergence"] == 0.0
    assert out["s2"]["kl_divergence"] == 0.0
    assert out["s1"]["n_tokens"] == 6 and out["s1"]["n_types"] == 3


def test_source_kl_matches_numpy_twin(spark):
    # skewed source vs a varied one: KL computed independently in numpy
    # with the SAME 6-dp ln rounding must agree to the dec_sum contract
    import math
    from collections import Counter

    rows = [
        (1, "spam spam spam spam spam ham", "skew.example"),
        (2, "one two three four five six", "flat.example"),
    ]
    per_source = {
        "skew.example": Counter("spam spam spam spam spam ham".split()),
        "flat.example": Counter("one two three four five six".split()),
    }
    corpus = Counter()
    for c in per_source.values():
        corpus.update(c)
    n_tot = sum(corpus.values())

    def kl(src):
        n_s = sum(per_source[src].values())
        s = 0.0
        for t, c_st in per_source[src].items():
            ratio = (c_st * n_tot) / (n_s * corpus[t])
            s += (c_st / n_s) * round(math.log(ratio), 6)
        return round(s, 6)

    out = {r["source"]: r for r in cu.source_kl(_src_docs(spark, rows)).collect()}
    for src in per_source:
        assert abs(out[src]["kl_divergence"] - kl(src)) < 5e-6, src
    # the skewed source diverges more than the flat one here (flat's
    # tokens are rarer corpus-wide, but spam dominates skew's mass)
    assert out["skew.example"]["kl_divergence"] > 0
    assert out["flat.example"]["kl_divergence"] > 0
