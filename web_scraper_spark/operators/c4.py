"""C4-style page/line cleaning rules (Raffel et al. 2020, §2.2).

The published C4 heuristics, restated over the repo's synthesized line
boundary (the parquet corpus is newline-free word soup — TESTDATA.md —
so "lines" are fixed 12-token chunks, the same pluggable boundary rule
as operators/curation.line_dedup; the PLAN SHAPE and the rules are what
must survive 100 TB, the boundary detector is config):

per line —
- terminal-punctuation flag: the line ends in ``. ! ? "`` (REPORTED as a
  count; on the punctuation-free synthetic corpus the flag is uniformly
  false, so it gates nothing there — the planted-text tests enforce the
  gating variant with real punctuation);
- short-line rule: lines with fewer than 5 words are dropped;
- the word "javascript" drops the line;

per page —
- any bad word drops the page (C4 uses the public "List of Dirty,
  Naughty …" list; the list here is a small stand-in, config like
  text.LANG_MARKERS);
- "lorem ipsum" anywhere drops the page;
- a curly brace ``{`` anywhere drops the page (code, not prose);
- pages with fewer than 3 kept lines are dropped (C4's "fewer than 3
  sentences" restated on kept lines).

The reference has no curation tier (its dedup is the per-URL seen set,
/root/reference/CrawlPaperTuoiTre.py:60-66); this implements the public
C4 recipe.

Plan shape at 100 TB: page-level flags are whole-stage-codegen scalar
expressions on the document scan; the line tier is ONE struct-array
build (single HOF column — evaluated once, no projection-collapse
re-run) → explode of (doc_id, line flags) rows — line TEXT itself never
leaves the pre-explode projection — → one map-side-combined rollup on
doc_id. One shuffle total, carrying small flag tuples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import tokens, tokens_sql

LINE_TOKENS = 12  # synthetic line = 12-token chunk (line_dedup's boundary)
MIN_LINE_WORDS = 5  # C4: "only retained lines that contained at least 5 words"
MIN_KEPT_LINES = 3  # C4: "discarded any page with fewer than 3 sentences"

# Stand-in for C4's public bad-words list (config, like text.LANG_MARKERS).
BAD_WORDS = ["viagra", "casino", "xxx", "webcam"]

TERMINAL_PUNCT_RE = r'[.!?"]$'


def _line_structs(text_col, chunk: int):
    """Array of per-line structs {li, nw, punct, js}: index, word count,
    terminal-punctuation flag, contains-javascript flag. ONE transform
    column so the interpreted HOF runs once per document."""
    trimmed = F.trim(text_col)
    # empty text must yield ZERO lines: Spark's split('') is [''] (size 1),
    # so guard explicitly — the DuckDB twin has the matching CASE.
    raw = F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))  # original casing for punct
    n_chunks = F.ceil(F.size(raw) / F.lit(chunk)).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def mk(i):
        line_toks = F.slice(raw, i * chunk + 1, chunk)
        line = F.array_join(line_toks, " ")
        return F.struct(
            i.alias("li"),
            F.size(line_toks).cast("bigint").alias("nw"),
            (F.regexp_count(line, F.lit(TERMINAL_PUNCT_RE)) > 0).alias("punct"),
            F.lower(line).contains("javascript").alias("js"),
        )

    return F.transform(idx, mk)


def c4_filters(
    docs: DataFrame,
    chunk: int = LINE_TOKENS,
    require_punct: bool = False,
) -> DataFrame:
    """Per-document C4 cleaning accounting + disposition.

    Returns (doc_id, n_lines, n_kept, n_short, n_js, n_punct_lines,
    has_badword, has_lorem, has_brace, disposition). A line is kept iff
    it has >= MIN_LINE_WORDS words, does not mention javascript, and —
    when ``require_punct`` (the faithful C4 mode, exercised by the
    planted-text tests) — ends in terminal punctuation.
    """
    from web_scraper_spark.operators.dedup import _fan_out

    # NULL text behaves as empty text (0 lines, flags false) — the twin
    # coalesces identically, so nullable corpora can't desync the oracle
    txt = F.coalesce(F.col("text"), F.lit(""))
    low = F.lower(txt)
    tok = tokens(low)
    # _fan_out: the explode below feeds a partial aggregate; on a
    # single-file small-SF scan that stage would run in ONE task (the
    # search._postings pathology). No-op at production scale.
    page = _fan_out(docs).select(
        "doc_id",
        F.arrays_overlap(tok, F.array(*[F.lit(w) for w in BAD_WORDS])).alias(
            "has_badword"
        ),
        low.contains("lorem ipsum").alias("has_lorem"),
        txt.contains("{").alias("has_brace"),
        F.explode_outer(_line_structs(txt, chunk)).alias("s"),
    )
    kept = (F.col("s.nw") >= MIN_LINE_WORDS) & ~F.col("s.js")
    if require_punct:
        kept = kept & F.col("s.punct")
    lines = page.select(
        "doc_id",
        "has_badword",
        "has_lorem",
        "has_brace",
        F.coalesce(kept, F.lit(False)).alias("kept"),
        F.coalesce(F.col("s.nw") < MIN_LINE_WORDS, F.lit(False)).alias("short"),
        F.coalesce(F.col("s.js"), F.lit(False)).alias("js"),
        F.coalesce(F.col("s.punct"), F.lit(False)).alias("punct"),
        F.col("s.li").isNotNull().alias("is_line"),
    )
    per = lines.groupBy("doc_id", "has_badword", "has_lorem", "has_brace").agg(
        F.sum(F.col("is_line").cast("bigint")).alias("n_lines"),
        F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        F.sum(F.col("short").cast("bigint")).alias("n_short"),
        F.sum(F.col("js").cast("bigint")).alias("n_js"),
        F.sum(F.col("punct").cast("bigint")).alias("n_punct_lines"),
    )
    disposition = (
        F.when(F.col("has_badword"), F.lit("drop_badword"))
        .when(F.col("has_lorem"), F.lit("drop_lorem"))
        .when(F.col("has_brace"), F.lit("drop_brace"))
        .when(F.col("n_kept") < MIN_KEPT_LINES, F.lit("drop_few_lines"))
        .otherwise(F.lit("keep"))
    )
    return per.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "n_short",
        "n_js",
        "n_punct_lines",
        "has_badword",
        "has_lorem",
        "has_brace",
        disposition.alias("disposition"),
    )


def c4_filters_sql(chunk: int = LINE_TOKENS, require_punct: bool = False) -> str:
    """DuckDB value-exact twin of :func:`c4_filters`."""
    bad = "[" + ", ".join(f"'{w}'" for w in BAD_WORDS) + "]"
    # coalesce mirrors the Spark side: NULL text = empty text
    tok = tokens_sql("lower(coalesce(text, ''))")
    punct_gate = "AND s.punct " if require_punct else ""
    return f"""
        WITH raw AS (
            SELECT doc_id,
                   list_has_any({tok}, {bad}) AS has_badword,
                   contains(lower(coalesce(text, '')), 'lorem ipsum')
                       AS has_lorem,
                   contains(coalesce(text, ''), '{{') AS has_brace,
                   (CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN []
                         ELSE regexp_split_to_array(
                                  trim(coalesce(text, '')), '\\s+')
                    END) AS rt
            FROM documents
        ),
        structs AS (
            SELECT doc_id, has_badword, has_lorem, has_brace,
                   list_transform(
                       range(ceil(len(rt) / {chunk}.0)::BIGINT),
                       i -> {{
                           'li': i,
                           'nw': len(rt[(i*{chunk}+1):(i*{chunk}+{chunk})]),
                           'punct': regexp_matches(
                               array_to_string(
                                   rt[(i*{chunk}+1):(i*{chunk}+{chunk})], ' '),
                               '{TERMINAL_PUNCT_RE}'),
                           'js': contains(lower(array_to_string(
                               rt[(i*{chunk}+1):(i*{chunk}+{chunk})], ' ')),
                               'javascript')
                       }}) AS ls
            FROM raw
        ),
        lines AS (
            SELECT doc_id, has_badword, has_lorem, has_brace,
                   unnest(
                       CASE WHEN len(ls) = 0
                            THEN [{{'li': NULL::BIGINT, 'nw': NULL::BIGINT,
                                    'punct': NULL::BOOLEAN,
                                    'js': NULL::BOOLEAN}}]
                            ELSE ls END) AS s
            FROM structs
        ),
        per AS (
            SELECT doc_id, has_badword, has_lorem, has_brace,
                   sum(CASE WHEN s.li IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                       AS n_lines,
                   sum(CASE WHEN coalesce(
                           s.nw >= {MIN_LINE_WORDS} AND NOT s.js {punct_gate},
                           false) THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                   sum(CASE WHEN coalesce(s.nw < {MIN_LINE_WORDS}, false)
                       THEN 1 ELSE 0 END)::BIGINT AS n_short,
                   sum(CASE WHEN coalesce(s.js, false)
                       THEN 1 ELSE 0 END)::BIGINT AS n_js,
                   sum(CASE WHEN coalesce(s.punct, false)
                       THEN 1 ELSE 0 END)::BIGINT AS n_punct_lines
            FROM lines GROUP BY 1, 2, 3, 4
        )
        SELECT doc_id, n_lines, n_kept, n_short, n_js, n_punct_lines,
               has_badword, has_lorem, has_brace,
               (CASE WHEN has_badword THEN 'drop_badword'
                     WHEN has_lorem THEN 'drop_lorem'
                     WHEN has_brace THEN 'drop_brace'
                     WHEN n_kept < {MIN_KEPT_LINES} THEN 'drop_few_lines'
                     ELSE 'keep' END) AS disposition
        FROM per
    """
