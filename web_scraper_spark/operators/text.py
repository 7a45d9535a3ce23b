"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Maps the reference's text pipeline to native Catalyst expressions
(SURVEY.md X2/X7/X8/X9, ConnectAndSave.py:25-29,79-84;
preprocessing_extract_entity.py:36-118) and adds the training-data-pipeline
ops a 100 TB corpus needs: token counting, quality scoring, language ID,
document fingerprinting. Everything here is a pure Column expression —
whole-stage-codegen JVM-side, no Python in the hot path — and every
function has an exact DuckDB-SQL twin so the driver's oracle can verify
values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from web_scraper_spark.operators.hashing import hash60, hash60_sql

# A small cross-language stopword inventory for the language-ID heuristic.
# Real corpora would load per-language lists (the reference ships a 1,941-entry
# Vietnamese list, vietnamese_stopwords.txt); the mechanism — broadcast array +
# arrays_overlap/array_intersect — is what scales, the lists are config.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["for", "on", "with", "as", "by", "at"]

# BPE-ish pretokenizer: letter runs | digit runs | single non-space symbol.
# (The GPT-2 pretokenizer splits on the same class boundaries; this is the
# regex-only approximation that needs no vocab.)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def clean_text(col: Column) -> Column:
    """X2 whitespace-clean: trim + collapse runs of whitespace to one space."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def clean_text_sql(expr: str) -> str:
    return f"regexp_replace(trim({expr}), '\\s+', ' ', 'g')"


def tokens(col: Column) -> Column:
    """Whitespace tokens of cleaned text (empty text → empty array)."""
    cleaned = clean_text(col)
    return F.when(F.length(cleaned) == 0, F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


def tokens_sql(expr: str) -> str:
    c = clean_text_sql(expr)
    return f"(CASE WHEN length({c}) = 0 THEN [] ELSE string_split({c}, ' ') END)"


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Word k-shingles as strings; fewer than k tokens → empty array.

    Guarded because Spark's ``sequence(1, n)`` with n < 1 would generate a
    DESCENDING sequence (negative default step) while DuckDB's
    generate_series returns empty — the CASE keeps both engines identical.
    """
    n = F.size(tok)
    mk = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok, i, k)),
    )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(mk)


def word_shingles_sql(tok_expr: str, k: int = 3) -> str:
    return (
        f"(CASE WHEN len({tok_expr}) < {k} THEN [] ELSE "
        f"list_transform(generate_series(1, len({tok_expr}) - {k - 1}), "
        f"i -> array_to_string(({tok_expr})[i:i+{k - 1}], ' ')) END)"
    )


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pretokenizer (regexp, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0)).cast("bigint")


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_TOKEN_RE}'))::BIGINT"


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Per-document quality features + composite score.

    Heuristics follow the C4/Gopher-style quality rules: documents that are
    too short, too symbol-heavy, or carry no stopwords are low-quality.
    All ratios rounded to 6 dp so Spark and the oracle hash identically.
    """
    t = F.col(text_col)
    tok = tokens(t)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(tok).cast("bigint")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\-]", ""))
    n_stop = F.size(F.filter(tok, lambda x: F.lower(x).isin(EN_STOPWORDS)))
    avg_tok = F.round(n_chars.cast("double") / safe_tokens, 6)
    alpha_ratio = F.round(n_alpha / safe_chars, 6)
    digit_ratio = F.round(n_digit / safe_chars, 6)
    punct_ratio = F.round(n_punct / safe_chars, 6)
    stop_ratio = F.round(n_stop / safe_tokens, 6)
    score = F.round(
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.35
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(5.0), F.lit(1.0))) * 0.15,
        6,
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_tok,
        "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_sql(text_expr: str = "text") -> dict[str, str]:
    t = text_expr
    tok = tokens_sql(t)
    stop_list = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    n_chars = f"length({t})::BIGINT"
    n_tokens = f"len({tok})::BIGINT"
    safe_chars = f"greatest(length({t}), 1)::DOUBLE"
    safe_tokens = f"greatest(len({tok}), 1)::DOUBLE"
    n_alpha = f"length(regexp_replace({t}, '[^A-Za-z]', '', 'g'))"
    n_digit = f"length(regexp_replace({t}, '[^0-9]', '', 'g'))"
    n_punct = f"length(regexp_replace({t}, '[^.,;:!?''\"()\\-]', '', 'g'))"
    n_stop = f"len(list_filter({tok}, x -> list_contains({stop_list}, lower(x))))"
    alpha_ratio = f"round({n_alpha} / {safe_chars}, 6)"
    digit_ratio = f"round({n_digit} / {safe_chars}, 6)"
    stop_ratio = f"round({n_stop} / {safe_tokens}, 6)"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": f"round({n_chars}::DOUBLE / {safe_tokens}, 6)",
        "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio,
        "punct_ratio": f"round({n_punct} / {safe_chars}, 6)",
        "stopword_ratio": stop_ratio,
        "quality_score": (
            f"round(least(len({tok})::DOUBLE / 64.0, 1.0) * 0.25"
            f" + {alpha_ratio} * 0.35"
            f" + least({stop_ratio} * 4.0, 1.0) * 0.25"
            f" + (1.0 - least({digit_ratio} * 5.0, 1.0)) * 0.15, 6)"
        ),
    }


# ---------------------------------------------------------------------------
# Language ID (marker-word scoring; charset-aware)
# ---------------------------------------------------------------------------

def _marker_test(markers: list[str]):
    # single-arg lambda factory: a 2-arg lambda (even via default args) makes
    # pyspark's HOF binder pass the array INDEX as the second argument
    return lambda x: x.isin(markers)


def lang_scores(tok: Column) -> dict[str, Column]:
    """Marker-hit count per candidate language (array_intersect-free:
    counts repeated hits, like a real n-gram scorer)."""
    low = F.transform(tok, F.lower)
    return {
        lang: F.size(F.filter(low, _marker_test(markers))).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_pred(tok: Column, cjk_ratio: Column) -> Column:
    """argmax over language scores with a deterministic tie-break chain
    (score order en > de > fr > es), CJK charset short-circuit first."""
    scores = lang_scores(tok)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # build CASE chain, en wins ties
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return F.when(cjk_ratio > 0.3, F.lit("zh")).otherwise(pred)


def lang_pred_sql(tok_expr: str, cjk_ratio_expr: str) -> str:
    score = {
        lang: f"len(list_filter(list_transform({tok_expr}, t -> lower(t)), "
        f"x -> list_contains([{', '.join(repr(w) for w in markers)}], x)))::BIGINT"
        for lang, markers in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    chain = " ".join(
        f"WHEN {score[lang]} > 0 AND {score[lang]} = {best} THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return (
        f"(CASE WHEN {cjk_ratio_expr} > 0.3 THEN 'zh' "
        f"ELSE (CASE {chain} ELSE 'und' END) END)"
    )


def cjk_ratio(col: Column) -> Column:
    n = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    return F.round(n / F.greatest(F.length(col), F.lit(1)).cast("double"), 6)


def cjk_ratio_sql(expr: str) -> str:
    return (
        f"round(length(regexp_replace({expr}, '[^一-鿿]', '', 'g')) "
        f"/ greatest(length({expr}), 1)::DOUBLE, 6)"
    )


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def fingerprint_columns(text_col: str = "text") -> dict[str, Column]:
    """Content fingerprints: full-text hash (exact-dup key, the md5 analogue
    of ConnectAndSave.py:122-123) + min/max shingle hash (a 2-value winnow —
    the degenerate MinHash that already catches heavy overlap)."""
    t = F.col(text_col)
    norm = F.lower(clean_text(t))
    tok = tokens(norm)
    sh = word_shingles(tok, 3)
    sh_hashes = F.transform(sh, lambda s: hash60(s))
    return {
        "content_hash": F.md5(norm),
        "min_shingle": F.array_min(sh_hashes),
        "max_shingle": F.array_max(sh_hashes),
    }


def fingerprint_sql(text_expr: str = "text") -> dict[str, str]:
    norm = f"lower({clean_text_sql(text_expr)})"
    tok = tokens_sql(norm)
    sh = word_shingles_sql(tok, 3)
    hashes = f"list_transform({sh}, s -> {hash60_sql('s')})"
    return {
        "content_hash": f"md5({norm})",
        "min_shingle": f"list_min({hashes})",
        "max_shingle": f"list_max({hashes})",
    }
