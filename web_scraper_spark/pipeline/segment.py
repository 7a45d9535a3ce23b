"""Corpus-trained word segmentation: the real model for the X8 segment tier.

The reference joins multi-syllable Vietnamese words with underscores via
`pyvi.ViTokenizer.tokenize` (`/root/reference/ConnectAndSave.py:81`)
before stopword stripping. pyvi is not in this container, so — like the
averaged-perceptron NER (pipeline/perceptron_ner.py) closed the P2 model
tier — this module ships an in-repo statistical segmenter so the swap
point runs a trained model rather than the identity fallback:

- **fit** (`fit_lexicon`): mine the corpus itself for collocations —
  adjacent 2-gram and 3-gram counts via native HOFs (zip_with over
  shifted token arrays, no Python), one explode+groupBy shuffle, then a
  TakeOrdered top-K. The driver materializes at most ``max_phrases``
  rows (the same bounded-config collect as the stopword broadcast —
  not a data-sized collect).
- **apply** (`segment_docs`): greedy longest-match against the
  broadcast lexicon (3-grams preferred over 2-grams at the same start,
  the maximal-matching rule dictionary segmenters use), one fanned-out
  Arrow pass via mapInPandas.

At 100 TB: fit is a map-side-combined word-pair count (shuffle on the
n-gram key) + a bounded top-K; apply is embarrassingly parallel with a
lexicon of at most ``max_phrases`` strings on each executor.

Deterministic: ties in the top-K break on the phrase string, so the
fitted lexicon is stable across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Explicit whitespace class instead of \s: Java's \s includes \x0B
# (vertical tab) while DuckDB's RE2 \s does not — spelling the class out
# keeps Spark and the word_segment_sql oracle tokenizing identically on
# any input, not just the \v-free test corpus.
_WS = " \\t\\n\\x0B\\f\\r"


def _words(col: Column) -> Column:
    """lower → strip punctuation → whitespace split (raw token stream;
    stopwords stay — segmentation happens before stopword stripping)."""
    c = F.regexp_replace(F.lower(col), f"[^\\w{_WS}]", " ")
    c = F.regexp_replace(F.trim(c), f"[{_WS}]+", " ")
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, " ")
    )


def _adjacent_ngrams(tokens: Column, n: int) -> Column:
    """Adjacent n-grams (n=2 or 3) as space-joined strings, built from
    shifted slices + zip_with — stays in the JVM."""
    size = F.size(tokens)
    count = F.greatest(size - (n - 1), F.lit(0))
    s1 = F.slice(tokens, 1, count)
    s2 = F.slice(tokens, 2, count)
    if n == 2:
        return F.zip_with(s1, s2, lambda a, b: F.concat_ws(" ", a, b))
    s3 = F.slice(tokens, 3, count)
    pair = F.zip_with(s1, s2, lambda a, b: F.concat_ws(" ", a, b))
    return F.zip_with(pair, s3, lambda ab, c: F.concat_ws(" ", ab, c))


def fit_lexicon(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    max_phrases: int = 5000,
) -> list[str]:
    """Mine the corpus for multi-word phrases: adjacent 2-/3-grams whose
    frequency ≥ ``min_count``, top ``max_phrases`` by (count desc, phrase
    asc). Returns space-separated phrase strings, deterministically
    ordered."""
    tokens = _words(F.col(text_col))
    grams = docs.select(
        F.explode(
            F.concat(_adjacent_ngrams(tokens, 2), _adjacent_ngrams(tokens, 3))
        ).alias("phrase")
    )
    top = (
        grams.groupBy("phrase")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("phrase"))
        .limit(max_phrases)
    )
    return [r["phrase"] for r in top.collect()]


def segment_tokens(words: list[str], lex2: set, lex3: set) -> list[str]:
    """Greedy maximal matching over one token stream: at each position try
    the 3-gram, then the 2-gram, else emit the single token. Matched
    phrases join with underscores (the ViTokenizer output convention)."""
    out = []
    i, n = 0, len(words)
    while i < n:
        if i + 2 < n and (words[i], words[i + 1], words[i + 2]) in lex3:
            out.append(f"{words[i]}_{words[i + 1]}_{words[i + 2]}")
            i += 3
        elif i + 1 < n and (words[i], words[i + 1]) in lex2:
            out.append(f"{words[i]}_{words[i + 1]}")
            i += 2
        else:
            out.append(words[i])
            i += 1
    return out


def _split_lexicon(lexicon: list[str]) -> tuple[set, set]:
    lex2, lex3 = set(), set()
    for phrase in lexicon:
        parts = tuple(phrase.split(" "))
        if len(parts) == 2:
            lex2.add(parts)
        elif len(parts) == 3:
            lex3.add(parts)
    return lex2, lex3


def segment_docs(
    docs: DataFrame,
    lexicon: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the fitted lexicon: (id, n_tokens, n_words, segmented) per
    document, where ``segmented`` is the underscore-joined word stream.
    One fanned-out Arrow pass; the lexicon ships once per executor via
    closure (bounded by fit's max_phrases)."""
    import pandas as pd

    from web_scraper_spark.operators.dedup import _fan_out

    lex2, lex3 = _split_lexicon(lexicon)
    prepared = _fan_out(
        docs.select(
            F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("words")
        )
    )

    def run(it):
        for pdf in it:
            ids, n_tok, n_seg, joined = [], [], [], []
            for row in pdf.itertuples(index=False):
                words = list(row.words)
                seg = segment_tokens(words, lex2, lex3)
                ids.append(row.doc_id)
                n_tok.append(len(words))
                n_seg.append(len(seg))
                joined.append(" ".join(seg))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_tokens": n_tok,
                    "n_words": n_seg,
                    "segmented": joined,
                }
            )

    return prepared.mapInPandas(
        run, schema="doc_id bigint, n_tokens int, n_words int, segmented string"
    )


def word_segment_sql(
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    max_phrases: int = 5000,
) -> str:
    """DuckDB twin of fit_lexicon + segment_docs, value-exact.

    The fit is relational outright (n-gram count + deterministic top-K).
    The apply's greedy left-to-right consumption — long thought of here
    as "not SQL-expressible" — is a FUNCTIONAL-GRAPH WALK: every
    position has a precomputable step (3 if the trigram is in the
    lexicon, else 2 if the bigram is, else 1), and the segmentation is
    exactly the orbit of pos=1 under pos -> pos + step(pos). That is
    the resolve_redirects recipe: a recursive CTE over (doc_id, pos),
    depth bounded by the longest document's word count. Emitted units
    re-join with underscores; the final row matches q_word_segment's
    (doc_id, n_tokens, n_words, seg_hash) aliases."""
    from web_scraper_spark.operators.hashing import hash60_sql

    # the same EXPLICIT whitespace class as _words (\s diverges between
    # Java and RE2 on \x0B)
    ws = " \\t\\n\\x0B\\f\\r"
    w = (
        f"regexp_replace(trim(regexp_replace(lower({text_col}), "
        f"'[^\\w{ws}]', ' ', 'g')), '[{ws}]+', ' ', 'g')"
    )
    return f"""
        WITH RECURSIVE words AS (
            SELECT doc_id,
                   CASE WHEN length({w}) = 0 THEN []
                        ELSE string_split({w}, ' ') END AS w
            FROM {table}
        ),
        tok AS (SELECT doc_id, w, len(w) AS n FROM words),
        positions AS (
            SELECT doc_id, unnest(generate_series(1, n)) AS pos FROM tok
        ),
        grams AS (
            SELECT t.w[p.pos] || ' ' || t.w[p.pos + 1] AS phrase
            FROM positions p JOIN tok t USING (doc_id) WHERE p.pos + 1 <= t.n
            UNION ALL
            SELECT t.w[p.pos] || ' ' || t.w[p.pos + 1] || ' ' || t.w[p.pos + 2]
            FROM positions p JOIN tok t USING (doc_id) WHERE p.pos + 2 <= t.n
        ),
        lex AS (
            SELECT phrase FROM (
                SELECT phrase, count(*) AS cnt FROM grams GROUP BY phrase
                HAVING count(*) >= {min_count}
                ORDER BY cnt DESC, phrase LIMIT {max_phrases}
            )
        ),
        flags AS (
            SELECT p.doc_id, p.pos, t.n,
                   CASE WHEN p.pos + 2 <= t.n AND
                             t.w[p.pos] || ' ' || t.w[p.pos + 1] || ' ' || t.w[p.pos + 2]
                             IN (SELECT phrase FROM lex WHERE len(string_split(phrase, ' ')) = 3)
                        THEN 3
                        WHEN p.pos + 1 <= t.n AND
                             t.w[p.pos] || ' ' || t.w[p.pos + 1]
                             IN (SELECT phrase FROM lex WHERE len(string_split(phrase, ' ')) = 2)
                        THEN 2
                        ELSE 1 END AS step,
                   t.w AS w
            FROM positions p JOIN tok t USING (doc_id)
        ),
        walk AS (
            SELECT doc_id, 1 AS pos FROM tok WHERE n >= 1
            UNION ALL
            SELECT f.doc_id, f.pos + f.step
            FROM walk v JOIN flags f ON f.doc_id = v.doc_id AND f.pos = v.pos
            WHERE f.pos + f.step <= f.n
        ),
        seg AS (
            SELECT f.doc_id, f.pos,
                   CASE f.step
                        WHEN 3 THEN f.w[f.pos] || '_' || f.w[f.pos + 1] || '_' || f.w[f.pos + 2]
                        WHEN 2 THEN f.w[f.pos] || '_' || f.w[f.pos + 1]
                        ELSE f.w[f.pos] END AS unit
            FROM walk v JOIN flags f ON f.doc_id = v.doc_id AND f.pos = v.pos
        ),
        agg AS (
            SELECT doc_id, count(*) AS n_words,
                   string_agg(unit, ' ' ORDER BY pos) AS segmented
            FROM seg GROUP BY doc_id
        )
        SELECT t.doc_id, t.n::INT AS n_tokens,
               coalesce(a.n_words, 0)::INT AS n_words,
               {hash60_sql("coalesce(a.segmented, '')")} AS seg_hash
        FROM tok t LEFT JOIN agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Quality evaluation (r3 VERDICT item 2): segmentation graded on OUTPUT —
# boundary F1 against a generator with KNOWN true word units, so a future
# pyvi swap has a measured baseline to beat.
# ---------------------------------------------------------------------------

# the generator's true multi-word vocabulary: constituents are chosen so
# phrase-internal words never appear as singles (like real Vietnamese
# bound syllables), while cross-boundary adjacencies stay random noise
_EVAL_SINGLES = (
    "va cua trong cho den tai theo moi nay se da dang duoc nhieu lon rat "
    "ngay nam khi hon"
).split()
_EVAL_PHRASES2 = [
    "hoc sinh", "thanh pho", "cong ty", "du an", "ket qua", "phat trien",
    "san pham", "thi truong", "gia tri", "chat luong", "quan ly", "dau tu",
]
_EVAL_PHRASES3 = [
    "khu cong nghe", "nha may dien", "trung tam thuong",
    "vien nghien cuu", "ban quan tri",
]


def synth_segmentation_corpus(n: int = 300, seed: int = 41):
    """Deterministic (text, true_units) pairs: each sentence is 6-12 units
    drawn ~60/30/10 from singles/2-gram/3-gram vocabularies. ``text`` is
    the plain space-joined word stream (what the crawler extracts);
    ``true_units`` the underscore-joined units the segmenter should
    recover."""
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        units = []
        for _ in range(rng.randint(6, 12)):
            p = rng.random()
            if p < 0.6:
                units.append(rng.choice(_EVAL_SINGLES))
            elif p < 0.9:
                units.append(rng.choice(_EVAL_PHRASES2).replace(" ", "_"))
            else:
                units.append(rng.choice(_EVAL_PHRASES3).replace(" ", "_"))
        text = " ".join(u.replace("_", " ") for u in units)
        out.append((text, units))
    return out


def _unit_boundaries(units: list[str]) -> set:
    """Cumulative word offsets where a unit ENDS (internal boundaries)."""
    bounds, pos = set(), 0
    for u in units:
        pos += u.count("_") + 1
        bounds.add(pos)
    bounds.discard(pos)  # the final position is not an internal boundary
    return bounds


def evaluate_segmentation(corpus, lexicon: list[str]) -> dict:
    """Word-boundary precision/recall/F1 (the standard segmentation
    metric) plus exact-unit F1 over (text, true_units) pairs."""
    lex2, lex3 = _split_lexicon(lexicon)
    b_tp = b_pred = b_gold = 0
    u_tp = u_pred = u_gold = 0
    for text, truth in corpus:
        pred = segment_tokens(text.split(" "), lex2, lex3)
        gb, pb = _unit_boundaries(truth), _unit_boundaries(pred)
        b_tp += len(gb & pb)
        b_pred += len(pb)
        b_gold += len(gb)
        # exact units, position-aware (compare the aligned sequences)
        from collections import Counter

        ct, cp = Counter(truth), Counter(pred)
        u_tp += sum(min(ct[u], cp[u]) for u in ct)
        u_pred += len(pred)
        u_gold += len(truth)
    out = {}
    for name, (tp, np_, ng) in {
        "boundary": (b_tp, b_pred, b_gold),
        "unit": (u_tp, u_pred, u_gold),
    }.items():
        prec = tp / np_ if np_ else 0.0
        rec = tp / ng if ng else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[name] = {
            "precision": round(prec, 4),
            "recall": round(rec, 4),
            "f1": round(f1, 4),
        }
    return out
