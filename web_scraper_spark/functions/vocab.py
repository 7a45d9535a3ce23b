"""Full-scale relation-vocabulary + stopword configs (SURVEY.md E3/O6).

The reference ships a 19-type x 1,121-literal-phrase relation vocabulary
(relation_vocab.json) and a 1,941-entry stopword list
(vietnamese_stopwords.txt). The engine treats both as runtime config; this
module synthesizes same-SHAPE configs deterministically (own content, no
copied data) so the full-size path — one compiled Java-regex alternation
per type with 200+ phrases, a ~2,000-element broadcast stopword literal —
is actually exercised by tests, the driver gate, and the bench, not just
supported in theory.

Phrase content: a slice of the patterns is built from the synthetic
corpus' own word inventory (so the classifier produces a non-trivial label
distribution over the documents table); the rest are filler phrases that
deliberately never match (they exercise compile/scan cost only).
Everything derives from hash60, so Spark, DuckDB, and Python agree.
"""

from __future__ import annotations

from web_scraper_spark.operators.hashing import hash60_py

# the synthetic documents tables draw from this word inventory
CORPUS_WORDS = [
    "spark", "join", "merge", "sort", "filter", "group", "agg", "window",
    "batch", "stream", "query", "table", "scan", "hash", "key", "order",
    "row", "column", "line", "data", "value", "vector", "part", "customer",
    "small", "big", "fast", "slow", "the", "a", "dup",
]

_FILLER_WORDS = [
    "zephyr", "quartz", "lattice", "ember", "sable", "onyx", "fjord",
    "glyph", "vellum", "cobalt", "umber", "heron", "osprey", "bramble",
    "thistle", "gossamer", "cairn", "tundra", "mesa", "arroyo", "delta",
    "sibilant", "corvid", "lumen", "praxis", "halcyon", "verdant", "cinder",
    "basalt", "schist", "gneiss", "moraine", "esker", "drumlin", "kettle",
    "placer", "vug", "geode", "skarn", "pluton",
]

REL_TYPES = [
    "CAUSE_EFFECT", "TEMPORAL", "COMPARISON", "DATA_FLOW", "AGGREGATION",
    "ORDERING", "MEMBERSHIP", "LOCATION", "OWNERSHIP", "SEQUENCE",
    "SIMILARITY", "CONTRAST", "DEPENDENCY", "COMPOSITION", "TRANSFORMATION",
    "SELECTION", "DISTRIBUTION", "REPLICATION", "SYNCHRONIZATION",
]

# per-type pattern counts: same skewed shape as the reference (largest
# type 226 phrases, long tail of ~40s) summing to ~1,120 total
_TYPE_COUNTS = [226, 190] + [42] * 17


def synth_vocab() -> dict[str, list[str]]:
    """19 types x ~1,120 literal phrases, deterministic. ~1 in 7 phrases
    is a 2-gram over CORPUS_WORDS (can match the documents tables); the
    rest are filler 2/3-grams that never match."""
    vocab: dict[str, list[str]] = {}
    for rel, n in zip(REL_TYPES, _TYPE_COUNTS):
        seen: set[str] = set()
        pats: list[str] = []
        for i in range(n):
            h = hash60_py(f"vocab:{rel}:{i}")
            if i % 7 == 0:
                w1 = CORPUS_WORDS[h % len(CORPUS_WORDS)]
                w2 = CORPUS_WORDS[(h >> 8) % len(CORPUS_WORDS)]
                phrase = f"{w1} {w2}"
            else:
                w1 = _FILLER_WORDS[h % len(_FILLER_WORDS)]
                w2 = _FILLER_WORDS[(h >> 8) % len(_FILLER_WORDS)]
                if h % 3:
                    w3 = _FILLER_WORDS[(h >> 16) % len(_FILLER_WORDS)]
                    phrase = f"{w1} {w2} {w3}"
                else:
                    phrase = f"{w1} {w2}"
            if phrase not in seen:
                seen.add(phrase)
                pats.append(phrase)
        vocab[rel] = pats
    return vocab


def synth_stopwords(n: int = 2000) -> list[str]:
    """~n-entry stopword list (reference ships 1,941): the real English
    stopwords plus deterministic filler words — exercises the broadcast
    array literal + array_except path at its production size."""
    from web_scraper_spark.operators.text import EN_STOPWORDS

    out = list(EN_STOPWORDS)
    seen = set(out)
    i = 0
    while len(out) < n:
        h = hash60_py(f"stop:{i}")
        w = _FILLER_WORDS[h % len(_FILLER_WORDS)] + str(h % 97)
        if w not in seen:
            seen.add(w)
            out.append(w)
        i += 1
    return out
