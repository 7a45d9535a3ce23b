"""Generic boilerplate-strip main-text extraction (trafilatura-style).

The per-source selector extractors (html/extract.py) carry the
byte-identity contract for known page shapes; this module is the generic
fallback for arbitrary pages — the text-density family of algorithms
(Boilerpipe / jusText / trafilatura, all published): score block-level
elements by text mass vs link mass, keep the dense article core, drop
navigation/footer chrome.

Algorithm (deterministic, no model):
1. Parse with the engine DOM; hard-prune <script>/<style>/<nav>/<header>/
   <footer>/<aside>/<form> subtrees.
2. For every block-level element, compute its direct text (text nodes
   owned by the block, not by nested blocks), its link text mass, and
   derived features: length, link_density, stopword count.
3. A block is CONTENT if: length >= min_len and link_density <= max_ld,
   or it sits between two content blocks (gap bridging, one hop) — the
   jusText neighborhood rule.
4. Main text = content blocks' text joined with '\\n'.

Runs inside the same Arrow batch stage as the selector extractors
(extract_main_text_batch) — one more mapInPandas column, no extra pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from web_scraper_spark.html.dom import Element, parse_html

PRUNE_TAGS = frozenset(
    "script style nav header footer aside form noscript iframe svg".split()
)
BLOCK_TAGS = frozenset(
    "p div article section h1 h2 h3 h4 h5 h6 li td blockquote pre".split()
)
MIN_LEN = 25
MAX_LINK_DENSITY = 0.4


def _direct_text(el: Element, in_link: bool = False) -> tuple[str, str]:
    """(all_text, link_text) owned by this block — descends only into
    NON-block children so nested blocks score independently."""
    text_parts: list[str] = []
    link_parts: list[str] = []
    for child in el.children:
        if isinstance(child, str):
            t = child.strip()
            if t:
                text_parts.append(t)
                if in_link:
                    link_parts.append(t)
        elif child.tag in PRUNE_TAGS or child.tag in BLOCK_TAGS:
            continue
        else:
            t, l = _direct_text(child, in_link or child.tag == "a")
            if t:
                text_parts.append(t)
            if l:
                link_parts.append(l)
    return " ".join(text_parts), " ".join(link_parts)


def _blocks(el: Element, out: list) -> None:
    if el.tag in PRUNE_TAGS:
        return
    if el.tag in BLOCK_TAGS:
        text, link_text = _direct_text(el)
        if text:
            ld = len(link_text) / len(text) if text else 0.0
            out.append((text, ld))
    for child in el.children:
        if isinstance(child, Element):
            _blocks(child, out)


def extract_main_text(html: str | bytes) -> str:
    """Main content of an arbitrary HTML page, boilerplate stripped."""
    root = parse_html(html)
    blocks: list[tuple[str, float]] = []
    _blocks(root, blocks)
    if not blocks:
        return ""
    content = [
        len(t) >= MIN_LEN and ld <= MAX_LINK_DENSITY for t, ld in blocks
    ]
    # jusText-style gap bridging: a short/linky block flanked by content
    bridged = list(content)
    for i in range(1, len(blocks) - 1):
        if not content[i] and content[i - 1] and content[i + 1] and blocks[i][1] <= MAX_LINK_DENSITY:
            bridged[i] = True
    return "\n".join(t for (t, _), keep in zip(blocks, bridged) if keep)


def extract_main_text_batch(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(..., html) → (..., main_text) — Arrow-batched, same stage shape as
    the selector parse UDF."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields
    ) + ", main_text string"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["main_text"] = [
                extract_main_text(bytes(b)) if b is not None else ""
                for b in pdf[html_col]
            ]
            yield pdf

    return pages.mapInPandas(run, schema=out_schema)
