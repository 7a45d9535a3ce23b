"""Vectorized parse/extract stage (SURVEY.md §2.10 P1).

One ``mapInPandas`` pass over fetched page batches emits a union-schema
result: extracted article rows AND outlink rows (menu/category links,
listing article links, pagination metadata). Parsing each HTML document
exactly once is the scale-critical property — at 100 TB the parse is the
dominant CPU cost, so the plan must never parse a page twice to get
articles and outlinks separately.

Replaces the reference's per-page sequential BeautifulSoup calls
(CrawlPaperTuoiTre.py:110-127 and peers) with Arrow-batched execution;
the extraction functions themselves are shared with the sequential
simulator so text output is byte-identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# depth semantics (BFS depth fixed at 2 in the reference — SURVEY.md §1.1):
#   0 = homepage, 1 = category/listing page, 2 = article
KIND_BY_DEPTH = {0: "home", 1: "listing", 2: "article"}

PARSE_SCHEMA = (
    "url string, source string, depth int, "
    "category_name string, category_pos int, page_no int, listing_pos int, "
    "rec_type string, "
    "keyword string, time_str string, title string, content string, "
    "out_url string, anchor string, listing_date string, last_page int"
)

_COLS = [f.strip().split(" ")[0] for f in PARSE_SCHEMA.split(",")]


def _base_url(url: str) -> str:
    parts = url.split("/", 3)
    return parts[0] + "//" + parts[2]


def _parse_one(row) -> list[tuple]:
    from web_scraper_spark.html.extract import extract_article, extract_links

    url = row.url
    source = row.source
    depth = int(row.depth)
    kind = KIND_BY_DEPTH[depth]
    base = _base_url(url)
    cat_name = row.category_name or ""
    cat_pos = int(row.category_pos)
    page_no = int(row.page_no)
    out: list[tuple] = []

    def rec(**kw):
        d = dict.fromkeys(_COLS)
        d.update(
            url=url, source=source, depth=depth, category_name=cat_name,
            category_pos=cat_pos, page_no=page_no, listing_pos=-1,
        )
        d.update(kw)
        out.append(tuple(d[c] for c in _COLS))

    html = bytes(row.html)
    if kind == "article":
        art = extract_article(source, url, cat_name, html)
        rec(
            rec_type="article", keyword=art.keyword, time_str=art.time,
            title=art.title, content=art.content,
            category_name=art.category, listing_pos=int(row.listing_pos),
        )
        return out

    links = extract_links(source, kind, base, html)
    if kind == "home":
        for pos, (href, name) in enumerate(links.categories):
            rec(rec_type="cat_link", out_url=href, anchor=name,
                category_name=name, category_pos=pos)
    else:  # listing
        for pos, href in enumerate(links.articles):
            ld = links.listing_dates[pos] if pos < len(links.listing_dates) else ""
            rec(rec_type="art_link", out_url=href, listing_pos=pos, listing_date=ld)
        if source == "beta" and page_no == 1:
            rec(rec_type="page_meta", last_page=int(links.last_page))
    return out


def parse_pages(fetched: DataFrame) -> DataFrame:
    """fetched(url, source, depth, category_name, category_pos, page_no,
    listing_pos, html) → union-schema parse records."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for row in pdf.itertuples(index=False):
                rows.extend(_parse_one(row))
            yield pd.DataFrame(rows, columns=_COLS)

    return fetched.mapInPandas(batches, schema=PARSE_SCHEMA)
