"""Per-source article + link extractors (the byte-identity contract).

Each extractor mirrors, operator-for-operator, the reference's BS4 logic
(SURVEY.md §2.4). Source names map to reference page shapes:

- ``alpha``  — TuoiTre shape   (/root/reference/CrawlPaperTuoiTre.py:110-127)
- ``beta``   — VNExpress shape (/root/reference/CrawlPaperVNExpress.py:131-148)
- ``gamma``  — ZNews shape     (/root/reference/CrawlPaperZNews.py:125-147)

These pure functions are shared by BOTH the distributed ``mapInPandas``
stage (html/udfs.py) and the sequential crawl simulator
(frontier/simulator.py), so "byte-identical extracted text per URL"
holds by construction and is verified against hand-written golden
literals in tests/test_extract.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from web_scraper_spark.html.dom import Element, get_text, parse_html, select, select_one


@dataclass
class Article:
    source: str
    url: str
    category: str
    keyword: str
    time: str
    title: str
    content: str


@dataclass
class PageLinks:
    """Links discovered on a page, with document/list order preserved."""

    categories: list[tuple[str, str]] = field(default_factory=list)  # (href, name)
    articles: list[str] = field(default_factory=list)
    listing_dates: list[str] = field(default_factory=list)  # gamma listing spans
    last_page: int = 1  # beta pagination (H6)


SOURCE_LABEL = {"alpha": "Tuoi tre", "beta": "VN Express", "gamma": "ZNews"}


def _abs(base_url: str, href: str) -> str:
    # X1: conditional absolutization, CrawlPaperVNExpress.py:253-254
    if not href.startswith("http"):
        return base_url + href
    return href


# ---------------------------------------------------------------------------
# Article extraction (H1-H3)
# ---------------------------------------------------------------------------


def extract_article_alpha(url: str, category: str, root: Element) -> Article:
    """TuoiTre shape — CrawlPaperTuoiTre.py:110-127."""
    time_elem = select_one(root, "div.detail-time > div")
    time_paper = get_text(time_elem, strip=True) if time_elem else "N/A"
    title_elem = select_one(root, "h1.detail-title")
    title_paper = get_text(title_elem, strip=True) if title_elem else "Không có tiêu đề"
    content_elems = select(root, "div.detail-content p")
    content_paper = " ".join(get_text(p, strip=True) for p in content_elems if p)
    keyword_elems = select(root, "div.detail-tab > a")
    keyword_paper = ",".join(get_text(a, strip=True) for a in keyword_elems if a)
    return Article("Tuoi tre", url, category, keyword_paper, time_paper, title_paper, content_paper)


def extract_article_beta(url: str, category: str, root: Element) -> Article:
    """VNExpress shape — CrawlPaperVNExpress.py:131-148.

    The reference reads keywords through Selenium (`find_elements(By.CLASS_NAME,
    'item-tag')` + `.text`); on our synthetic pages item-tags are plain inline
    anchors so `.text` and `get_text(strip=True)` coincide.
    """
    time_elem = select_one(root, "div.sidebar-1 > div.header-content > span.date, span.date")
    title_elem = select_one(root, "div.sidebar-1 > h1.title-detail, h1.title-detail")
    head_elem = select_one(root, "div.sidebar-1 > p.description, p.description")
    main_elems = select(
        root,
        "div.sidebar-1 > article.fck_detail > p.Normal, article.fck_detail > p.Normal, p.Normal",
    )
    time_text = get_text(time_elem, strip=True) if time_elem else "N/A"
    title_text = get_text(title_elem, strip=True) if title_elem else "N/A"
    head_text = get_text(head_elem, strip=True) if head_elem else ""
    main_text = " ".join(get_text(p, strip=True) for p in main_elems) if main_elems else ""
    keyword_elems = select(root, ".item-tag")
    keyword_paper = ",".join(get_text(a, strip=True) for a in keyword_elems)
    full_content = f"{head_text} {main_text}".strip()
    return Article("VN Express", url, category, keyword_paper, time_text, title_text, full_content)


def extract_article_gamma(url: str, category_hint: str, root: Element) -> Article:
    """ZNews shape — CrawlPaperZNews.py:125-147 (keyword literal 'Null')."""
    cat_elem = select_one(root, "header.the-article-header > p.the-article-category > a")
    category = get_text(cat_elem, strip=True) if cat_elem else "N/A"
    time_elem = select_one(
        root, "header.the-article-header > ul.the-article-meta > li.the-article-publish"
    )
    time_paper = get_text(time_elem, strip=True) if time_elem else "N/A"
    title_elem = select_one(root, "header.the-article-header > h1.the-article-title")
    title_paper = get_text(title_elem, strip=True) if title_elem else "Không có tiêu đề"
    content_elems = select(root, "div.the-article-body p")
    content_paper = " ".join(get_text(p, strip=True) for p in content_elems if p)
    return Article("ZNews", url, category, "Null", time_paper, title_paper, content_paper)


ARTICLE_EXTRACTORS = {
    "alpha": extract_article_alpha,
    "beta": extract_article_beta,
    "gamma": extract_article_gamma,
}


def extract_article(source: str, url: str, category: str, html: str | bytes) -> Article:
    return ARTICLE_EXTRACTORS[source](url, category, parse_html(html))


# ---------------------------------------------------------------------------
# Link extraction (H4-H6): menus, listings, pagination
# ---------------------------------------------------------------------------


def extract_menu(source: str, base_url: str, root: Element) -> list[tuple[str, str]]:
    """Homepage category discovery (H4).

    alpha: `ul.menu-nav > li > a` (CrawlPaperTuoiTre.py:150-151)
    beta:  nested `ul.parent > li` → `ul.sub` → `li > a` (CrawlPaperVNExpress.py:184-212)
    gamma: `ul.normal-category > li > a` (CrawlPaperZNews.py:173-184)
    """
    out: list[tuple[str, str]] = []
    if source == "alpha":
        for a in select(root, "ul.menu-nav > li > a"):
            href = a.get("href", "")
            if href:
                out.append((_abs(base_url, href), get_text(a, strip=True)))
    elif source == "beta":
        for li in select(root, "ul.parent > li"):
            for a in select(li, "ul.sub > li > a"):
                href = a.get("href", "")
                if href:
                    out.append((_abs(base_url, href), get_text(a, strip=True)))
    elif source == "gamma":
        for a in select(root, "ul.normal-category > li > a"):
            href = a.get("href", "")
            if href:
                out.append((_abs(base_url, href), get_text(a, strip=True)))
    else:
        raise ValueError(source)
    return out


def extract_listing(source: str, base_url: str, root: Element) -> PageLinks:
    """Listing-page article links (H5) + beta pagination (H6).

    alpha: `div.box-category-item > a` (CrawlPaperTuoiTre.py:171-175)
    beta:  `article.item-news` → `h2/h3.title-news > a` + `div.button-page a`
           (CrawlPaperVNExpress.py:238-257, 222-235)
    gamma: `article.article-item` → `p.article-thumbnail > a` +
           `span.article-publish span.date` (CrawlPaperZNews.py:211-243)
    """
    links = PageLinks()
    if source == "alpha":
        for a in select(root, "div.box-category-item > a"):
            href = a.get("href", "")
            if href:
                links.articles.append(_abs(base_url, href))
    elif source == "beta":
        for art in select(root, "div.list-news-subfolder > article.item-news, article.item-news"):
            a = select_one(art, "h2.title-news > a, h3.title-news > a, a.title-news")
            if a is not None:
                href = a.get("href", "")
                if href:
                    links.articles.append(_abs(base_url, href))
        nums = [
            int(t)
            for t in (get_text(a) for a in select(root, "div.button-page a"))
            if t.isdigit()
        ]
        links.last_page = max(nums) if nums else 1
    elif source == "gamma":
        for art in select(root, "article.article-item"):
            a = select_one(art, "p.article-thumbnail > a")
            if a is not None:
                href = a.get("href", "")
                if href:
                    links.articles.append(_abs(base_url, href))
            d = select_one(art, "span.article-publish span.date")
            links.listing_dates.append(get_text(d, strip=True) if d else "")
    else:
        raise ValueError(source)
    return links


def extract_links(source: str, kind: str, base_url: str, html: str | bytes) -> PageLinks:
    """Unified frontier-expansion extractor: one page → outlinks."""
    root = parse_html(html)
    if kind == "home":
        pl = PageLinks()
        pl.categories = extract_menu(source, base_url, root)
        return pl
    if kind == "listing":
        return extract_listing(source, base_url, root)
    return PageLinks()  # articles expand nothing at depth 2 (BFS depth cap)
