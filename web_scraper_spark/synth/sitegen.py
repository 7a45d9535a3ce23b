"""Deterministic synthetic Common-Crawl-style site + ``pages`` table.

Generates three hosts whose page shapes mirror the three reference page
shapes (SURVEY.md §2.4): ``alpha.example`` (TuoiTre shape — infinite-scroll
listing flattened to a stored listing page), ``beta.example`` (VNExpress
shape — numbered pagination, H6), ``gamma.example`` (ZNews shape — listing
date spans, excluded categories F6).

Everything is a pure function of (config, url): content, timestamps and
link graph are derived with ``random.Random(url)`` (string seeding is
SHA-512 based and stable across runs/processes) and an arithmetic publish
schedule — no wall clock anywhere (SURVEY.md §7 "Determinism everywhere").

The page *spec* (metadata + embedded outlink lists) is built driver-side —
it is O(pages) metadata, not content; HTML rendering, the heavy part, runs
distributed via ``mapInPandas`` in :func:`build_pages_df`. At 10^10-URL
scale the spec itself would be generated with ``spark.range`` + the same
pure row functions; the render stage is unchanged.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

WORDS = (
    "kinh tế chính trị xã hội thế giới thể thao giáo dục công nghệ du lịch "
    "văn hóa sức khỏe pháp luật đời sống bạn đọc xe giải trí bất động sản "
    "phát triển tăng trưởng thị trường doanh nghiệp đầu tư ngân hàng chứng khoán "
    "việt nam hà nội sài gòn đà nẵng quốc hội chính phủ bộ trưởng chủ tịch "
    "nghiên cứu khoa học sinh viên trường học bệnh viện bác sĩ người dân thành phố"
).split()

CATEGORY_NAMES = [
    "Kinh tế", "Thể thao", "Giáo dục", "Công nghệ", "Du lịch",
    "Video", "Sức khỏe", "Pháp luật",
]

WEEKDAYS_VI = ["Thứ hai", "Thứ ba", "Thứ tư", "Thứ năm", "Thứ sáu", "Thứ bảy", "Chủ nhật"]


def _slug(name: str) -> str:
    import unicodedata

    s = unicodedata.normalize("NFD", name.lower())
    s = "".join(c for c in s if unicodedata.category(c) != "Mn")
    s = s.replace("đ", "d")
    return s.replace(" ", "-")


@dataclass
class SiteConfig:
    seed: int = 42
    n_categories: int = 4  # per source, taken from CATEGORY_NAMES head
    articles_per_category: int = 12
    beta_page_size: int = 5  # articles per paginated listing page (beta)
    base_day: str = "2025-12-01"
    n_days: int = 2  # publish dates spread over [base_day, base_day+n_days)
    # gamma excludes this category from crawling (F6, CrawlPaperZNews.py:34-40)
    gamma_excluded: tuple[str, ...] = ("Video",)
    hosts: dict = field(
        default_factory=lambda: {
            "alpha": "https://alpha.example",
            "beta": "https://beta.example",
            "gamma": "https://gamma.example",
        }
    )
    # when set (ISO timestamp), beta articles published shortly before it
    # render RELATIVE visible times ('N phút trước' / 'N giờ trước' /
    # 'Hôm qua, H:MM' — CrawlPaperVNExpress.py:87-104 forms), exercising
    # the as_of-anchored parse path end-to-end
    relative_as_of: str | None = None
    # robots.txt crawl-delay seconds per source (north-rule additive)
    crawl_delay: dict = field(
        default_factory=lambda: {"alpha": 1.0, "beta": 0.5, "gamma": 2.0}
    )
    robots_disallow: dict = field(
        default_factory=lambda: {"alpha": (), "beta": (), "gamma": ("/video",)}
    )
    # r5 hygiene-mode fixtures: per-source article-page dropout. For a
    # source with mod m, every article whose per-category index i has
    # i % m == 0 is LISTED (its link renders on listings) but its page
    # spec is omitted — the crawl sees it as a failed fetch. m = 1 makes
    # a whole host serve only hubs (the health-circuit-breaker shape).
    missing_article_mod: dict = field(default_factory=dict)


def _categories(cfg: SiteConfig, source: str) -> list[tuple[str, str]]:
    """[(name, slug)] — gamma gets one extra (the excluded one) to exercise F6."""
    names = list(CATEGORY_NAMES[: cfg.n_categories])
    if source == "gamma":
        names = names[: cfg.n_categories - 1] + ["Video"] + names[cfg.n_categories - 1 :]
    return [(n, _slug(n)) for n in names]


def _publish_dt(cfg: SiteConfig, source: str, cat_pos: int, art_idx: int) -> datetime:
    base = datetime.strptime(cfg.base_day, "%Y-%m-%d")
    day = art_idx % cfg.n_days
    hour = (art_idx * 5 + cat_pos * 3 + {"alpha": 0, "beta": 1, "gamma": 2}[source]) % 24
    minute = (art_idx * 17 + cat_pos * 7) % 60
    return base + timedelta(days=day, hours=hour, minutes=minute)


def _time_str(source: str, dt: datetime, relative_as_of: str | None = None) -> str:
    """Render the per-source visible time string (X3/X4 parse targets).

    With ``relative_as_of``, recent beta articles render the relative
    forms; each is minute-exact so the as_of-anchored parse reconstructs
    the publish time bit-for-bit."""
    if source == "alpha":
        # '%d/%m/%Y %H:%M GMT+7' — ConnectAndSave.py:50
        return dt.strftime("%d/%m/%Y %H:%M GMT+7")
    if source == "beta" and relative_as_of:
        as_of = datetime.fromisoformat(relative_as_of)
        secs = (as_of - dt).total_seconds()
        if secs % 60 == 0:
            mins = int(secs // 60)
            if 0 < mins <= 120:
                return f"{mins} phút trước"
            if 0 < mins < 24 * 60 and mins % 60 == 0:
                return f"{mins // 60} giờ trước"
        if dt.date() == (as_of - timedelta(days=1)).date():
            return f"Hôm qua, {dt.hour}:{dt.minute:02d}"
    wd = WEEKDAYS_VI[dt.weekday()]
    if source == "beta":
        # weekday prefix, non-padded day/month, '(GMT+7)' — ConnectAndSave.py:53-60
        return f"{wd}, {dt.day}/{dt.month}/{dt.year}, {dt.strftime('%H:%M')} (GMT+7)"
    return f"{wd}, {dt.day}/{dt.month}/{dt.year} {dt.strftime('%H:%M')} (GMT+7)"


def _art_words(url: str, n: int, rng: random.Random) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _article_urls(cfg: SiteConfig, source: str, cat: tuple[str, str], cat_pos: int) -> list[dict]:
    """Spec rows for one category's articles, newest-last index order."""
    base = cfg.hosts[source]
    name, slug = cat
    rows = []
    for i in range(cfg.articles_per_category):
        dt = _publish_dt(cfg, source, cat_pos, i)
        rng = random.Random(f"{cfg.seed}:{source}:{slug}:{i}")
        title_words = _art_words("", 4 + rng.randrange(4), rng)
        art_slug = _slug(title_words)[:40].strip("-")
        if source == "alpha":
            url = f"{base}/{art_slug}-{dt.strftime('%Y%m%d')}{i:03d}.htm"
        elif source == "beta":
            url = f"{base}/{slug}/{art_slug}-{4000000 + cat_pos * 1000 + i}.html"
        else:
            url = f"{base}/{art_slug}-post{5000000 + cat_pos * 1000 + i}.html"
        rows.append(
            {
                "url": url,
                "source": source,
                "kind": "article",
                "category_name": name,
                "category_slug": slug,
                "category_pos": cat_pos,
                "page_no": 0,
                "listing_pos": i,
                "publish_ts": dt.isoformat(),
                "title_seed": title_words,
                "relative_as_of": cfg.relative_as_of,
            }
        )
    return rows


def build_site(cfg: SiteConfig | None = None) -> list[dict]:
    """Full page-spec list: home, category/listing, article pages, robots."""
    cfg = cfg or SiteConfig()
    specs: list[dict] = []
    for source, base in cfg.hosts.items():
        cats = _categories(cfg, source)
        art_by_cat = {}
        for cat_pos, cat in enumerate(cats):
            art_by_cat[cat[1]] = _article_urls(cfg, source, cat, cat_pos)

        # homepage with category menu (H4)
        specs.append(
            {
                "url": base + "/",
                "source": source,
                "kind": "home",
                "category_name": "",
                "category_slug": "",
                "category_pos": -1,
                "page_no": 0,
                "listing_pos": -1,
                "publish_ts": cfg.base_day + "T00:00:00",
                "menu": [
                    (_category_url(cfg, source, slug), name) for name, slug in cats
                ],
            }
        )

        for cat_pos, (name, slug) in enumerate(cats):
            arts = art_by_cat[slug]
            # listing order: newest first (reference listings are desc by time, T5)
            ordered = sorted(arts, key=lambda r: r["publish_ts"], reverse=True)
            if source == "beta":
                psize = cfg.beta_page_size
                pages = [ordered[i : i + psize] for i in range(0, len(ordered), psize)]
                last_page = max(len(pages), 1)
                for pno, chunk in enumerate(pages, start=1):
                    url = _category_url(cfg, source, slug) + (f"-p{pno}" if pno > 1 else "")
                    specs.append(
                        {
                            "url": url,
                            "source": source,
                            "kind": "listing",
                            "category_name": name,
                            "category_slug": slug,
                            "category_pos": cat_pos,
                            "page_no": pno,
                            "listing_pos": -1,
                            "publish_ts": cfg.base_day + "T00:00:00",
                            "items": [
                                (r["url"], r["publish_ts"]) for r in chunk
                            ],
                            "last_page": last_page,
                        }
                    )
            else:
                specs.append(
                    {
                        "url": _category_url(cfg, source, slug),
                        "source": source,
                        "kind": "listing",
                        "category_name": name,
                        "category_slug": slug,
                        "category_pos": cat_pos,
                        "page_no": 1,
                        "listing_pos": -1,
                        "publish_ts": cfg.base_day + "T00:00:00",
                        "items": [(r["url"], r["publish_ts"]) for r in ordered],
                        "last_page": 1,
                    }
                )
            mod = cfg.missing_article_mod.get(source)
            specs.extend(
                r
                for r in arts
                if not (mod and r["listing_pos"] % mod == 0)
            )
    return specs


def _category_url(cfg: SiteConfig, source: str, slug: str) -> str:
    base = cfg.hosts[source]
    if source == "alpha":
        return f"{base}/{slug}.htm"
    if source == "beta":
        return f"{base}/{slug}"
    return f"{base}/{slug}.html"


# ---------------------------------------------------------------------------
# HTML rendering (pure function of one spec row)
# ---------------------------------------------------------------------------

_CHROME = (
    '<div class="site-header"><span class="logo">{src}</span>'
    '<span class="tagline">tin tức &amp; phân tích</span></div>'
)
_FOOTER = '<div class="site-footer"><span>© 2025 {src}</span></div>'


def _paragraphs(url: str, rng: random.Random) -> list[str]:
    n = 3 + rng.randrange(4)
    out = []
    for p in range(n):
        words = _art_words(url, 18 + rng.randrange(25), rng)
        if rng.random() < 0.3:
            words += " — cung &amp; cầu"
        out.append(words.capitalize() + ".")
    return out


def render_page(spec: dict) -> bytes:
    """Render one spec row to HTML bytes (utf-8)."""
    src = spec["source"]
    kind = spec["kind"]
    rng = random.Random(f"html:{spec['url']}")
    head = f'<html><head><title>{src}</title></head><body>' + _CHROME.format(src=src)
    tail = _FOOTER.format(src=src) + "</body></html>"

    if kind == "home":
        if src == "beta":
            # nested menu: ul.parent > li → ul.sub > li > a (H4 beta shape)
            items = "".join(
                f'<li><span class="group">nhóm</span><ul class="sub"><li>'
                f'<a href="{_rel(spec, href)}">{name}</a></li></ul></li>'
                for href, name in spec["menu"]
            )
            body = f'<nav><ul class="parent">{items}</ul></nav>'
        else:
            cls = "menu-nav" if src == "alpha" else "normal-category"
            items = "".join(
                f'<li><a href="{_rel(spec, href)}">{name}</a></li>'
                for href, name in spec["menu"]
            )
            body = f'<nav><ul class="{cls}">{items}</ul></nav>'
        return (head + body + tail).encode("utf-8")

    if kind == "listing":
        rows = []
        for pos, (aurl, pts) in enumerate(spec["items"]):
            dt = datetime.fromisoformat(pts)
            if src == "alpha":
                rows.append(
                    f'<div class="box-category-item"><a href="{_rel(spec, aurl)}" '
                    f'title="item {pos}">bài {pos}</a><span class="meta"> • </span></div>'
                )
            elif src == "beta":
                h = "h2" if pos % 2 == 0 else "h3"
                rows.append(
                    f'<article class="item-news"><{h} class="title-news">'
                    f'<a href="{_rel(spec, aurl)}">bài {pos}</a></{h}>'
                    f'<p class="description">mô tả {pos}</p></article>'
                )
            else:
                rows.append(
                    f'<article class="article-item"><p class="article-thumbnail">'
                    f'<a href="{_rel(spec, aurl)}"><img src="/t{pos}.jpg"></a></p>'
                    f'<span class="article-publish"> <span class="date">'
                    f"{dt.day:02d}/{dt.month:02d}/{dt.year}</span></span></article>"
                )
        body = "".join(rows)
        if src == "beta":
            # pagination bar (H6): digit links 1..last_page + a next arrow
            digits = "".join(
                f'<a href="?p={p}">{p}</a>' for p in range(1, spec["last_page"] + 1)
            )
            body = (
                f'<div class="list-news-subfolder">{body}</div>'
                f'<div class="button-page">{digits}<a href="#">&gt;</a></div>'
            )
        return (head + body + tail).encode("utf-8")

    if kind == "article":
        dt = datetime.fromisoformat(spec["publish_ts"])
        tstr = _time_str(src, dt, spec.get("relative_as_of"))
        title = spec["title_seed"].capitalize()
        paras = _paragraphs(spec["url"], rng)
        kws = sorted({rng.choice(WORDS) for _ in range(3)})
        if src == "alpha":
            body = (
                f'<div class="detail-time"><div data-role="publishdate"> {tstr} </div></div>'
                f'<h1 class="detail-title"> {title} </h1>'
                '<div class="detail-content afcbc-body">'
                + "".join(f"<p> {p} </p>" for p in paras)
                + '<div class="ads"><p class="VCSortableInPreviewMode"></p></div></div>'
                '<div class="detail-tab">'
                + "".join(f'<a href="/tag/{_slug(k)}.htm">{k}</a>' for k in kws)
                + "</div>"
            )
        elif src == "beta":
            body = (
                '<div class="sidebar-1"><div class="header-content">'
                f'<span class="date">{tstr}</span></div>'
                f'<h1 class="title-detail">{title}</h1>'
                f'<p class="description"> {paras[0]} </p>'
                '<article class="fck_detail">'
                + "".join(f'<p class="Normal"> {p} </p>' for p in paras[1:])
                + "</article>"
                '<div class="tags">'
                + "".join(f'<a class="item-tag" href="/tag/{_slug(k)}">{k}</a>' for k in kws)
                + "</div></div>"
            )
        else:
            body = (
                '<header class="the-article-header">'
                f'<p class="the-article-category"><a href="{_category_url_from_spec(spec)}">'
                f'{spec["category_name"]}</a></p>'
                f'<h1 class="the-article-title">{title}</h1>'
                '<ul class="the-article-meta">'
                f'<li class="the-article-publish"> {tstr} </li></ul></header>'
                '<div class="the-article-body">'
                + "".join(f"<p> {p} </p>" for p in paras)
                + "</div>"
            )
        return (head + body + tail).encode("utf-8")

    raise ValueError(f"unknown kind {kind!r}")


def _category_url_from_spec(spec: dict) -> str:
    slug = spec["category_slug"]
    src = spec["source"]
    if src == "alpha":
        return f"/{slug}.htm"
    if src == "beta":
        return f"/{slug}"
    return f"/{slug}.html"


def _rel(spec: dict, url: str) -> str:
    """Relative or absolute href, deterministically varied to exercise X1."""
    base = url.split("/", 3)
    host_base = base[0] + "//" + base[2]
    rel = "/" + (base[3] if len(base) > 3 else "")
    # alternate: even hash → relative href (needs absolutization), odd → absolute
    return rel if (len(url) % 2 == 0) else host_base + rel


def seed_urls(cfg: SiteConfig | None = None) -> list[str]:
    cfg = cfg or SiteConfig()
    return [base + "/" for base in cfg.hosts.values()]


# ---------------------------------------------------------------------------
# Spark table builders
# ---------------------------------------------------------------------------

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def build_pages_df(spark, cfg: SiteConfig | None = None):
    """``pages`` DataFrame (url, warc_ts, html:binary, text, lang).

    Spec rows ship as a DataFrame; rendering + reference text extraction run
    distributed in ``mapInPandas`` (Arrow-batched — the generator itself obeys
    the no-per-row-Python-in-driver rule). ``text`` holds the byte-identity
    reference extraction for article pages ('' otherwise).
    """
    import json

    from pyspark.sql import functions as F

    cfg = cfg or SiteConfig()
    specs = build_site(cfg)
    spec_rows = [(s["url"], json.dumps(s, ensure_ascii=False)) for s in specs]
    spec_df = spark.createDataFrame(spec_rows, "url string, spec string").repartition(
        min(32, max(1, len(spec_rows) // 16))
    )

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    def render_batches(it):
        from web_scraper_spark.html.extract import extract_article

        for pdf in it:
            out = []
            for spec_json in pdf["spec"]:
                spec = json.loads(spec_json)
                # json round-trips tuples to lists; normalize
                html = render_page(spec)
                if spec["kind"] == "article":
                    art = extract_article(
                        spec["source"], spec["url"], spec["category_name"], html
                    )
                    text = art.content
                else:
                    text = ""
                capture = datetime.fromisoformat(spec["publish_ts"]) + timedelta(hours=1)
                out.append((spec["url"], capture, html, text, "vi"))
            yield pd.DataFrame(out, columns=PAGES_COLUMNS)

    return (
        spec_df.mapInPandas(render_batches, schema=schema)
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    )


def build_robots_df(spark, cfg: SiteConfig | None = None):
    """Per-host robots rules table (host, crawl_delay, disallow array)."""
    cfg = cfg or SiteConfig()
    rows = []
    for source, base in cfg.hosts.items():
        host = base.split("//", 1)[1]
        rows.append(
            (host, float(cfg.crawl_delay[source]), list(cfg.robots_disallow[source]))
        )
    return spark.createDataFrame(
        rows, "host string, crawl_delay double, disallow array<string>"
    )


def build_robots_txt_df(spark, cfg: SiteConfig | None = None):
    """Raw per-host ``/robots.txt`` BODIES (host, robots_txt) rendering the
    same rules build_robots_df hands over directly — the input shape a real
    crawl sees before frontier.robots.parse_robots_txt turns bytes into the
    rules table (round-trip equality tested in tests/test_robots.py)."""
    from web_scraper_spark.frontier.robots import render_robots_txt

    cfg = cfg or SiteConfig()
    rows = []
    for source, base in cfg.hosts.items():
        host = base.split("//", 1)[1]
        rows.append(
            (
                host,
                render_robots_txt(
                    float(cfg.crawl_delay[source]), list(cfg.robots_disallow[source])
                ),
            )
        )
    return spark.createDataFrame(rows, "host string, robots_txt string")


# ---------------------------------------------------------------------------
# Sitemap bodies (sitemaps.org) — the alternative discovery channel
# ---------------------------------------------------------------------------


def _xml_escape(s: str) -> str:
    """sitemaps.org requires entity-escaped <loc> URLs; the exact inverse
    of frontier/sitemap.py::_unescape (& first, so round-trips hold)."""
    for ch, ent in (
        ("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")
    ):
        s = s.replace(ch, ent)
    return s


def build_sitemap_bodies(cfg: SiteConfig | None = None) -> list[tuple[str, str]]:
    """Deterministic (sitemap_url, body) rows for the synthetic site:
    one ``<urlset>`` leaf per source listing EVERY published article URL
    (a site's sitemap is generated from its CMS database, so it includes
    the ``missing_article_mod`` dropouts whose pages 404 — the crawl sees
    them as fetch_failed, exercising the retry budget under sitemap
    seeding), ``<lastmod>`` = the article's publish timestamp, plus one
    ``<sitemapindex>`` naming the leaves (the engine seeds from leaf
    entries only; index rows are the fetch-recursion signal a live
    crawler would follow, and all leaves are already in this list)."""
    cfg = cfg or SiteConfig()
    out: list[tuple[str, str]] = []
    index_locs: list[str] = []
    for source, base in cfg.hosts.items():
        entries = []
        for cat_pos, cat in enumerate(_categories(cfg, source)):
            for r in _article_urls(cfg, source, cat, cat_pos):
                entries.append(
                    f"<url><loc>{_xml_escape(r['url'])}</loc>"
                    f"<lastmod>{r['publish_ts']}</lastmod></url>"
                )
        sm_url = f"{base}/sitemap-articles.xml"
        index_locs.append(sm_url)
        out.append(
            (
                sm_url,
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                + "\n".join(entries)
                + "\n</urlset>",
            )
        )
    index_body = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(
            f"<sitemap><loc>{_xml_escape(u)}</loc></sitemap>" for u in index_locs
        )
        + "\n</sitemapindex>"
    )
    first_base = next(iter(cfg.hosts.values()))
    out.insert(0, (f"{first_base}/sitemap.xml", index_body))
    return out


def build_sitemaps_df(spark, cfg: SiteConfig | None = None):
    """``build_sitemap_bodies`` as the (sitemap_url, body) DataFrame
    frontier/sitemap.py::sitemap_entries and the engine's sitemap seed
    path consume."""
    return spark.createDataFrame(
        build_sitemap_bodies(cfg), "sitemap_url string, body string"
    )
