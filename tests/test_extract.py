"""Byte-identity contract for extraction (SURVEY.md §2.4, §5).

Golden literal checks: hand-written HTML fixtures with *hand-computed*
expected strings (independent of the extractor implementation), one per
reference page shape, plus structural checks on the synthetic site.
"""

from web_scraper_spark.html.extract import extract_article, extract_links
from web_scraper_spark.synth.sitegen import SiteConfig, build_site, render_page

ALPHA_HTML = b"""
<html><body>
<div class="detail-time"><div> 01/12/2025 08:30 GMT+7 </div></div>
<h1 class="detail-title"> Gi&aacute; v&agrave;ng h&ocirc;m nay </h1>
<div class="detail-content">
  <p> Doan mot. </p>
  <p>Doan <b>hai</b> dam.</p>
  <div class="ads"><p></p></div>
  <p>  </p>
</div>
<div class="detail-tab"><a href="/tag/a.htm">vang</a><a href="/tag/b.htm"> kinh te </a></div>
</body></html>
"""


def test_alpha_golden():
    a = extract_article("alpha", "u", "Kinh te", ALPHA_HTML)
    assert a.time == "01/12/2025 08:30 GMT+7"
    assert a.title == "Giá vàng hôm nay"
    # ' '.join of per-<p> get_text(strip=True); each empty <p> contributes ''
    # (two empty <p>s → two trailing separator spaces, exactly as bs4 would)
    assert a.content == "Doan mot. Doanhaidam.  "
    assert a.keyword == "vang,kinh te"
    assert a.source == "Tuoi tre"


BETA_HTML = b"""
<html><body><div class="sidebar-1">
<div class="header-content"><span class="date">Th\xe1\xbb\xa9 hai, 1/12/2025, 08:30 (GMT+7)</span></div>
<h1 class="title-detail">Tieu de beta</h1>
<p class="description"> Mo ta dau. </p>
<article class="fck_detail">
  <p class="Normal">Noi dung mot.</p>
  <p class="Normal"> Noi dung hai. </p>
  <p class="note">bo qua</p>
</article>
<a class="item-tag" href="/t1">tag mot</a><a class="item-tag" href="/t2">tag hai</a>
</div></body></html>
"""


def test_beta_golden():
    a = extract_article("beta", "u", "The thao", BETA_HTML)
    assert a.time == "Thứ hai, 1/12/2025, 08:30 (GMT+7)"
    assert a.title == "Tieu de beta"
    # f"{lead} {body}".strip() — CrawlPaperVNExpress.py:146
    assert a.content == "Mo ta dau. Noi dung mot. Noi dung hai."
    assert a.keyword == "tag mot,tag hai"


GAMMA_HTML = b"""
<html><body>
<header class="the-article-header">
 <p class="the-article-category"><a href="/c.html">Cong nghe</a></p>
 <h1 class="the-article-title">Tieu de gamma</h1>
 <ul class="the-article-meta"><li class="the-article-publish"> Th\xe1\xbb\xa9 ba, 2/12/2025 09:15 (GMT+7) </li></ul>
</header>
<div class="the-article-body"><p>Mot.</p><p>Hai.</p></div>
</body></html>
"""


def test_gamma_golden():
    a = extract_article("gamma", "u", "ignored", GAMMA_HTML)
    assert a.category == "Cong nghe"  # category read from page, not hint
    assert a.time == "Thứ ba, 2/12/2025 09:15 (GMT+7)"
    assert a.title == "Tieu de gamma"
    assert a.content == "Mot. Hai."
    assert a.keyword == "Null"


def test_missing_elements_defaults():
    a = extract_article("alpha", "u", "c", b"<html><body><p>x</p></body></html>")
    assert a.time == "N/A"
    assert a.title == "Không có tiêu đề"
    assert a.content == ""
    assert a.keyword == ""


def test_synthetic_site_extraction_coverage(site_cfg):
    """Every synthetic article page extracts nonempty title/content/time."""
    specs = build_site(site_cfg)
    n = 0
    for s in specs:
        if s["kind"] != "article":
            continue
        a = extract_article(s["source"], s["url"], s["category_name"], render_page(s))
        assert a.title and a.content and a.time not in ("", "N/A"), s["url"]
        n += 1
    assert n >= 100


def test_menu_and_listing_links(site_cfg):
    specs = build_site(site_cfg)
    by = {}
    for s in specs:
        by.setdefault((s["source"], s["kind"]), []).append(s)
    for src in ["alpha", "beta", "gamma"]:
        home = by[(src, "home")][0]
        pl = extract_links(src, "home", site_cfg.hosts[src], render_page(home))
        assert [n for _, n in pl.categories] == [n for _, n in home["menu"]]
        assert all(h.startswith("http") for h, _ in pl.categories)
        listing = by[(src, "listing")][0]
        pl2 = extract_links(src, "listing", site_cfg.hosts[src], render_page(listing))
        assert pl2.articles == [
            u if u.startswith("http") else site_cfg.hosts[src] + u
            for u, _ in listing["items"]
        ]
    # beta pagination metadata (H6)
    b1 = [s for s in by[("beta", "listing")] if s["page_no"] == 1][0]
    pl3 = extract_links("beta", "listing", site_cfg.hosts["beta"], render_page(b1))
    assert pl3.last_page == b1["last_page"] > 1
