"""DOM parser + CSS-select subset + get_text semantics (byte-identity base)."""

from web_scraper_spark.html.dom import get_text, parse_html, select, select_one

DOC = """
<html><body>
<div class="a outer">
  <p class="x">one <b>bold</b> tail</p>
  <div><p class="x y">two</p></div>
  <span class="x">not-p</span>
</div>
<p class="x">three</p>
<ul class="menu-nav">
 <li><a href="/k">K &amp; Q</a></li>
 <li><a href="/t"> spaced </a></li>
</ul>
<div class="btn"><a href="#">1</a><a href="#">2</a><a href="#">&gt;</a></div>
</body></html>
"""


def test_select_descendant_vs_child():
    root = parse_html(DOC)
    assert len(select(root, "div.a p.x")) == 2  # descendant
    assert len(select(root, "div.a > p.x")) == 1  # child only
    assert len(select(root, "p.x")) == 3
    assert len(select(root, "p.x.y")) == 1
    assert select_one(root, "p.x") is not None
    assert select_one(root, "p.zzz") is None


def test_comma_alternation_dedup_document_order():
    root = parse_html(DOC)
    els = select(root, "p.x, p.y, div.a p")
    texts = [get_text(e, strip=True) for e in els]
    assert texts == ["oneboldtail", "two", "three"]


def test_get_text_strip_semantics():
    root = parse_html("<p>  a  <b> b </b>  <i>  </i> c </p>")
    p = select_one(root, "p")
    # bs4 get_text(strip=True): each string stripped, empties dropped, '' joined
    assert get_text(p, strip=True) == "abc"
    assert get_text(p) == "  a   b      c "
    assert get_text(p, separator=" ", strip=True) == "a b c"


def test_entity_decoding():
    root = parse_html(DOC)
    a = select_one(root, "ul.menu-nav > li > a")
    assert get_text(a, strip=True) == "K & Q"
    arrows = [get_text(x) for x in select(root, "div.btn a")]
    assert arrows == ["1", "2", ">"]


def test_void_elements_do_not_nest():
    root = parse_html('<p>a<br>b<img src="x">c</p><p>d</p>')
    ps = select(root, "p")
    assert len(ps) == 2
    assert get_text(ps[0], strip=True) == "abc"


def test_attr_and_classes():
    root = parse_html('<a class="tag red" href="/z">z</a>')
    a = select_one(root, "a.tag")
    assert a.get("href") == "/z"
    assert select_one(root, "a.tag.red") is not None
    assert select_one(root, "a.blue") is None
