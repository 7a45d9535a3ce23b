"""Minimal DOM + CSS-select subset on the stdlib ``html.parser``.

This is the byte-identity surface of the engine: the reference extracts
text with ``BeautifulSoup(page, 'html.parser')`` + CSS selects +
``get_text(strip=True)`` (e.g. /root/reference/CrawlPaperTuoiTre.py:110-127).
bs4 is not available in this environment, so we implement the *semantics we
rely on* directly over the same underlying stdlib parser that bs4's
``html.parser`` tree-builder wraps:

- ``parse_html`` builds an element tree with ``convert_charrefs=True``
  (entity decoding identical to bs4's html.parser default).
- ``select`` supports the selector grammar the reference uses:
  compound ``tag.class`` / ``.class`` / ``tag`` selectors, descendant
  (space) and child (``>``) combinators, and comma alternation —
  returning matches in document order, deduplicated.
- ``get_text(el, strip=True)`` joins each descendant text node stripped,
  dropping empties, with separator '' — bs4 ``get_text(strip=True)``.

The grammar intentionally covers exactly what the reference's selectors
need (SURVEY.md §2.4); anything else raises so silent mismatches cannot
creep into the byte-identity contract.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent: "Element | None" = None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list[Element | str] = []  # str children are text nodes
        self.parent = parent

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def iter_elements(self):
        """All descendant elements in document order (excluding self)."""
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter_elements()

    def __repr__(self):  # pragma: no cover
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # close the nearest matching open tag (html.parser-style recovery)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str | bytes) -> Element:
    if isinstance(html, bytes):
        html = html.decode("utf-8")
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------


def _parse_compound(token: str) -> tuple[str | None, list[str]]:
    """'tag.c1.c2' | '.c1' | 'tag' -> (tag|None, [classes])."""
    if not token or any(ch in token for ch in "[]#:*"):
        raise ValueError(f"unsupported selector token: {token!r}")
    parts = token.split(".")
    tag = parts[0] or None
    return tag, [c for c in parts[1:] if c]


def _parse_selector(sel: str) -> list[list[tuple[str, str | None, list[str]]]]:
    """Parse comma-alternation of combinator chains.

    Each chain is [(combinator, tag, classes), ...] left-to-right, where
    combinator is 'descendant' for the first element and ' '/'>' after.
    """
    alts = []
    for alt in sel.split(","):
        alt = alt.strip()
        if not alt:
            continue
        # normalize child combinator spacing, then split on whitespace
        toks = alt.replace(">", " > ").split()
        chain: list[tuple[str, str | None, list[str]]] = []
        comb = "descendant"
        for tok in toks:
            if tok == ">":
                comb = "child"
                continue
            tag, classes = _parse_compound(tok)
            chain.append((comb, tag, classes))
            comb = "descendant"
        if not chain:
            raise ValueError(f"empty selector alternative in {sel!r}")
        alts.append(chain)
    if not alts:
        raise ValueError(f"empty selector: {sel!r}")
    return alts


def _matches_compound(el: Element, tag: str | None, classes: list[str]) -> bool:
    if tag is not None and el.tag != tag:
        return False
    if classes:
        el_classes = el.classes
        return all(c in el_classes for c in classes)
    return True


def _matches_chain(el: Element, chain) -> bool:
    """Right-to-left match of the combinator chain anchored at ``el``."""
    comb, tag, classes = chain[-1]
    if not _matches_compound(el, tag, classes):
        return False
    node = el
    for i in range(len(chain) - 2, -1, -1):
        comb_right = chain[i + 1][0]  # combinator binding chain[i] to chain[i+1]
        _, tag_i, classes_i = chain[i]
        if comb_right == "child":
            node = node.parent
            if node is None or not _matches_compound(node, tag_i, classes_i):
                return False
        else:  # descendant: walk up until an ancestor matches
            node = node.parent
            while node is not None and not _matches_compound(node, tag_i, classes_i):
                node = node.parent
            if node is None:
                return False
    return True


def select(root: Element, sel: str) -> list[Element]:
    """All elements matching ``sel`` in document order (dedup across commas)."""
    alts = _parse_selector(sel)
    out: list[Element] = []
    seen: set[int] = set()
    for el in root.iter_elements():
        if id(el) in seen:
            continue
        for chain in alts:
            if _matches_chain(el, chain):
                out.append(el)
                seen.add(id(el))
                break
    return out


def select_one(root: Element, sel: str) -> Element | None:
    alts = _parse_selector(sel)
    for el in root.iter_elements():
        for chain in alts:
            if _matches_chain(el, chain):
                return el
    return None


def _iter_strings(el: Element):
    for c in el.children:
        if isinstance(c, str):
            yield c
        else:
            yield from _iter_strings(c)


def get_text(el: Element, separator: str = "", strip: bool = False) -> str:
    """bs4 ``get_text`` semantics: join descendant strings; with strip=True
    each string is stripped and empties are dropped before joining."""
    if strip:
        parts = [s for s in (t.strip() for t in _iter_strings(el)) if s]
    else:
        parts = list(_iter_strings(el))
    return separator.join(parts)
