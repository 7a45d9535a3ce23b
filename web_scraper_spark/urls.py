"""URL canonicalization + hashing (north-rule: RFC 3986 normalize,
percent-decode, host lowercasing; xxhash64 dedup keys).

The reference deduplicates on *exact* URL strings with no normalization
(SURVEY.md F1, CrawlPaperTuoiTre.py:101-103); the engine canonicalizes
first so equivalent spellings collapse. Two implementations, kept in
lock-step by tests/test_urls.py (property-based):

- :func:`canon_url_py` — pure-Python, used by the sequential simulator
  and inside the vectorized pandas UDF.
- :func:`canon_url` — a Column expression. The structural normalization
  (scheme/host lowercase, default-port strip, fragment strip, empty-path
  → '/', duplicate-slash collapse) is pure native Catalyst; the
  percent-decode of unreserved characters is the one step native SQL
  cannot express, so it runs as an Arrow-batched pandas UDF *only when*
  ``percent_decode=True`` (URLs with no ``%`` never need it — callers on
  the hot path can pre-split on ``contains('%')`` and union, keeping the
  overwhelmingly common case 100% JVM-side codegen).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_URL_RE = re.compile(r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<auth>[^/?#]*)(?P<rest>.*)$")


def _pct_norm(m: re.Match) -> str:
    ch = chr(int(m.group(1), 16))
    if ch in _UNRESERVED:
        return ch
    return "%" + m.group(1).upper()


def canon_url_py(url: str) -> str:
    """RFC 3986 normalization: lowercase scheme+host, drop default port,
    drop fragment, percent-decode unreserved octets + uppercase remaining
    escapes, empty path → '/', collapse duplicate path slashes."""
    if url is None:
        return None
    url = url.strip()
    m = _URL_RE.match(url)
    if not m:
        return url  # non-absolute; leave as-is (reference never sees these)
    scheme = m.group("scheme").lower()
    auth = m.group("auth").lower()
    if ":" in auth:
        host, port = auth.rsplit(":", 1)
        if port == _DEFAULT_PORTS.get(scheme, ""):
            auth = host
    rest = m.group("rest").split("#", 1)[0]
    rest = _PCT_RE.sub(_pct_norm, rest)
    # collapse duplicate slashes in the path (not the query)
    if "?" in rest:
        path, query = rest.split("?", 1)
        rest = re.sub(r"/{2,}", "/", path) + "?" + query
    else:
        rest = re.sub(r"/{2,}", "/", rest)
    if not rest.startswith("/"):
        rest = "/" + rest
    return f"{scheme}://{auth}{rest}"


def _canon_fn(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canon_url_py(u) if u is not None else None)


_canon_udf_cache = None


def _canon_udf():
    # built lazily: pandas_udf registration needs an active session
    global _canon_udf_cache
    if _canon_udf_cache is None:
        from pyspark.sql.types import StringType

        _canon_udf_cache = pandas_udf(_canon_fn, StringType())
    return _canon_udf_cache


def canon_url(col: Column, percent_decode: bool = True) -> Column:
    """Canonicalize a URL column.

    percent_decode=False gives the all-native expression chain (identical
    output for URLs containing no '%' escapes — verified by property test).
    """
    if percent_decode:
        return _canon_udf()(col)
    c = F.trim(col)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    # strip default port for the scheme
    auth = (
        F.when((scheme == "http") & auth.endswith(":80"), F.substring(auth, F.lit(1), F.length(auth) - 3))
        .when((scheme == "https") & auth.endswith(":443"), F.substring(auth, F.lit(1), F.length(auth) - 4))
        .otherwise(auth)
    )
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*(\?.*)?$", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(~path.startswith("/"), F.concat(F.lit("/"), path)).otherwise(path)
    )
    canon = F.concat(scheme, F.lit("://"), auth, path, query)
    # non-absolute inputs pass through untouched (scheme regex missed)
    return F.when(scheme == "", c).otherwise(canon)


def with_canon(df, src: str = "url", out: str = "url_canon"):
    """Attach the canonical URL with the native-first split the module
    docstring prescribes: URLs with no '%' escape (the overwhelmingly
    common case) run the all-native Catalyst chain inside codegen; only
    the %-subset pays the Arrow UDF. The two branches are disjoint
    filters of the same frame union'd back — on a %-free corpus the
    Python stage receives zero rows. NULL urls ride the native branch
    (both paths map NULL → NULL)."""
    has_pct = F.col(src).contains("%")
    clean = df.filter(F.coalesce(~has_pct, F.lit(True))).withColumn(
        out, canon_url(F.col(src), percent_decode=False)
    )
    esc = df.filter(F.coalesce(has_pct, F.lit(False))).withColumn(
        out, _canon_udf()(F.col(src))
    )
    return clean.unionByName(esc)


def url_host(col: Column) -> Column:
    """Lowercased host of a URL column — native (``parse_url`` is JVM-side)."""
    return F.lower(F.parse_url(col, F.lit("HOST")))


def url_hash(col: Column) -> Column:
    """64-bit dedup key: xxhash64 over the canonical URL (native)."""
    return F.xxhash64(col)


def host_py(url: str) -> str:
    m = _URL_RE.match(url or "")
    if not m:
        return ""
    return m.group("auth").lower().rsplit(":", 1)[0] if ":" in m.group("auth") else m.group("auth").lower()


def canon_url_sql(expr: str) -> str:
    """DuckDB twin of the all-native ``canon_url(percent_decode=False)``
    expression chain, regexp-for-regexp (RE2-safe: no backreferences or
    lookarounds). The %-escape branch is Python-only on both sides — the
    oracled query feeds it zero rows; percent-decode equivalence is
    property-tested against :func:`canon_url_py` in tests/test_urls.py."""
    c = f"trim({expr})"
    scheme = f"lower(regexp_extract({c}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    auth0 = f"lower(regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1))"
    auth = f"""
        CASE WHEN {scheme} = 'http' AND {auth0} LIKE '%:80'
                 THEN substr({auth0}, 1, length({auth0}) - 3)
             WHEN {scheme} = 'https' AND {auth0} LIKE '%:443'
                 THEN substr({auth0}, 1, length({auth0}) - 4)
             ELSE {auth0} END
    """
    rest = f"regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^#]*)', 1)"
    path0 = f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1), '/{{2,}}', '/', 'g')"
    path = f"""
        CASE WHEN {path0} = '' THEN '/'
             WHEN {path0} NOT LIKE '/%' THEN '/' || {path0}
             ELSE {path0} END
    """
    query = f"regexp_extract({rest}, '^[^?]*(\\?.*)?$', 1)"
    return f"""
        CASE WHEN {scheme} = '' THEN {c}
             ELSE {scheme} || '://' || {auth} || {path} || {query} END
    """
