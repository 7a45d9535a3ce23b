"""sitemaps.org protocol parsing — pure-codegen XML extraction.

The reference crawler discovers URLs only by walking menus/listings
(crawler.py link loops); production news crawlers seed from the sites'
sitemaps (https://www.sitemaps.org/protocol.html — `<urlset>` leaf
sitemaps and `<sitemapindex>` index files). This module parses raw
sitemap bodies into a typed entries table with NO Python in the plan:
one `regexp_extract_all` explode per body plus per-field
`regexp_extract`s, all whole-stage-codegen expressions, so a 100 TB
sitemap dump parses at scan speed and the explode's fan-out parallelizes
the per-entry work.

Every regex is RE2-safe (non-greedy quantifiers + (?s), no lookarounds,
no backreferences) and mirrored verbatim in the `_sql` twins so DuckDB
oracles the parse value-exactly.

Scale shape: the input is one row per sitemap BODY (bounded at 50k URLs
/ 50 MB by the protocol), so the explode fans each body into ≤50k rows
— no skew beyond the spec's own cap; a host with millions of URLs ships
many bodies under one index, which is exactly the partition-friendly
layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one <url>…</url> (leaf) or <sitemap>…</sitemap> (index) block; (?s)
# because sitemap generators pretty-print with newlines inside blocks
_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_FIELD_RES = {
    "loc": r"(?s)<loc>\s*(.*?)\s*</loc>",
    "lastmod": r"(?s)<lastmod>\s*(.*?)\s*</lastmod>",
    "changefreq": r"(?s)<changefreq>\s*(.*?)\s*</changefreq>",
    "priority": r"(?s)<priority>\s*(.*?)\s*</priority>",
}

# sitemaps.org requires entity-escaped URLs; unescape on the way out.
# &amp; must be LAST so '&amp;lt;' round-trips as the literal '&lt;'.
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&")]


def _unescape(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _unescape_sql(expr: str) -> str:
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    return expr


def sitemap_entries(
    bodies: DataFrame, url_col: str = "sitemap_url", body_col: str = "body"
) -> DataFrame:
    """Raw sitemap XML bodies → one row per entry.

    Output: (sitemap_url, kind, pos, loc, lastmod, changefreq, priority)
    where kind is 'url' for `<urlset>` leaves and 'sitemap' for
    `<sitemapindex>` children (their loc is the child sitemap to fetch),
    pos is the 1-based position within the body (the protocol's
    deterministic entry order), lastmod/changefreq stay raw strings (W3C
    datetime variants are consumer-specific) and priority is
    DECIMAL(2,1) per the protocol's 0.0-1.0 grid."""
    is_index = F.col(body_col).contains("<sitemapindex")
    # regexp_extract_all needs a foldable pattern: run both and pick
    # (each is one codegen expression; the non-matching one yields [])
    blocks = F.when(
        is_index, F.regexp_extract_all(F.col(body_col), F.lit(_INDEX_BLOCK_RE), F.lit(1))
    ).otherwise(
        F.regexp_extract_all(F.col(body_col), F.lit(_URL_BLOCK_RE), F.lit(1))
    )
    exploded = bodies.select(
        F.col(url_col).alias("sitemap_url"),
        F.when(is_index, F.lit("sitemap")).otherwise(F.lit("url")).alias("kind"),
        F.posexplode(blocks).alias("pos0", "block"),
    )

    def field(name: str) -> Column:
        return F.nullif(F.regexp_extract(F.col("block"), _FIELD_RES[name], 1), F.lit(""))

    return exploded.select(
        "sitemap_url",
        "kind",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        _unescape(field("loc")).alias("loc"),
        field("lastmod").alias("lastmod"),
        field("changefreq").alias("changefreq"),
        field("priority").try_cast("decimal(2,1)").alias("priority"),
    ).where(F.col("loc").isNotNull())


def sitemap_entries_sql(bodies_cte: str = "bodies", url_col: str = "sitemap_url",
                        body_col: str = "body") -> str:
    """DuckDB twin of sitemap_entries over a CTE named ``bodies_cte`` with
    the same (url_col, body_col) columns — identical regexes and entity
    chain, value-exact."""
    fields = {
        name: f"nullif(regexp_extract(block, '{rx}', 1), '')"
        for name, rx in _FIELD_RES.items()
    }
    return f"""
        SELECT {url_col} AS sitemap_url,
               kind,
               pos::INT AS pos,
               {_unescape_sql(fields['loc'])} AS loc,
               {fields['lastmod']} AS lastmod,
               {fields['changefreq']} AS changefreq,
               try_cast({fields['priority']} AS DECIMAL(2,1)) AS priority
        FROM (
            SELECT {url_col},
                   CASE WHEN contains({body_col}, '<sitemapindex')
                        THEN 'sitemap' ELSE 'url' END AS kind,
                   unnest(regexp_extract_all(
                       {body_col},
                       CASE WHEN contains({body_col}, '<sitemapindex')
                            THEN '{_INDEX_BLOCK_RE}'
                            ELSE '{_URL_BLOCK_RE}' END,
                       1)) AS block,
                   generate_subscripts(regexp_extract_all(
                       {body_col},
                       CASE WHEN contains({body_col}, '<sitemapindex')
                            THEN '{_INDEX_BLOCK_RE}'
                            ELSE '{_URL_BLOCK_RE}' END,
                       1), 1) AS pos
            FROM {bodies_cte}
        )
        WHERE {_unescape_sql(fields['loc'])} IS NOT NULL
    """
