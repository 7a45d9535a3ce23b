"""Engine-portable deterministic hashing.

Every sketch operator (MinHash, SimHash, LSH banding, fingerprints) needs a
hash whose VALUE is identical in Spark and in the DuckDB oracle, or the
driver's value-hash comparison can never pass. ``xxhash64`` is Spark-only and
DuckDB's ``hash()`` is DuckDB-only, so the portable primitive is:

    hash60(s) = int(md5(s)[:15 hex chars], 16)        # 60 bits, always >= 0

Spark:   conv(substr(md5(s), 1, 15), 16, 10)  cast long
DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT
Python:  int(hashlib.md5(s).hexdigest()[:15], 16)

Seeded family: hash60(seed || ':' || s) — independent enough for MinHash
(md5 avalanche), deterministic across engines and runs.

md5 is ~3x slower than xxhash64 but both run JVM-side inside whole-stage
codegen; at 100 TB the sketch hash cost is dominated by the shuffle it
feeds either way. The crawl engine's hot URL-dedup path keeps native
``xxhash64`` (web_scraper_spark/urls.py) — only oracle-checked sketches pay
the md5 premium.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits: fits signed BIGINT in both engines, never negative


def hash60(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("long")


def seeded_hash60(seed: int, col: Column | str) -> Column:
    """hash60 of ``seed || ':' || value`` — the seeded family for MinHash."""
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat_ws(":", F.lit(str(seed)), c))


def hash60_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`hash60` for a SQL expression string."""
    return f"(('0x' || substr(md5({expr}), 1, {HEX_CHARS}))::BIGINT)"


def seeded_hash60_sql(seed: int, expr: str) -> str:
    return hash60_sql(f"'{seed}' || ':' || {expr}")


def hash60_py(s: str) -> int:
    """Python twin (simulator / unit tests)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:HEX_CHARS], 16)
