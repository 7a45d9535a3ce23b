"""Local replica of the driver's oracle gate: run every queries() entry on
Spark AND its oracle_sql() twin on DuckDB at a given sf, compare row count,
column names, and order-insensitive values.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits: strict enough to catch everything the
        # driver's exact value-hash catches (r1's top3 penny diff was at
        # the 8th digit and slipped through the old %.6g), loose enough
        # not to flag sub-1e-12 IEEE noise on double-only columns
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from web_scraper_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            print(f"{name:28s} ROWS-ONLY (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"{name:28s} SPARK-FAIL {str(ex).splitlines()[0][:140]}")
            continue
        try:
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"{name:28s} ORACLE-FAIL {str(ex).splitlines()[0][:140]}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            sk, dk = frame_key(srows, scols), frame_key(drows, dcols)
            if sk != dk:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sk, dk)) if a != b), None
                )
                problems.append(
                    f"values differ at sorted-row {diff}:\n  spark={sk[diff][:200]}\n  duck ={dk[diff][:200]}"
                )
        if problems:
            failures.append(name)
            print(f"{name:28s} MISMATCH {'; '.join(problems)}")
        else:
            print(f"{name:28s} OK ({len(srows)} rows)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
