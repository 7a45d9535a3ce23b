#!/usr/bin/env python
"""Cluster entry point: run the crawl engine under spark-submit.

    spark-submit --py-files web_scraper_spark.zip scripts/run_crawl.py \
        --state-dir hdfs:///crawl/state --pages hdfs:///cc/pages \
        --robots hdfs:///cc/robots --seeds seeds.txt \
        --as-of 2025-12-01T22:30:00 --rounds 8 [--resume]

Master/executors come from spark-submit (the session builder sets no
master here); local smoke: --synthetic uses the in-repo deterministic
site instead of stored tables.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python scripts/run_crawl.py` runs (no --py-files) find the package
# relative to this file; under spark-submit the zip on the path wins
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--pages", help="parquet/Iceberg path of the pages table")
    ap.add_argument("--robots", help="parquet path of robots rules (host, crawl_delay, disallow)")
    ap.add_argument("--seeds", help="text file, one seed URL per line")
    ap.add_argument("--as-of", default="2025-12-01T22:30:00")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--round-seconds", type=float, default=60.0)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic", action="store_true", help="use the in-repo deterministic site")
    ap.add_argument(
        "--hygiene",
        action="store_true",
        help="enable the composed scheduler gates (health circuit breaker, "
        "per-template trap budget; plus redirect resolution when --redirects "
        "is given)",
    )
    ap.add_argument(
        "--redirects",
        help="parquet path of redirect edges (src, dst) consumed under --hygiene",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("web_scraper_spark.crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from web_scraper_spark.frontier.engine import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(
        as_of=args.as_of,
        round_seconds=args.round_seconds,
        max_rounds=args.rounds,
        n_buckets=args.n_buckets,
        salt=args.salt,
        hygiene=args.hygiene,
    )
    if args.synthetic:
        from web_scraper_spark.synth import build_pages_df, build_robots_df, seed_urls
        from web_scraper_spark.synth.sitegen import SiteConfig

        site = SiteConfig()
        pages, robots, seeds = (
            build_pages_df(spark, site).cache(),
            build_robots_df(spark, site),
            seed_urls(site),
        )
    else:
        pages = spark.read.parquet(args.pages)
        robots = spark.read.parquet(args.robots)
        seeds = (
            [l.strip() for l in open(args.seeds) if l.strip()] if args.seeds else None
        )

    redirects = spark.read.parquet(args.redirects) if args.redirects else None
    eng = CrawlEngine(spark, pages, robots, args.state_dir, cfg, redirects=redirects)
    results = eng.run(seeds=seeds, resume=args.resume)
    for r in results:
        print(json.dumps({"round": r.round, **r.metrics}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
