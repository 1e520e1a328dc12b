"""spark-submit entry point for the crawl engine (north_rule: "runs via
spark-submit --py-files on a multi-executor cluster").

Usage:
    spark-submit --py-files webcrawler_spark.zip jobs/crawl_round.py \
        --pages PATH --seeds PATH [--robots PATH] \
        [--robots-bodies PATH | --robots-from-pages] --checkpoint DIR \
        [--whitelist d1,d2] [--max-depth 3] [--max-rounds 20] [--resume]

All engine state lives in the checkpoint dir (per-round atomic manifests),
so re-submitting with --resume continues exactly where a killed job
stopped. On a real cluster nothing changes except --master and the
executor/memory flags; the plan shapes (broadcast dims, url_sha1-keyed
shuffles, salted politeness ranking) were chosen for that case.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--robots-bodies", default=None,
                    help="parquet of raw (host, body) robots.txt rows: "
                         "derives admission rules, Crawl-delay budgets and "
                         "the Sitemap: frontier bootstrap")
    ap.add_argument("--robots-from-pages", action="store_true",
                    help="self-configure from the pages table's own "
                         "scheme://host/robots.txt rows (no side channel)")
    ap.add_argument("--round-seconds", type=float, default=60.0,
                    help="polite wall-clock one round models (Crawl-delay "
                         "d => floor(round_seconds/d) fetch slots)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--whitelist", default=None,
                    help="comma-separated primary domains; default: fixtures.WHITELIST")
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--max-rounds", type=int, default=20)
    ap.add_argument("--salt-buckets", default="auto",
                    help="'auto' (hot-host probe, default), 'none', or an int")
    ap.add_argument("--max-fetch-retries", type=int, default=0)
    ap.add_argument("--seen-backend", choices=["bucketed", "parquet"],
                    default="bucketed")
    ap.add_argument("--seen-buckets", type=int, default=None,
                    help="bucket count for the seen table (pinned at store "
                         "creation; default = defaultParallelism — pick "
                         "~fleet cores at 10^10 URLs)")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from webcrawler_spark import fixtures
    from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl

    spark = SparkSession.builder.appName("webcrawler-spark-crawl").getOrCreate()

    pages = spark.read.parquet(args.pages)
    seeds = spark.read.parquet(args.seeds)
    budgets = robots = None
    robots_bodies = (
        spark.read.parquet(args.robots_bodies) if args.robots_bodies else None
    )
    if args.robots:
        robots_df = spark.read.parquet(args.robots)
        budgets = robots_df.select("host", "budget_per_round")
        # prefer the full Allow+Disallow rules when the table carries them
        rcol = "rules" if "rules" in robots_df.columns else "disallow_prefixes"
        robots = robots_df.select("host", rcol)

    whitelist = args.whitelist.split(",") if args.whitelist else fixtures.WHITELIST
    sb = args.salt_buckets
    salt = None if sb == "none" else ("auto" if sb == "auto" else int(sb))
    cfg = CrawlConfig(
        whitelist=whitelist,
        max_depth=args.max_depth,
        max_rounds=args.max_rounds,
        politeness_salt_buckets=salt,
        max_fetch_retries=args.max_fetch_retries,
        seen_backend=args.seen_backend,
        seen_buckets=args.seen_buckets,
        robots_from_pages=args.robots_from_pages,
        round_seconds=args.round_seconds,
    )
    result = run_crawl(
        spark, pages, seeds, cfg, checkpoint_dir=args.checkpoint,
        budgets=budgets, robots=robots, robots_bodies=robots_bodies,
        resume=args.resume,
    )
    print(json.dumps({"rounds": result.rounds, "metrics": result.metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
