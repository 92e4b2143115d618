"""spark-submit entry for recrawl planning: rank-prioritised,
robots-compliant, sitemap-augmented fetch waves.

The operational counterpart of jobs/linkgraph_job.py: where that job
reads a crawl, this one plans the next crawl. One submit composes the
full frontier pipeline a production crawler runs between snapshots:

  1. priority        — converged PageRank over the current edge table
                       (operators/pagerank); importance-first recrawl
  2. discovery       — sitemap URLs the crawl has never fetched enter
                       the frontier at the sitemap priority, scaled to
                       the rank range (functions/sitemaps)
  3. exclusion       — robots.txt rules parsed and enforced: banned
                       hosts, Disallow prefixes, Crawl-delay politeness
                       scaling (functions/robots)
  4. scheduling      — per-host politeness waves (functions/frontier
                       semantics, delay-aware via apply_robots)

Usage:
  spark-submit --py-files dxa_pagerank_spark.zip jobs/crawl_job.py \
      EDGES_PARQUET --out DIR [--robots PARQUET] [--sitemaps PARQUET]
      [--cores C] [--per-host 3] [--max-waves 10] [--site-block 25]
      [--damping 0.85] [--threshold 1e-8] [--max-rounds 60]

  --robots:   (host long, robots_txt string) parquet; omit = no rules
  --sitemaps: (host long, sitemap_xml string) parquet; omit = none

Outputs:
  <out>/schedule/    — (id, host, host_rank, wave) parquet
  <out>/discovered/  — sitemap-only URLs entering the frontier
  <out>/report.json  — scalar funnel (urls in/banned/blocked/scheduled)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_crawl(spark, edges, robots, sitemaps, args):
    """-> (schedule df, discovered df, report dict). Split from main()
    so tests drive it without a subprocess. ``robots`` / ``sitemaps``
    may be None."""
    from pyspark.sql import functions as F

    from dxa_pagerank_spark.functions.robots import apply_robots, parse_robots
    from dxa_pagerank_spark.functions.sitemaps import (
        parse_sitemaps,
        sitemap_discovery,
    )
    from dxa_pagerank_spark.operators.pagerank import pagerank

    res = pagerank(
        spark,
        edges,
        damping=args.damping,
        threshold=args.threshold,
        max_rounds=args.max_rounds,
        num_partitions=args.cores,
    )
    frontier = res.ranks.select(
        "id",
        (F.col("id") / args.site_block).cast("long").alias("host"),
        F.concat(F.lit("/doc/"), F.col("id").cast("string")).alias("path"),
        F.col("rank").alias("priority"),
    )
    report = {
        "pagerank_rounds": res.rounds,
        "pagerank_converged": bool(res.converged),
        "n_crawled_urls": frontier.count(),
        "n_discovered": 0,
    }

    discovered = None
    if sitemaps is not None:
        listed = parse_sitemaps(sitemaps)
        crawled = frontier.select(
            F.concat(F.lit("/doc/"), F.col("id").cast("string")).alias("url")
        )
        # sitemap locs are paths in this job's url model; discovery
        # flags the ones the crawl lacks
        discovered = sitemap_discovery(listed, crawled).filter(~F.col("crawled"))
        report["n_discovered"] = discovered.count()
        # discovered URLs enter the frontier at the sitemap priority
        # scaled into the rank range (max rank x hint), with the
        # deterministic xxhash64(loc) id the page will get when crawled
        # (pages_to_edges id_mode='xxhash64')
        max_rank = res.ranks.agg(F.max("rank")).collect()[0][0] or 1.0
        additions = discovered.select(
            F.xxhash64("loc").alias("id"),
            "host",
            F.col("loc").alias("path"),
            (F.col("priority") * F.lit(max_rank)).alias("priority"),
        )
        frontier = frontier.unionAll(additions)

    rules = None
    if robots is not None:
        rules = parse_robots(robots)
    else:
        rules = spark.createDataFrame(
            [],
            "host long, disallow_all boolean, crawl_delay long, "
            "prefixes array<string>",
        )

    schedule = apply_robots(
        frontier, rules, per_host=args.per_host, max_waves=args.max_waves
    )
    report["n_scheduled"] = schedule.count()
    report["n_excluded"] = (
        report["n_crawled_urls"] + report["n_discovered"]
        - report["n_scheduled"]
    )
    report["n_waves"] = schedule.agg(
        F.countDistinct("wave")
    ).collect()[0][0]
    return schedule, discovered, report


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("edges")
    p.add_argument("--out", required=True)
    p.add_argument("--robots", default=None)
    p.add_argument("--sitemaps", default=None)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--per-host", dest="per_host", type=int, default=3)
    p.add_argument("--max-waves", dest="max_waves", type=int, default=10)
    p.add_argument("--site-block", dest="site_block", type=int, default=25)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=1e-8)
    p.add_argument("--max-rounds", dest="max_rounds", type=int, default=60)
    args = p.parse_args(argv)

    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="dxa_crawl_job", cores=args.cores)
    edges = spark.read.parquet(args.edges)
    robots = spark.read.parquet(args.robots) if args.robots else None
    sitemaps = spark.read.parquet(args.sitemaps) if args.sitemaps else None

    schedule, discovered, report = plan_crawl(
        spark, edges, robots, sitemaps, args
    )
    schedule.write.mode("overwrite").parquet(
        os.path.join(args.out, "schedule")
    )
    if discovered is not None:
        discovered.write.mode("overwrite").parquet(
            os.path.join(args.out, "discovered")
        )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
