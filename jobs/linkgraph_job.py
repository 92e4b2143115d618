"""spark-submit entry for the link-graph analytics suite.

The graph counterpart of jobs/webtext_job.py: an edge table (or a
pages crawl, which is first parsed to edges) in, the standard
link-analysis artifact set out — one submit produces everything a
search/quality team reads off a fresh crawl:

  1. pagerank          — converged power iteration (operators/pagerank)
  2. components        — large-star/small-star CC  (operators/components)
  3. site rollup + site pagerank (operators/sitegraph, wpagerank)
  4. degree skew report — gini / quantiles / hub share (graphstats)
  5. graph summary      — reciprocity + assortativity (graphstats)

Usage:
  spark-submit --py-files dxa_pagerank_spark.zip jobs/linkgraph_job.py \
      INPUT_PARQUET --out DIR [--mode edges|pages] [--cores C]
      [--damping 0.85] [--threshold 1e-8] [--max-rounds 60]
      [--site-block 25] [--top-k 100]

Outputs:
  <out>/ranks/        — (id, rank) parquet
  <out>/components/   — (id, component) parquet
  <out>/site_ranks/   — (id, rank) parquet over the site graph
  <out>/top_ranks.json — top-k vertices by (rank desc, id asc)
  <out>/report.json   — scalar summary (counts, convergence, skew, ...)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_analytics(spark, edges, args):
    """edges(src, dst) -> (ranks, components, site_ranks, report dict).
    Split from main() so tests drive it without a subprocess."""
    from pyspark.sql import functions as F

    from dxa_pagerank_spark.operators.components import connected_components
    from dxa_pagerank_spark.operators.graphstats import (
        degree_assortativity,
        degree_skew_report,
        reciprocity,
    )
    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.operators.sitegraph import site_rollup
    from dxa_pagerank_spark.operators.wpagerank import weighted_pagerank
    from pyspark.storagelevel import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    report = {"n_edges": edges.count()}

    res = pagerank(
        spark,
        edges,
        damping=args.damping,
        threshold=args.threshold,
        max_rounds=args.max_rounds,
        num_partitions=args.cores,
    )
    ranks = res.ranks
    report["pagerank_rounds"] = res.rounds
    report["pagerank_converged"] = bool(res.converged)
    report["n_vertices"] = ranks.count()

    comps = connected_components(spark, edges)
    report["n_components"] = comps.agg(
        F.countDistinct("component")
    ).collect()[0][0]

    sites = site_rollup(edges, block_size=args.site_block)
    site_ranks = weighted_pagerank(
        spark, sites, damping=args.damping, rounds=10
    )
    report["n_sites"] = site_ranks.count()

    skew = degree_skew_report(spark, edges, direction="in", top_k=10)
    report["in_degree_skew"] = skew.collect()[0].asDict()
    report["reciprocity"] = reciprocity(edges).collect()[0].asDict()
    report["assortativity"] = (
        degree_assortativity(edges).collect()[0].asDict()
    )
    edges.unpersist()
    return ranks, comps, site_ranks, report


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="parquet path: edges(src,dst) or pages")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["edges", "pages"], default="edges")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--threshold", type=float, default=1e-8)
    ap.add_argument("--max-rounds", type=int, default=60)
    ap.add_argument("--site-block", type=int, default=25)
    ap.add_argument("--top-k", type=int, default=100)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="dxa_linkgraph_job", cores=args.cores)
    df = spark.read.parquet(args.input)
    if args.mode == "pages":
        from dxa_pagerank_spark.sources.pages import pages_to_edges

        edges = pages_to_edges(df)
    else:
        edges = df.select("src", "dst")
    ranks, comps, site_ranks, report = run_analytics(spark, edges, args)

    os.makedirs(args.out, exist_ok=True)
    ranks.write.mode("overwrite").parquet(os.path.join(args.out, "ranks"))
    comps.write.mode("overwrite").parquet(
        os.path.join(args.out, "components")
    )
    site_ranks.write.mode("overwrite").parquet(
        os.path.join(args.out, "site_ranks")
    )
    top = [
        {"id": r["id"], "rank": r["rank"]}
        for r in ranks.orderBy(F.desc("rank"), F.asc("id"))
        .limit(args.top_k)
        .collect()
    ]
    with open(os.path.join(args.out, "top_ranks.json"), "w") as f:
        json.dump(top, f, indent=2)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
