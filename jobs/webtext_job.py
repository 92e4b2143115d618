"""spark-submit entry for the webtext curation pipeline.

The training-data counterpart of jobs/pagerank_job.py: pages (or
documents) parquet in, a curated corpus + per-stage yield report out.
No reference counterpart (dxa-pageRank is graph-only); the stage list
is the north_rule LLM-pipeline surface, each stage an audited operator:

  1. snapshot merge   — latest capture per url  (functions/snapshots)
  2. url canonicalize — optional, adds canonical_url (functions/urlnorm)
  3. line dedup       — drop corpus-boilerplate lines (functions/boilerplate)
  4. exact dedup      — min-id per content hash  (functions/dedup)
  4b. CDC dedup gate  — optional --max-dup-frac: drop docs whose
                        content-defined chunks are mostly shared
                        corpus-wide (functions/cdc)
  5. repetition gates — Gopher 2-/3-gram filters (functions/repetition)
  6. quality floor    — composite score          (functions/textstats)
  7. decontamination  — optional benchmark overlap: any-n-gram doc drop
                        (functions/lmscore) or, with --span-contam-frac,
                        the span-level fraction gate (functions/spandedup)
  8. weighted sample  — keep-prob = quality^power (functions/sampling)

Usage:
  spark-submit --py-files dxa_pagerank_spark.zip jobs/webtext_job.py \
      INPUT_PARQUET --out DIR [--mode pages|documents] [--cores C]
      [--boiler-frac 0.5] [--min-quality 0.5] [--sample-power 1]
      [--benchmark PARQUET] [--ngram 3] [--salt 5]

Outputs:
  <out>/corpus/    — curated parquet (input columns + quality, n_tokens)
  <out>/report.json — per-stage row counts (the yield funnel)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(spark, df, args):
    """df -> (curated DataFrame, funnel dict). Split from main() so
    tests drive it without a subprocess."""
    from pyspark.sql import functions as F

    from dxa_pagerank_spark.functions.boilerplate import remove_boilerplate
    from dxa_pagerank_spark.functions.dedup import exact_dedup
    from dxa_pagerank_spark.functions.repetition import repetition_filter
    from dxa_pagerank_spark.functions.sampling import weighted_sample
    from dxa_pagerank_spark.functions.snapshots import latest_snapshot
    from dxa_pagerank_spark.functions.textstats import quality_col, token_count
    from dxa_pagerank_spark.functions.urlnorm import canonicalize_urls

    funnel = {"input": df.count()}
    id_col = "url" if args.mode == "pages" else "doc_id"

    if args.mode == "pages":
        if "warc_ts" in df.columns:
            df = latest_snapshot(df, url_col="url", ts_col="warc_ts")
            funnel["snapshot_merge"] = df.count()
        df = canonicalize_urls(df, url_col="url")
        if args.boiler_frac < 1.0:
            cleaned = remove_boilerplate(
                df.select(F.col("url"), "text"),
                id_col="url",
                max_doc_frac=args.boiler_frac,
            )
            df = df.drop("text").join(
                cleaned.select(F.col("id").alias("url"), "text"), "url"
            )
            funnel["line_dedup"] = df.count()

    # documents mode needs a doc_id; pages mode keys dedup on url order
    if args.mode == "pages" and "doc_id" not in df.columns:
        df = df.withColumn(
            "doc_id", F.xxhash64("url")
        )  # stable 64-bit key for dedup/sampling

    df = exact_dedup(df)
    funnel["exact_dedup"] = df.count()

    # optional CDC near-dup gate: drop docs whose content-defined
    # chunks are mostly shared corpus-wide (functions/cdc.py) —
    # catches partially-duplicated pages exact dedup keeps
    max_dup_frac = getattr(args, "max_dup_frac", None)
    if max_dup_frac is not None:
        from dxa_pagerank_spark.functions.cdc import cdc_dedup_stats

        dup = cdc_dedup_stats(df.select("doc_id", "text")).select(
            F.col("id").alias("doc_id"), "dup_token_frac"
        )
        df = (
            df.join(dup, "doc_id", "left")
            .filter(
                F.coalesce("dup_token_frac", F.lit(0.0)) <= max_dup_frac
            )
            .drop("dup_token_frac")
        )
        funnel["cdc_dedup"] = df.count()

    df = repetition_filter(df, id_col="doc_id")
    funnel["repetition"] = df.count()

    df = df.withColumn("quality", quality_col(F.col("text"))).withColumn(
        "n_tokens", token_count(F.col("text"))
    ).filter(F.col("quality") >= args.min_quality)
    funnel["quality_floor"] = df.count()

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        span_frac = getattr(args, "span_contam_frac", None)
        if span_frac is not None:
            # span-level gate: tolerate incidental overlap up to the
            # fraction threshold instead of dropping any doc sharing a
            # single n-gram (functions/spandedup.py)
            from dxa_pagerank_spark.functions.spandedup import (
                contamination_stats,
            )

            st = contamination_stats(
                df.select("doc_id", "text"), bench, width=args.ngram
            ).select(F.col("id").alias("doc_id"), "contaminated_frac")
            df = (
                df.join(st, "doc_id", "left")
                .filter(
                    F.coalesce("contaminated_frac", F.lit(0.0)) <= span_frac
                )
                .drop("contaminated_frac")
            )
        else:
            from dxa_pagerank_spark.functions.lmscore import decontaminate

            df = decontaminate(df, bench, n=args.ngram, id_col="doc_id")
        funnel["decontamination"] = df.count()

    df = weighted_sample(
        df, "doc_id", "quality", power=args.sample_power, salt=args.salt
    )
    funnel["sampled"] = df.count()
    funnel["id_col"] = id_col
    return df, funnel


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="parquet path: pages or documents shape")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["pages", "documents"], default="documents")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--boiler-frac", type=float, default=0.5)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--sample-power", type=int, default=1)
    ap.add_argument("--benchmark", default=None,
                    help="parquet of benchmark docs for decontamination")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--salt", type=int, default=5)
    ap.add_argument("--max-dup-frac", type=float, default=None,
                    help="drop docs whose CDC dup-token fraction exceeds F")
    ap.add_argument("--span-contam-frac", type=float, default=None,
                    help="with --benchmark: span-level contamination gate"
                         " instead of the any-n-gram doc drop")
    args = ap.parse_args(argv)

    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="dxa_webtext_job", cores=args.cores)
    df = spark.read.parquet(args.input)
    curated, funnel = run_pipeline(spark, df, args)
    curated.write.mode("overwrite").parquet(os.path.join(args.out, "corpus"))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(funnel, f, indent=2)
    print(json.dumps(funnel))


if __name__ == "__main__":
    main()
