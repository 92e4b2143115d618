"""End-to-end daily-recrawl loop: streaming ingest drains crawl
segment 1 -> cold PageRank; segment 2 lands -> ingest picks up ONLY
the new files -> WARM-START PageRank on the grown edge table. The warm
run must converge in strictly fewer rounds than a cold run on the same
table and produce the same ranks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.sources.pages_synth import synth_pages
from dxa_pagerank_spark.streaming.ingest import run_ingest_once


def test_ingest_then_warm_start_pagerank(spark, tmp_path):
    docs = spark.range(120).select(F.col("id").alias("doc_id"))
    pages = synth_pages(docs, 120)
    seg1 = pages.filter(F.col("url").rlike("/doc/([0-9]|[0-7][0-9])$"))
    seg2 = pages.join(seg1, "url", "left_anti")
    crawl_dir = str(tmp_path / "crawl")
    edges_dir = str(tmp_path / "edges")
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(crawl_dir, exist_ok=True)

    # day 1: segment 1 lands, drain, cold pagerank
    seg1.write.mode("append").parquet(crawl_dir)
    run_ingest_once(spark, crawl_dir, edges_dir, ckpt_dir)
    e1 = spark.read.parquet(edges_dir)
    n1 = e1.count()
    base = pagerank(spark, e1, threshold=1e-10, max_rounds=200)
    assert base.converged

    # day 2: segment 2 lands, incremental drain (only new files)
    seg2.write.mode("append").parquet(crawl_dir)
    run_ingest_once(spark, crawl_dir, edges_dir, ckpt_dir)
    e2 = spark.read.parquet(edges_dir)
    from dxa_pagerank_spark.sources.pages import pages_to_edges

    assert e2.count() > n1  # grew, and day-1 rows were not re-ingested
    assert e2.count() == pages_to_edges(pages, id_mode="xxhash64").count()

    cold = pagerank(spark, e2, threshold=1e-10, max_rounds=200)
    warm = pagerank(
        spark, e2, threshold=1e-10, max_rounds=200, initial_ranks=base.ranks
    )
    assert warm.converged and cold.converged
    assert warm.rounds < cold.rounds
    wr = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    cr = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    assert set(wr) == set(cr)
    for i in cr:
        assert wr[i] == pytest.approx(cr[i], abs=1e-8), i
