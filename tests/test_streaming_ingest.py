"""Streaming crawl ingestion (streaming/ingest.py): stream == batch
edge parity, and incremental pickup of newly-landed files only."""

from pyspark.sql import functions as F

from dxa_pagerank_spark.sources.pages import pages_to_edges
from dxa_pagerank_spark.sources.pages_synth import synth_pages
from dxa_pagerank_spark.streaming.ingest import run_ingest_once


def _pages(spark, lo, hi, n):
    docs = spark.createDataFrame([(i,) for i in range(lo, hi)], "doc_id LONG")
    return synth_pages(docs, n)


def _edge_multiset(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


def test_stream_equals_batch_and_incremental_pickup(spark, tmp_path):
    n = 40
    inp = str(tmp_path / "pages_in")
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")

    # first crawl segment lands
    _pages(spark, 0, 25, n).write.mode("append").parquet(inp)
    run_ingest_once(spark, inp, out, ckpt)
    got1 = _edge_multiset(spark.read.parquet(out))
    ref1 = _edge_multiset(
        pages_to_edges(_pages(spark, 0, 25, n), id_mode="xxhash64")
    )
    assert got1 == ref1 and len(got1) > 0

    # second segment lands; a re-run consumes ONLY the new files
    _pages(spark, 25, 40, n).write.mode("append").parquet(inp)
    run_ingest_once(spark, inp, out, ckpt)
    got2 = _edge_multiset(spark.read.parquet(out))
    ref2 = _edge_multiset(
        pages_to_edges(_pages(spark, 0, 40, n), id_mode="xxhash64")
    )
    assert got2 == ref2

    # idempotence: nothing new -> nothing appended
    run_ingest_once(spark, inp, out, ckpt)
    assert _edge_multiset(spark.read.parquet(out)) == got2


def test_streaming_plan_is_stateless(spark, tmp_path):
    from dxa_pagerank_spark.streaming.ingest import stream_pages_to_edges

    inp = str(tmp_path / "pages_in2")
    _pages(spark, 0, 10, 10).write.mode("append").parquet(inp)
    sdf = stream_pages_to_edges(spark, inp)
    assert sdf.isStreaming
    # stateless projection: no aggregation/state operators in the plan
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "Aggregate" not in plan and "Join" not in plan
