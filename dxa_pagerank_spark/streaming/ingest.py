"""Streaming crawl ingestion: pages files -> edges, incrementally.
[north_rule tie-in: the input_hint's Common-Crawl-shaped pages table,
consumed as a Structured Streaming file source instead of a batch scan
— new crawl segments land as files and flow to the edge table with no
batch re-run]

The transformation IS the batch one: ``pages_to_edges`` (anchor-parse
UDF + xxhash64 ids) is a pure per-row column program, so the identical
code object runs under ``readStream`` — stream == batch parity is
pinned in tests, the same discipline as streaming/{events,sessions,
dedup}.py. Edges append to partitioned parquet; exactly-once comes
from the file-source + checkpoint offsets (each input file is consumed
exactly once; the parquet sink commits atomically per microbatch).

Per-microbatch cost: one scan of the NEW files only, a projection
(parse + hash), zero shuffles before the sink. Degree maintenance at
100 TB belongs downstream (periodic compaction job or the metrics
table), not in the per-batch path — a streaming global groupBy(src)
would hold |V| state forever in the state store for a table that one
batch aggregate rebuilds in minutes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dxa_pagerank_spark.schemas import PAGES
from dxa_pagerank_spark.sources.pages import pages_to_edges


def stream_pages(spark: SparkSession, input_path: str) -> DataFrame:
    """File-source stream over a directory of pages parquet files."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_path)
    )


def stream_pages_to_edges(spark: SparkSession, input_path: str) -> DataFrame:
    """Streaming edges(src, dst) — the batch pages_to_edges column
    program under readStream (xxhash64 id mode: no join against a
    static url-id side, so the stream stays stateless)."""
    return pages_to_edges(stream_pages(spark, input_path), id_mode="xxhash64")


def stream_warc_pages(spark: SparkSession, input_path: str) -> DataFrame:
    """Streaming pages(url, warc_ts, html) from WARC archives landing in
    a directory — new crawl segments arrive as files (exactly how
    Common Crawl publishes), each consumed exactly once via file-source
    checkpoint offsets. The record walk is the identical stateless
    Arrow projection as the batch reader (sources/warc.py
    parse_warc_files), so stream == batch by construction; compose with
    ``pages_to_edges`` for a streaming edge table."""
    from dxa_pagerank_spark.sources.warc import (
        BINARYFILE_SCHEMA,
        parse_warc_files,
    )

    files = (
        spark.readStream.format("binaryFile")
        .schema(BINARYFILE_SCHEMA)
        .option("pathGlobFilter", "*.warc")
        .option("maxFilesPerTrigger", 4)
        .load(input_path)
    )
    return parse_warc_files(files)


def run_ingest_once(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Drain everything currently in input_path into the edge table
    (Trigger.AvailableNow — processes all pending files in bounded
    microbatches, then stops; re-invoking later picks up ONLY new files
    via the checkpoint). This is the incremental-crawl entry point."""
    q = (
        stream_pages_to_edges(spark, input_path)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
