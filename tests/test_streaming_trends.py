"""Trending-terms: batch == streaming parity + rank correctness."""

from __future__ import annotations

import datetime as dt
import os
import shutil

from dxa_pagerank_spark.streaming.events import run_stream_to_memory
from dxa_pagerank_spark.streaming.trends import (
    stream_pages_from_parquet,
    top_terms_per_window,
    windowed_term_counts,
)


def _pages(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    texts = ["spark streams fast", "spark joins", "fast spark spark",
             "slow batch", "batch spark wins", "streams win big"]
    for i in range(24):
        rows.append(
            (
                f"https://t.example/{i}",
                base + dt.timedelta(minutes=3 * i),
                bytearray(b"<html></html>"),
                texts[i % len(texts)],
                "en",
            )
        )
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )


def _replica_counts(rows, window_min=10):
    out = {}
    for url, ts, html, text, lang in rows:
        wstart = ts.replace(
            minute=(ts.minute // window_min) * window_min, second=0
        )
        for t in text.split(" "):
            if t:
                key = (int(wstart.replace(tzinfo=dt.timezone.utc).timestamp()), t)
                out[key] = out.get(key, 0) + 1
    return out


def test_batch_counts_match_replica(spark):
    df = _pages(spark)
    got = {
        (r["window_start"], r["term"]): r["n"]
        for r in windowed_term_counts(df).collect()
    }
    rows = [tuple(r) for r in df.collect()]
    assert got == _replica_counts(rows)


def test_stream_equals_batch(spark, tmp_path):
    df = _pages(spark)
    path = str(tmp_path / "pages_stream")
    # two files -> two triggers
    df.repartition(2).write.mode("overwrite").parquet(path)
    batch = {
        (r["window_start"], r["term"]): r["n"]
        for r in windowed_term_counts(
            spark.read.parquet(path)
        ).collect()
    }
    stream = windowed_term_counts(stream_pages_from_parquet(spark, path))
    q = run_stream_to_memory(stream, name="trend_out")
    try:
        got = {
            (r["window_start"], r["term"]): r["n"]
            for r in spark.sql("select * from trend_out").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_top_terms_rank(spark):
    df = _pages(spark)
    counts = windowed_term_counts(df)
    top = top_terms_per_window(counts, k=2).collect()
    by_w = {}
    for r in top:
        by_w.setdefault(r["window_start"], []).append(r)
    full = {
        (r["window_start"], r["term"]): r["n"] for r in counts.collect()
    }
    for wstart, rws in by_w.items():
        assert len(rws) <= 2
        ranked = sorted(
            ((t, n) for (w, t), n in full.items() if w == wstart),
            key=lambda kv: (-kv[1], kv[0]),
        )[: len(rws)]
        got = sorted(
            ((r["term"], r["n"]) for r in rws),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert got == ranked
