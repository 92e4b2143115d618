"""Stateful streaming sessionization == batch sessionization.

The stream is fed the sf0.001 events parquet one file-chunk at a time;
a far-future sentinel event (dummy user) advances the global watermark
so every real session's event-time timeout fires, then stream output is
compared row-for-row with sessionize_batch on the same input.
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.streaming.sessions import (
    GAP_S,
    sessionize_batch,
    sessionize_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
SENTINEL_USER = -999


def _python_sessions(rows, gap_s=GAP_S):
    """Oracle: fold sorted (user, ts) into gap-delimited sessions."""
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out = set()
    for u, ts in by_user.items():
        ts.sort()
        start = last = ts[0]
        n = 0
        for t in ts:
            if t - last > gap_s:
                out.add((u, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        out.add((u, start, last, n))
    return out


def test_batch_sessionize_matches_python_oracle(spark):
    ev = spark.read.parquet(EVENTS)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev).collect()
    }
    rows = [
        (r["user_id"], int(r["ts"].timestamp()))
        for r in ev.select("user_id", "ts").collect()
    ]
    assert got == _python_sessions(rows)


def test_stream_sessions_equal_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    shutil.copy(EVENTS, os.path.join(src, "part-000.parquet"))

    ev_batch = spark.read.parquet(EVENTS)
    schema_ddl = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(ev_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # watermarks require TIMESTAMP; the parquet fixture is NTZ
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out_name = "sessions_out"
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(out_name)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    def _got():
        return {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql(f"SELECT * FROM {out_name}").collect()
            if r["user_id"] != SENTINEL_USER
        }

    exp = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev_batch).collect()
    }

    def _send_sentinel(i):
        # sentinel events (dummy user, far future) push the watermark
        # past every real session's last_ts + gap; each file is its
        # own microbatch (maxFilesPerTrigger=1), and timeouts fire in
        # the FOLLOWING batch, so at least two advances are needed.
        spark.createDataFrame(
            [
                (
                    10_000_000 + i,
                    max_ts + __import__("datetime").timedelta(days=2 + i),
                    SENTINEL_USER,
                    "sentinel",
                    0.0,
                    "{}",
                )
            ],
            schema_ddl,
        ).write.mode("overwrite").parquet(str(tmp_path / f"sentinel{i}"))
        part = [
            f
            for f in os.listdir(str(tmp_path / f"sentinel{i}"))
            if f.endswith(".parquet")
        ][0]
        # stage OUTSIDE the watched dir, then rename (atomic on the
        # same fs): a plain copy into src can be listed and read
        # half-written by FileStreamSource under IO load, and a
        # once-read file is never re-read
        staged = str(tmp_path / f"staged{i}.parquet")
        shutil.copy(str(tmp_path / f"sentinel{i}") + "/" + part, staged)
        os.rename(staged, os.path.join(src, f"part-00{i + 1}.parquet"))
        q.processAllAvailable()

    try:
        q.processAllAvailable()
        max_ts = ev_batch.agg(F.max("ts")).collect()[0][0]
        _send_sentinel(0)
        _send_sentinel(1)
        # under heavy host load a watermark-advance batch is
        # occasionally absorbed without firing the last timeouts
        # (observed twice in loaded full-suite runs, never isolated);
        # the semantics under test are stream==batch, not the sentinel
        # count, so keep advancing — bounded — until the tail session
        # closes. A real divergence still fails below after 6 tries.
        for i in range(2, 8):
            if _got() == exp:
                break
            time.sleep(1)
            _send_sentinel(i)
    finally:
        q.stop()

    assert _got() == exp
