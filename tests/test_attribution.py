"""Attribution interval join (streaming/attribution.py): batch
last-touch replica + stream==batch pair parity through the file
source."""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dxa_pagerank_spark.streaming.attribution import (
    attributed_clicks,
    attribution_pairs,
    attribution_pairs_stream,
)

_T0 = datetime(2024, 1, 1, 12, 0, 0)


def _mk(minutes, eid, user, etype):
    return (eid, _T0 + timedelta(minutes=minutes), user, etype)


def _fixture(spark):
    rows = [
        # user 1: view@0, view@10, click@12 -> attributed to view@10
        _mk(0, 100, 1, "view"),
        _mk(10, 101, 1, "view"),
        _mk(12, 200, 1, "click"),
        # user 1: click@50 -> view@10 is 40min old (outside 30) -> null
        _mk(50, 201, 1, "click"),
        # user 2: click@5 with no view -> null
        _mk(5, 202, 2, "click"),
        # user 3: simultaneous views (same ts) -> larger view_id wins
        _mk(20, 102, 3, "view"),
        _mk(20, 103, 3, "view"),
        _mk(21, 203, 3, "click"),
        # user 4: view AT the 30-minute boundary counts (<=)
        _mk(0, 104, 4, "view"),
        _mk(30, 204, 4, "click"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _replica_pairs(rows, lookback_min=30):
    views = [(e, t, u) for e, t, u, k in rows if k == "view"]
    out = set()
    for e, t, u, k in rows:
        if k != "click":
            continue
        for ve, vt, vu in views:
            if vu == u and vt <= t <= vt + timedelta(minutes=lookback_min):
                out.add((e, ve))
    return out


def test_batch_pairs_and_last_touch(spark):
    ev = _fixture(spark)
    pairs = {
        (r["click_id"], r["view_id"])
        for r in attribution_pairs(ev).collect()
    }
    rows = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in ev.collect()
    ]
    assert pairs == _replica_pairs(rows)

    att = {
        r["click_id"]: (r["view_id"], r["lag_seconds"])
        for r in attributed_clicks(ev).collect()
    }
    assert att[200] == (101, 120)  # latest view wins
    assert att[201] == (None, None)  # lookback expired
    assert att[202] == (None, None)  # no view at all
    assert att[203] == (103, 60)  # same-ts tie -> larger view_id
    assert att[204] == (104, 1800)  # inclusive 30-min boundary


def test_stream_pairs_match_batch(spark, tmp_path):
    ev = _fixture(spark)
    src = str(tmp_path / "feed")
    os.makedirs(src)
    # two files: early events then late events (file order = arrival)
    early = ev.filter(F.col("ts") < _T0 + timedelta(minutes=15))
    late = ev.filter(F.col("ts") >= _T0 + timedelta(minutes=15))
    for name, df in (("part-000", early), ("part-001", late)):
        d = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(d, part), os.path.join(src, f"{name}.parquet")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        attribution_pairs_stream(stream, watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["click_id"], r["view_id"])
            for r in spark.sql(
                "SELECT click_id, view_id FROM attr_out"
            ).collect()
        }
    finally:
        q.stop()
    want = {
        (r["click_id"], r["view_id"])
        for r in attribution_pairs(ev).collect()
    }
    assert got == want
