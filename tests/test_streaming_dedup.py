"""Streaming exact dedup == batch first-seen-wins on the same feed.

The feed is the sf0.001 documents re-stamped with deterministic event
times, plus a full duplicate wave arriving 10 minutes later under new
ids. Batch keeps exactly the originals; the stream (fed original file
then duplicate file) must keep the same content set.
"""

import os
import shutil

from pyspark.sql import functions as F

from dxa_pagerank_spark.streaming.dedup import dedup_batch, dedup_stream

DOCS = "/root/testdata/sf0.001/documents.parquet"
_EPOCH = 1704067200


def _feed(spark):
    base = spark.read.parquet(DOCS).select(
        "doc_id",
        F.timestamp_seconds(F.lit(_EPOCH) + F.col("doc_id")).alias("ts"),
        "text",
    )
    dupes = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts"),
        "text",
    )
    return base, dupes


def test_batch_dedup_first_seen_wins(spark):
    base, dupes = _feed(spark)
    out = dedup_batch(base.unionByName(dupes))
    kept_ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # distinct texts only — the fixture may contain intra-base dupes;
    # the winner per hash is always the earliest ts (a base row)
    n_distinct = base.select(F.md5("text")).distinct().count()
    assert len(kept_ids) == n_distinct
    assert all(i < 1_000_000 for i in kept_ids)  # duplicates never win


def test_stream_dedup_matches_batch(spark, tmp_path):
    base, dupes = _feed(spark)
    src = str(tmp_path / "feed")
    os.makedirs(src)

    def _one_file(df, name):
        d = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, part), os.path.join(src, f"{name}.parquet"))

    _one_file(base, "part-000")
    _one_file(dupes, "part-001")

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        dedup_stream(stream, horizon="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT doc_id, content_hash FROM dedup_out").collect()
    finally:
        q.stop()

    want_hashes = {
        r["content_hash"]
        for r in dedup_batch(base.unionByName(dupes))
        .select("content_hash")
        .collect()
    }
    assert {r["content_hash"] for r in got} == want_hashes
    assert all(r["doc_id"] < 1_000_000 for r in got)  # first wave won
    assert len(got) == len(want_hashes)  # exactly one survivor per hash
