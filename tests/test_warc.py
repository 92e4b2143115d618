"""WARC source oracles: fixture-writer/reader roundtrip against the
synthetic pages table, Content-Length record walking under adversarial
payloads, and the end-to-end WARC -> html -> edges parity with
pages_to_edges."""

import os

from pyspark.sql import functions as F

from dxa_pagerank_spark.sources.pages import pages_to_edges
from dxa_pagerank_spark.sources.pages_synth import synth_pages, synth_url_ids
from dxa_pagerank_spark.sources.warc import (
    _parse_warc_bytes,
    _record,
    _response_record,
    read_warc,
    synth_warc_fixture,
)

N = 40


def _docs(spark):
    return spark.range(N).withColumnRenamed("id", "doc_id")


def _fixture(spark, tmp_path_factory, n_files=4):
    out = str(tmp_path_factory.mktemp("warc") / "archive")
    synth_warc_fixture(spark, _docs(spark), out, n_files=n_files)
    return out


def test_roundtrip_matches_synth_pages(spark, tmp_path_factory):
    out = _fixture(spark, tmp_path_factory)
    got = {
        r.url: (r.warc_ts, bytes(r.html))
        for r in read_warc(spark, out).collect()
    }
    want = {
        r.url: (r.warc_ts, bytes(r.html))
        for r in synth_pages(_docs(spark), N).collect()
    }
    assert got == want  # url, timestamp, AND exact html bytes


def test_fixture_is_byte_stable_and_sharded(spark, tmp_path_factory):
    a = _fixture(spark, tmp_path_factory)
    b = _fixture(spark, tmp_path_factory)
    names = sorted(os.listdir(a))
    assert names == [f"part-{i:04d}.warc" for i in range(4)]
    for nm in names:
        with open(os.path.join(a, nm), "rb") as fa, open(
            os.path.join(b, nm), "rb"
        ) as fb:
            assert fa.read() == fb.read()
    # idempotent: re-synth over an existing archive is a no-op
    synth_warc_fixture(spark, _docs(spark), a, n_files=4)
    assert sorted(os.listdir(a)) == names


def test_content_length_walk_survives_adversarial_payload():
    # html that contains a fake record header AND blank lines: only
    # Content-Length arithmetic parses this correctly
    evil = b"<p>pre</p>\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n<p>post</p>"
    raw = (
        _record({"WARC-Type": "warcinfo"}, b"software: x\r\n")
        + _response_record("https://e.org/a", 1704067200, evil)
        + _response_record("https://e.org/b", 1704067201, b"")
    )
    recs = list(_parse_warc_bytes(raw))
    assert recs == [
        ("https://e.org/a", "2024-01-01T00:00:00Z", evil),
        ("https://e.org/b", "2024-01-01T00:00:01Z", b""),
    ]


def test_malformed_archive_fails_loudly():
    try:
        list(_parse_warc_bytes(b"not a warc file"))
    except ValueError as e:
        assert "malformed" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_reader_parallelism_is_per_file(spark, tmp_path_factory):
    out = _fixture(spark, tmp_path_factory, n_files=4)
    files = spark.read.format("binaryFile").load(out + "/*.warc")
    assert files.rdd.getNumPartitions() >= 2  # one WARC file per task
    assert read_warc(spark, out).count() == N


def test_warc_edges_match_pages_to_edges(spark, tmp_path_factory):
    out = _fixture(spark, tmp_path_factory)
    docs = _docs(spark)
    ids = synth_url_ids(docs)
    via_warc = pages_to_edges(read_warc(spark, out), "join", url_ids=ids)
    direct = pages_to_edges(synth_pages(docs, N), "join", url_ids=ids)
    assert sorted(map(tuple, via_warc.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_streaming_warc_equals_batch(spark, tmp_path_factory):
    """stream == batch: the WARC record walk under readStream
    (streaming/ingest.py stream_warc_pages) drains the same archive to
    the same rows as the batch reader."""
    from dxa_pagerank_spark.streaming.ingest import stream_warc_pages

    out = _fixture(spark, tmp_path_factory)
    q = (
        stream_warc_pages(spark, out)
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.url, r.warc_ts, bytes(r.html))
        for r in spark.sql("SELECT * FROM warc_stream_t").collect()
    }
    want = {
        (r.url, r.warc_ts, bytes(r.html))
        for r in read_warc(spark, out).collect()
    }
    assert got == want
