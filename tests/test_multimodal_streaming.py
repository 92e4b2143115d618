"""Multimodal plumbing (stubbed decode) + streaming==batch equivalence."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.multimodal import (
    decode_image,
    image_features,
    make_fake_media,
    media_metadata,
    sample_video_frames,
)
from dxa_pagerank_spark.streaming.events import (
    run_stream_to_memory,
    stream_events_from_parquet,
    windowed_event_agg,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_image_features_fake_decode(spark):
    media = make_fake_media(spark, 21)
    feats = image_features(media, fake=True, dim=8).collect()
    assert len(feats) == 7  # every third row is an image
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert len(r["sha1"]) == 40
    # determinism: same content -> same features across runs
    again = image_features(make_fake_media(spark, 21), fake=True, dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_video_frame_sampling(spark):
    media = make_fake_media(spark, 21)
    frames = sample_video_frames(media, every_ms=1000, fake=True).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(max(durations[mid] // 1000, 1)))


def test_media_metadata_prunes_payload(spark):
    media = make_fake_media(spark, 9)
    meta = media_metadata(media)
    assert "payload" not in meta.columns
    assert meta.count() == 9


def test_streaming_equals_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    # file-source streaming needs a directory of files
    if os.path.isdir(src):
        shutil.copytree(src, stream_dir, dirs_exist_ok=True)
    else:
        shutil.copy(src, os.path.join(stream_dir, "part-0.parquet"))

    batch = windowed_event_agg(spark.read.parquet(src)).collect()
    stream = stream_events_from_parquet(spark, stream_dir)
    assert stream.isStreaming
    q = run_stream_to_memory(windowed_event_agg(stream), name="t_stream_out")
    try:
        got = spark.sql("select * from t_stream_out").collect()
    finally:
        q.stop()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, batch))
    gmap = {key(r): (r["n_events"], r["sum_value"]) for r in got}
    bmap = {key(r): (r["n_events"], r["sum_value"]) for r in batch}
    assert gmap == bmap
