"""Real (codec-free) PCM WAV decoding: byte-level decode of
hand-assembled payloads, encode round-trip, chunk-order/padding
handling, and the Spark audio_stats path vs the closed-form rule."""

import numpy as np
import pytest

from dxa_pagerank_spark.functions.multimodal import (
    _rule_samples,
    audio_stats,
    decode_audio,
    encode_wav,
    make_synthetic_audio,
)


def test_wav_round_trip_mono_and_stereo():
    mono = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    s, rate = decode_audio(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (5, 1) and (s[:, 0] == mono).all()
    stereo = np.arange(12, dtype=np.int16).reshape(6, 2)
    s2, _ = decode_audio(encode_wav(stereo, 44100))
    assert s2.shape == (6, 2) and (s2 == stereo).all()


def test_wav_8bit_and_extra_chunks():
    # 8-bit PCM is unsigned, centered at 128; an extra odd-sized chunk
    # before data exercises word-aligned chunk skipping
    data = bytes([128, 129, 127, 255, 0])
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # padded
    body += b"data" + len(data).to_bytes(4, "little") + data
    wire = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    s, rate = decode_audio(wire)
    assert rate == 8000
    assert s[:, 0].tolist() == [0, 1, -1, 127, -128]


def test_non_wav_raises():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04...mp3 bytes...")


def test_spark_audio_stats_match_closed_form(spark):
    ids = spark.createDataFrame([(i,) for i in range(7)], "media_id LONG")
    media = make_synthetic_audio(ids, n_samples=480, rate=8000)
    got = {r["media_id"]: r for r in audio_stats(media).collect()}
    assert len(got) == 7
    for mid in range(7):
        x = _rule_samples(mid, 480).astype(np.float64)
        r = got[mid]
        assert (r["n_samples"], r["sample_rate"], r["channels"]) == (480, 8000, 1)
        assert r["mean_amp"] == pytest.approx(x.mean(), abs=1e-6)
        assert r["rms"] == pytest.approx(np.sqrt((x * x).mean()), abs=1e-6)
