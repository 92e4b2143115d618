"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

Decode status (r03): ``decode_image`` is now a REAL pure-NumPy decoder
for the codec-free container formats — binary PPM (P6), PGM (P5), and
uncompressed 24-bit BMP — exercised end-to-end by
``make_synthetic_images`` (arithmetic pixel rule, so SQL oracles state
expected pixel statistics in closed form) and ``image_pixel_stats``.
Compressed formats (JPEG/PNG) and ``decode_audio`` still require codec
libraries absent from this container and raise NotImplementedError;
the deterministic digest stub (``fake=True``) remains for payloads
that are not decodable images. Swapping in Pillow/ffmpeg later only
widens the two marked functions.

Scale notes: binary payloads dominate row size, so these operators use
``mapInPandas`` (per-partition Arrow batches) and never groupBy on the
payload; metadata-only projections (pushdown-friendly) are split out
before any shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha1 string, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_feature array<float>"


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First n whitespace-separated header tokens after the magic,
    honoring '#' comments (the netpbm grammar). Returns (ints, offset of
    the single whitespace byte after the last token + 1 = pixel start)."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i] == ord("#"):
            while i < len(payload) and payload[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_image(payload: bytes) -> np.ndarray:
    """Pure-NumPy image decode for the codec-free container formats:

    * PPM binary (magic ``P6``) -> (h, w, 3) uint8
    * PGM binary (magic ``P5``) -> (h, w) uint8
    * BMP, uncompressed 24-bit BI_RGB -> (h, w, 3) uint8 (RGB order,
      top-down rows, 4-byte row padding stripped)

    Compressed formats (JPEG/PNG/...) still need codec libraries that
    are not in this container and raise NotImplementedError; the
    deterministic digest stub (`_fake_decode`) remains available via
    ``fake=True`` for payloads that are not images at all.
    """
    if payload is None or len(payload) < 2:
        raise NotImplementedError("empty or truncated payload")
    payload = bytes(payload)
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        (w, h, maxval), off = _ppm_tokens(payload, 3)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm not supported")
        ch = 3 if magic == b"P6" else 1
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        return px.reshape((h, w, 3)) if ch == 3 else px.reshape((h, w))
    if magic == b"BM":
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP supported")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape((h, stride))[:, : w * 3].reshape((h, w, 3))
        if flip:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(
        "compressed image codecs not installed (payload is not PPM/PGM/BMP);"
        " use fake=True for the deterministic stub"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-NumPy audio decode for RIFF/WAVE PCM (the codec-free audio
    container format): returns ((n_samples, channels) array, sample
    rate). 16-bit (int16 LE) and 8-bit (uint8) PCM supported;
    compressed codecs (MP3/AAC/...) are not in this container and raise
    NotImplementedError."""
    if payload is None:
        raise NotImplementedError("empty payload")
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio codecs not installed (payload is not PCM WAV)"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("truncated WAV (missing fmt/data chunk)")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError("only 8/16-bit PCM WAV supported")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    return samples.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 -> RIFF/WAVE PCM bytes (the inverse of
    decode_audio's 16-bit leg)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


# arithmetic sample rule (closed-form for SQL oracles):
#   sample(t) = ((3t + 11*media_id) mod 256 - 128) * 256
def _rule_samples(media_id: int, n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.int64)
    return (((3 * t + 11 * media_id) % 256 - 128) * 256).astype(np.int16)


def make_synthetic_audio(
    ids: DataFrame, n_samples: int = 480, rate: int = 8000
) -> DataFrame:
    """Deterministic mono PCM WAV table from (media_id bigint): REAL
    RIFF bytes that decode_audio round-trips, samples from the
    arithmetic rule above."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["audio"] * len(pdf),
                    "mime": ["audio/wav"] * len(pdf),
                    "payload": [
                        encode_wav(_rule_samples(int(m), n_samples), rate)
                        for m in pdf["media_id"]
                    ],
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": [n_samples * 1000 // rate] * len(pdf),
                }
            )

    return ids.select(F.col("media_id").cast("long")).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


AUDIO_STATS_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, channels int,"
    " mean_amp double, rms double"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL decode path: payload -> decode_audio -> sample statistics
    (mean amplitude and RMS over all channels, rounded 6)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "n_samples", "sample_rate", "channels",
                    "mean_amp", "rms")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_audio(p)
                x = samples.astype(np.float64)
                out["media_id"].append(mid)
                out["n_samples"].append(samples.shape[0])
                out["sample_rate"].append(rate)
                out["channels"].append(samples.shape[1])
                out["mean_amp"].append(round(float(x.mean()), 6))
                out["rms"].append(round(float(np.sqrt((x * x).mean())), 6))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema=AUDIO_STATS_SCHEMA
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


# arithmetic pixel rule for the synthetic image source: closed-form so
# SQL oracles can state expected pixel statistics without touching bytes
def _rule_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((7 * x + 13 * y + 31 * media_id + 5 * c) % 256).astype(np.uint8)


def make_synthetic_images(
    ids: DataFrame, width: int = 8, height: int = 6
) -> DataFrame:
    """Deterministic PPM image table from an (media_id bigint) input:
    pixel(x, y, c) = (7x + 13y + 31*media_id + 5c) mod 256. The payload
    is REAL image bytes (P6) that decode_image round-trips."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "media_id": pdf["media_id"],
                "kind": ["image"] * len(pdf),
                "mime": ["image/x-portable-pixmap"] * len(pdf),
                "payload": [
                    encode_ppm(_rule_pixels(int(m), width, height))
                    for m in pdf["media_id"]
                ],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
            }
            yield pd.DataFrame(rows)

    return ids.select(F.col("media_id").cast("long")).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int,"
    " mean_r double, mean_g double, mean_b double"
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL decode path: payload -> decode_image -> per-channel means
    (rounded 6). Raises on payloads whose format needs absent codecs —
    this operator is for decodable (PPM/PGM/BMP) columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(p)
                if px.ndim == 2:  # grayscale: replicate the single channel
                    px = px[..., None].repeat(3, axis=2)
                out["media_id"].append(mid)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                means = px.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_STATS_SCHEMA
    )


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decode': features derived from the content
    digest, so tests get stable, content-sensitive vectors."""
    if payload is None:
        payload = b""
    digest = hashlib.sha256(bytes(payload)).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def image_features(
    media: DataFrame, fake: bool = False, dim: int = 8
) -> DataFrame:
    """payload -> (n_bytes, sha1, feature vector) via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = []
            for p in payloads:
                vec = (_fake_decode(p, dim) if fake else decode_image(p))
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha1": payloads.map(
                        lambda p: hashlib.sha1(bytes(p or b"")).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False, dim: int = 8
) -> DataFrame:
    """Frame sampling: one row per sampled frame. The fake decoder
    derives per-frame features from (payload digest, frame index)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_feat = [], [], []
            for _, row in pdf.iterrows():
                n_frames = max(int((row["duration_ms"] or 0) // every_ms), 1)
                for fi in range(n_frames):
                    if not fake:
                        decode_image(row["payload"])  # raises NotImplementedError
                    vec = _fake_decode(
                        bytes(row["payload"] or b"") + fi.to_bytes(4, "little"), dim
                    )
                    out_ids.append(row["media_id"])
                    out_idx.append(fi)
                    out_feat.append([float(x) for x in vec])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_feature": out_feat}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Payload-free projection (parquet column pruning keeps the scan
    cheap — verify ReadSchema excludes `payload` in explain())."""
    return media.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms"
    )


def make_fake_media(spark, n: int = 20):
    """Deterministic fixture media table (binary payloads, no codecs)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(
            hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 5)
        )
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "width": 64 + i if kind == "image" else None,
                "height": 48 + i if kind == "image" else None,
                "duration_ms": (2500 + 997 * i) if kind != "image" else None,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
