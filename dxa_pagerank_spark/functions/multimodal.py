"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

The decode step itself is STUBBED (image/audio codecs are not in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (seeded
by content hash) produces stable feature vectors. Everything around the
stub — schemas, mapInPandas batch shape, partition sizing, UDF
signatures — is real and tested; swapping in Pillow/ffmpeg later only
replaces the two marked functions.

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


def decode_image(payload: bytes) -> np.ndarray:
    """REAL DECODER NOT AVAILABLE IN THIS CONTAINER.

    Swap in e.g. PIL.Image.open(io.BytesIO(payload)) when the codec
    libraries exist. See _fake_decode for the deterministic test stand-in.
    """
    raise NotImplementedError(
        "image codecs not installed; use fake=True for the deterministic stub"
    )


def decode_audio(payload: bytes) -> np.ndarray:
    """REAL DECODER NOT AVAILABLE IN THIS CONTAINER (see decode_image)."""
    raise NotImplementedError(
        "audio codecs not installed; use fake=True for the deterministic stub"
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
