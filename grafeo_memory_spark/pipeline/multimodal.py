"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages (builder brief).

The *Spark-side* machinery is real and tested — schemas, batch
iteration, partition-preserving transforms, output contracts. The codec
kernels themselves (JPEG decode, resampling, frame extraction) need
image/audio libraries that are not in this container, so each kernel is
a clearly-marked stub: ``decode=...`` defaults to a deterministic fake
(bytes → stable feature vector) and raises ``NotImplementedError`` if
the real path is requested without the library installed.

Scale notes: binary payloads ride the Arrow batches — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 64) for
multi-MB assets so a batch fits executor memory. Metadata-only
operations (routing, filtering, sampling decisions) must run BEFORE the
decode stage so pruning happens on the cheap columns: the decode UDF is
the most expensive operator per byte in the whole pipeline.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON metadata
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def fake_image_decode(payload: bytes, dims: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: payload bytes →
    pseudo (width, height) + a stable feature vector. Keeps the whole
    Arrow/mapInPandas path testable without image libraries."""
    if payload is None:
        return 0, 0, [0.0] * dims
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feats = [digest[2 + i] / 255.0 for i in range(dims)]
    return width, height, feats


def _real_image_decode(payload: bytes, dims: int = 8):
    """The production kernel slot. STUB: requires an image library
    (e.g. Pillow) that is not available in this environment."""
    raise NotImplementedError(
        "real image decode needs an imaging library; inject a decode "
        "callable or use fake_image_decode for tests"
    )


def decode_images(
    assets: DataFrame,
    *,
    dims: int = 8,
    decode: Callable[[bytes, int], tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """Image assets → (asset_id, width, height, features) via
    Arrow-batched mapInPandas. Filter to ``kind='image'`` happens here
    so the predicate prunes *before* bytes cross into Python."""
    decode = decode or fake_image_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode(p, dims) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "features": [r[2] for r in rows],
                }
            )

    return assets.where(assets.kind == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: truncate/pad the payload to a
    size proportional to the target area — stable, size-monotonic, and
    library-free. A real kernel decodes, resamples, re-encodes."""
    if payload is None:
        return b""
    target = max(1, (width * height) // 8)
    return (payload * (target // max(1, len(payload)) + 1))[:target]


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    *,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image assets → fixed-dimension payloads (training-shard prep).
    Same mapInPandas contract as decode_images; the kernel slot takes
    (payload, width, height) → bytes."""
    resize = resize or fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": [resize(p, width, height) for p in pdf["payload"]],
                }
            )

    return assets.where(assets.kind == "image").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def fake_audio_features(
    payload: bytes, dims: int = 8
) -> tuple[int, list[float]]:
    """Deterministic audio stand-in: bytes → pseudo duration + stable
    feature vector (a real kernel runs an STFT/mel pipeline)."""
    if payload is None:
        return 0, [0.0] * dims
    digest = hashlib.sha256(b"audio" + payload).digest()
    duration_ms = len(payload) * 1000 // 16  # fake 16 bytes/ms rate
    feats = [digest[i] / 255.0 for i in range(dims)]
    return duration_ms, feats


def audio_features(
    assets: DataFrame,
    *,
    dims: int = 8,
    extract: Callable[[bytes, int], tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Audio assets → (asset_id, duration_ms, features) via Arrow-batched
    mapInPandas, mirroring decode_images for the audio modality."""
    extract = extract or fake_audio_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [extract(p, dims) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "duration_ms": [r[0] for r in rows],
                    "features": [r[1] for r in rows],
                }
            )

    return assets.where(assets.kind == "audio").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(
    assets: DataFrame, every_nth: int = 10, max_frames: int = 4
) -> DataFrame:
    """Video assets → sampled frame rows. The frame *extraction* is the
    deterministic fake (payload sliced into chunks standing in for
    decoded frames); the batch shape, fan-out (one row per frame) and
    schema match what a real ffmpeg-backed kernel would emit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "frame_index": [], "frame_payload": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                n = min(max_frames, max(1, len(payload) // every_nth))
                step = max(1, len(payload) // n)
                for i in range(n):
                    out["asset_id"].append(aid)
                    out["frame_index"].append(i)
                    out["frame_payload"].append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return assets.where(assets.kind == "video").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )
