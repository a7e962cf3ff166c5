"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched kernels over
``mapInPandas``. The decode step itself is STUBBED — the container has no
image/audio codecs — behind ``DETERMINISTIC_FAKE`` (a seeded, content-
hashed fake feature vector) or ``NotImplementedError``, but the Spark
plumbing (schemas, batch shapes, partitioning, UDF signatures) is real
and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, width int, "
                "height int, duration_ms int")

FEATURE_DIM = 32

# "decoder" modes: the real one would import PIL/librosa/etc.
DETERMINISTIC_FAKE = "fake"
UNAVAILABLE = "unavailable"
DECODER_MODE = DETERMINISTIC_FAKE


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            rows = {
                "media_id": ids,
                "kind": [("image", "audio", "video")[i % 3] for i in ids],
                "payload": [hashlib.sha256(str(i).encode()).digest() * 4
                            for i in ids],
                "width": [(640, 0, 1280)[i % 3] for i in ids],
                "height": [(480, 0, 720)[i % 3] for i in ids],
                "duration_ms": [(0, 30000, 120000)[i % 3] for i in ids],
            }
            yield pd.DataFrame(rows)
    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature extractor:
    hash-seeded vector. Replace with a real decode+model under a codec-
    equipped runtime."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randn(dim).astype(np.float32)


def extract_media_features(media: DataFrame,
                           mode: str = DECODER_MODE) -> DataFrame:
    """(media_id, kind, feature array<float>) via Arrow-batched kernel.

    The batch shape and output schema are what a real decoder would use;
    only the per-payload transform is stubbed.
    """
    if mode == UNAVAILABLE:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in "
            "this container")

    def kernel(batches):
        for pdf in batches:
            feats = [
                _fake_features(p).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": feats})

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, "media_id long, kind string, feature array<float>")


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: one row per frame to decode —
    demonstrates explode-based fan-out sizing without decoding."""
    frames = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0),
                   F.greatest(F.lit(0),
                              ((F.col("duration_ms") / 1000.0) * fps)
                              .cast("int") - 1))
    ).otherwise(F.array())
    return (media.select("media_id", "kind", "duration_ms",
                         F.explode(frames).alias("frame_idx"))
            .withColumn("timestamp_ms",
                        (F.col("frame_idx") * (1000.0 / fps)).cast("int")))
