"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched kernels over
``mapInPandas``.

Decode is CAPABILITY-GATED (round-5, mirroring the Iceberg-surface
pattern): ``codec_probe()`` detects per-kind decoders at call time —
audio WAV via the stdlib ``wave`` module (always present, so the REAL
path is exercised in this container's tests), images via PIL, video via
PyAV — and ``REAL`` mode runs the actual decode for capable kinds,
raising loudly for kinds without a codec. ``DETERMINISTIC_FAKE`` (a
seeded, content-hashed fake feature vector) remains the default for the
driver gates so their hashes are environment-independent.
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

DETERMINISTIC_FAKE = "fake"
REAL = "real"
UNAVAILABLE = "unavailable"
DECODER_MODE = DETERMINISTIC_FAKE


def codec_probe() -> dict:
    """Per-kind decoder availability in this runtime. Audio is stdlib
    (``wave``: PCM WAV); image needs PIL; video needs PyAV."""
    caps = {"image": False, "audio": True, "video": False}
    try:
        import PIL.Image  # noqa: F401
        caps["image"] = True
    except ImportError:
        pass
    try:
        import av  # noqa: F401
        caps["video"] = True
    except ImportError:
        pass
    return caps


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


def synthesize_wav_media(spark, n: int = 16, sr: int = 8000,
                         ms: int = 200) -> DataFrame:
    """Deterministic REAL PCM-WAV payloads (stdlib-generated sine
    tones, frequency varies per row) — test input for the REAL decode
    path, and the loading template for actual audio corpora."""
    def gen(batches):
        import io
        import math
        import wave
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "payload",
                                    "width", "height", "duration_ms")}
            for i in pdf["id"].astype("int64"):
                nsamp = sr * ms // 1000
                freq = 220.0 * (1 + int(i) % 4)
                frames = bytearray()
                for t in range(nsamp):
                    v = int(20000 * math.sin(2 * math.pi * freq * t / sr))
                    frames += v.to_bytes(2, "little", signed=True)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(bytes(frames))
                rows["media_id"].append(int(i))
                rows["kind"].append("audio")
                rows["payload"].append(buf.getvalue())
                rows["width"].append(0)
                rows["height"].append(0)
                rows["duration_ms"].append(ms)
            yield pd.DataFrame(rows)
    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature extractor:
    hash-seeded vector. Replace with a real decode+model under a codec-
    equipped runtime."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randn(dim).astype(np.float32)


def _real_features(payload: bytes, kind: str,
                   dim: int = FEATURE_DIM) -> np.ndarray:
    """Actual decode + fixed-dim featurization per kind. Deterministic
    by construction (no model weights): image → grayscale (dim/4)×4
    thumbnail intensities; audio → per-bucket RMS over dim buckets of
    the PCM stream. Raises for kinds whose codec is absent — loud, like
    the Iceberg surface without its jar."""
    import io

    if kind == "image":
        if not codec_probe()["image"]:
            raise NotImplementedError(
                "image decode requires PIL (pip install pillow); "
                "DETERMINISTIC_FAKE is the codec-free fallback")
        from PIL import Image
        img = Image.open(io.BytesIO(payload)).convert("L") \
            .resize((dim // 4, 4))
        arr = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
        return arr[:dim]
    if kind == "audio":
        import wave
        with wave.open(io.BytesIO(payload)) as w:
            raw = w.readframes(w.getnframes())
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32)
        if samples.size == 0:
            return np.zeros(dim, dtype=np.float32)
        out = np.zeros(dim, dtype=np.float32)
        for b, chunk in enumerate(np.array_split(samples, dim)):
            if chunk.size:
                out[b] = np.sqrt(np.mean(chunk ** 2))
        return out / 32768.0
    raise NotImplementedError(
        f"no decoder for kind={kind!r} in this runtime "
        f"(codec_probe: {codec_probe()})")


def extract_media_features(media: DataFrame,
                           mode: str = DECODER_MODE) -> DataFrame:
    """(media_id, kind, feature array<float>) via Arrow-batched kernel.

    ``mode=REAL`` runs the actual per-kind decode (capability-gated);
    ``DETERMINISTIC_FAKE`` keeps the environment-independent stand-in
    the driver gates hash. Batch shape and output schema are identical
    in both modes.
    """
    if mode == UNAVAILABLE:
        raise NotImplementedError(
            "media decoding disabled (mode=UNAVAILABLE); use REAL with "
            "codecs installed or DETERMINISTIC_FAKE")
    featurize = (_fake_features if mode == DETERMINISTIC_FAKE
                 else _real_features)

    def kernel(batches):
        for pdf in batches:
            if mode == DETERMINISTIC_FAKE:
                feats = [
                    _fake_features(p).tolist() if p is not None else None
                    for p in pdf["payload"]
                ]
            else:
                feats = [
                    featurize(p, k).tolist() if p is not None else None
                    for p, k in zip(pdf["payload"], pdf["kind"])
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
