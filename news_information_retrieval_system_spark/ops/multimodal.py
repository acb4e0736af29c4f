"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (image/audio libraries are not available in
this environment): ``decode_image_features`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic byte-statistics
"feature vector" stands in. The Spark-side plumbing — schema, partition
sizing, mapInPandas batch shape, feature-column contract — is real and
tested; a real decoder drops into ``_decode_one``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, features array<float>"

FEATURE_DIM = 16


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Payload bytes follow the arithmetic
    pattern ``(media_id·131 + i·7919 + seed) mod 256`` — any engine can
    reproduce them (the driver oracle recomputes the feature sums in pure
    SQL), unlike an RNG stream."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng_sizes = (ids * 2654435761 + seed) % 4096 + 64
            rows = []
            for mid, size in zip(ids, rng_sizes):
                kind = kinds[mid % 3]
                payload = (
                    (int(mid) * 131 + np.arange(int(size), dtype=np.int64) * 7919 + seed) % 256
                ).astype(np.uint8).tobytes()
                rows.append(
                    (
                        int(mid),
                        str(kind),
                        mimes[str(kind)],
                        int(64 + mid % 512) if kind == "image" else 0,
                        int(64 + (mid * 3) % 512) if kind == "image" else 0,
                        int(1000 + mid % 60000) if kind != "image" else 0,
                        payload,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "width", "height", "duration_ms", "payload"],
            )

    parts = max(2, spark.sparkContext.defaultParallelism // 4)
    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_one(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg — not available "
            "in this environment; pass fake=True for the deterministic stub"
        )
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    # deterministic stand-in features: per-stripe byte means, computed in
    # float64 and quantized to float32 only at the end — the single,
    # well-defined rounding point any re-implementation can reproduce
    stripes = np.array_split(b, FEATURE_DIM)
    return np.array([s.mean() if s.size else 0.0 for s in stripes], dtype=np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction — the batch shape a real GPU/CPU
    decoder would use (bounded Arrow batches of binary payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(p, k, fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp (the
    decode of the actual frame is the stubbed step). Pure JVM expansion."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
