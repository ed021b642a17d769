"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas stages.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec work is STUBBED behind
``_require_codec`` (image/audio libraries are not in this container) with a
deterministic fake used when ``fake=True`` so pipelines are testable
end-to-end. Swap the stub for PIL/libav calls in production — the Spark
plan does not change.

Scale notes: media bytes ride the shuffle only when explicitly selected;
metadata-only plans never touch the blob column (Parquet column pruning),
and decode stages use ``mapInPandas`` so each task streams Arrow batches
instead of materializing a partition of blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media-table schema: blob + typed metadata.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("content", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("source_uri", T.StringType(), True),
])


def _require_codec(name: str, fake: bool):
    if not fake:
        raise NotImplementedError(
            f"{name}: real media decoding requires codec libraries not "
            "present in this environment; pass fake=True for the "
            "deterministic stub or install the codec in production.")


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only pass — byte size + content hash without decoding.
    Pure column expressions; the blob column is read but never shipped to
    Python."""
    return df.select(
        "media_id", "kind", "mime_type",
        F.length("content").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha256"),
    )


def decode_image_features(df: DataFrame, feature_dim: int = 16,
                          fake: bool = False) -> DataFrame:
    """Image → fixed-dim feature vector via an Arrow-batched Pandas stage.

    Real implementation would decode + embed; the deterministic fake derives
    ``feature_dim`` floats from the content hash so downstream similarity
    plumbing (joins, LSH, kNN) is exercised with stable values."""
    _require_codec("decode_image_features", fake)
    import numpy as np
    import pandas as pd

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for blob in pdf["content"]:
                h = hashlib.sha256(bytes(blob or b"")).digest()
                raw = np.frombuffer((h * ((feature_dim * 4) // len(h) + 1))
                                    [:feature_dim * 4], dtype=np.uint32)
                vecs.append((raw.astype(np.float64) / 2**32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": vecs})

    return df.filter(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        feats, schema="media_id long, features array<double>")


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        fake: bool = False) -> DataFrame:
    """Video → one row per sampled frame timestamp (UDTF-shaped explode).
    The fake emits frame offsets from duration metadata with a content-hash
    frame id; a real decoder would also emit frame bytes."""
    _require_codec("sample_video_frames", fake)
    import pandas as pd

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob, dur in zip(pdf["media_id"], pdf["content"],
                                      pdf["duration_ms"]):
                n = int((dur or 0) // every_ms)
                digest = hashlib.sha256(bytes(blob or b"")).hexdigest()[:12]
                for i in range(n):
                    rows.append({"media_id": mid, "frame_ms": i * every_ms,
                                 "frame_id": f"{digest}:{i}"})
            yield pd.DataFrame(rows, columns=["media_id", "frame_ms", "frame_id"])

    return (df.filter(F.col("kind") == "video")
            .select("media_id", "content", "duration_ms")
            .mapInPandas(frames, schema="media_id long, frame_ms long, frame_id string"))
