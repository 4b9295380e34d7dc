"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind the real Spark plumbing: schema contracts,
Arrow-batched mapInPandas with explicit output schemas, and
partition-friendly batch shapes. Swapping the fake for PIL/ffmpeg is a
one-function change; everything Spark-side (the part that must survive
100 TB) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder (REAL DECODE NOT
    IMPLEMENTED — container lacks image/audio libraries). Derives a
    feature vector from payload bytes so tests have stable output.
    Vectorized with numpy — inside an Arrow batch the per-row work is
    array math, not a Python byte loop."""
    if payload is None:
        return [0.0] * dim
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    if b.size == 0:
        return [0.0] * dim
    pad = (-b.size) % dim
    if pad:
        b = np.concatenate([b, np.zeros(pad, dtype=np.int64)])
    # sum per lane, then mod — equivalent to the running (acc+b) % 997
    acc = b.reshape(-1, dim).sum(axis=0) % 997
    return (acc / 997.0).tolist()


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas → one Python roundtrip per Arrow batch, not per row; the
    output schema is declared so downstream plans stay columnar.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(lambda p: _fake_decode(p, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (binary payload =
    utf-8 text bytes) so the plumbing is exercisable without real media."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("n_chars") % 640).alias("width"),
        (F.col("n_chars") % 480).alias("height"),
        (F.col("n_chars") * 10).alias("duration_ms"),
    )


def resize_images(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize stub: recomputes target dims (aspect-preserving clamp) and
    passes the payload through (REAL RESIZE NOT IMPLEMENTED — no
    codecs in container; swap the payload identity for PIL.thumbnail).
    Metadata math is real and vectorized; only image rows are touched —
    the filter prunes the other modalities before the Python stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(0).astype("int64")
            h = pdf["height"].fillna(0).astype("int64")
            scale = pd.concat(
                [max_w / w.clip(lower=1), max_h / h.clip(lower=1)], axis=1
            ).min(axis=1).clip(upper=1.0)
            out = pdf.copy()
            out["width"] = (w * scale).astype("int64")
            out["height"] = (h * scale).astype("int64")
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling stub: one output row per sampled timestamp
    (cardinality-changing mapInPandas — the real ffmpeg seek+decode
    slots into the same loop; REAL DECODE NOT IMPLEMENTED). Frame
    payloads are deterministic byte slices so downstream feature
    extraction is testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                payload = r["payload"] or b""
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    lo = (i * 16) % max(len(payload), 1)
                    rows["frame_payload"].append(bytes(payload[lo : lo + 16]))
            yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
