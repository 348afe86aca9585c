"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` so each Python
worker sees whole record batches (the only sane shape for media decoding on
a cluster — per-row Python or driver-side loops do not survive 100 TB).

The actual media codecs are NOT in this container, so the decode step is a
deterministic STUB (clearly marked): it derives pseudo-features from the
bytes. The Spark-side contract — schema, batch iteration, partitioning,
output shape — is real and tested; swapping in PIL/ffmpeg is a one-function
change inside ``_decode_stub``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("payload", StructType([  # opaque bytes + typed metadata
        StructField("data", StringType(), True),  # binary stored alongside
    ]), True),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("byte_len", LongType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def attach_fake_media(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Test/bench helper: wrap each doc's utf-8 bytes as an opaque media blob
    with metadata — the shape a real ingest would produce from object
    storage pointers."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        (F.when(F.col(id_col) % 3 == 0, "image/png")
         .when(F.col(id_col) % 3 == 1, "audio/wav")
         .otherwise("video/mp4")).alias("media_type"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("media_bytes"),
    )


def _decode_stub(media_type: str, data: bytes) -> tuple[int, list[float]]:
    """STUB — deterministic fake decoder.

    A real deployment imports PIL / soundfile / av here (NotImplementedError
    if asked for true decoding). Frame count and features derive from the
    bytes so results are stable for tests.
    """
    if data is None:
        return 0, []
    n = len(data)
    if media_type == "image/png":
        frames = 1
    elif media_type == "audio/wav":
        frames = max(1, n // 64)  # fake 'samples/window'
    else:
        frames = max(1, n // 256)  # fake sampled video frames
    # fake 4-dim feature: byte-value moments (deterministic, vectorizable)
    if n:
        s = sum(data)
        mx = max(data)
        mn = min(data)
        feats = [float(n), float(s % 997), float(mx), float(mn)]
    else:
        feats = [0.0, 0.0, 0.0, 0.0]
    return frames, feats


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, media_bytes).

    Batch shape: one pandas DataFrame per Arrow batch; the stub loop runs
    per row *inside* the batch (as a real decoder must), but the
    JVM<->Python boundary is crossed once per batch.
    """
    out_schema = FEATURE_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            feats = []
            blens = []
            for mt, data in zip(pdf["media_type"], pdf["media_bytes"]):
                b = bytes(data) if data is not None else None
                f, v = _decode_stub(mt, b)
                frames.append(f)
                feats.append(v)
                blens.append(len(b) if b is not None else 0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": pd.Series(blens, dtype="int64"),
                "n_frames": pd.Series(frames, dtype="int32"),
                "features": feats,
            })

    return df.mapInPandas(run, out_schema)
