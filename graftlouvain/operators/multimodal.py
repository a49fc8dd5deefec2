"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container ships no image/audio libraries):
``decode_features`` raises ``NotImplementedError`` unless ``fake=True``, in
which case it derives a deterministic pseudo-feature vector from the blob's
sha256 — making the Spark-side plumbing (schema, partitioning, UDF signature,
Arrow batch shape) fully real and testable. Swapping in a real decoder is a
one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, features array<double>"
)


def media_from_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Demo media table: utf-8 blobs from document text (real binary column,
    real plumbing; contents are stand-ins for image/audio bytes)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.create_map(F.lit("codec"), F.lit("fake/utf8")).alias("meta"),
    )


def _fake_features(blob: bytes, n: int = 8) -> list[float]:
    h = hashlib.sha256(blob).digest()
    return [int.from_bytes(h[4 * i: 4 * i + 4], "big") / 2**32 for i in range(n)]


def decode_features(media: DataFrame, fake: bool = False, n_features: int = 8) -> DataFrame:
    """Per-blob feature extraction over Arrow batches (mapInPandas — one
    pandas DataFrame per batch, vectorized iteration, no per-row Python UDF
    dispatch). With ``fake=False`` this is the documented stub boundary."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires pillow/librosa — not in this "
            "container; call with fake=True for the deterministic test path"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": blobs.map(len),
                    "sha": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "features": blobs.map(lambda b: _fake_features(bytes(b), n_features)),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-media frame indices from
    metadata (``meta['n_frames']``) without decoding — the shuffle-shaping step
    that precedes a real decoder. Frames are sampled every ``every_n``."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
