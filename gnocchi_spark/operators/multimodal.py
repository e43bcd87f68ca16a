"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python hop in the engine — one
(de)serialization per batch, not per row).

The actual media decode is STUBBED: the container has no image/audio
libraries, so ``decode_image_features`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic byte-level feature
vector stands in.  The Spark-side plumbing — schema, batching,
partition sizing, UDF signature — is real and tested; swapping the stub
for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped frame from the documents table: the
    UTF-8 encoded text plays the role of an opaque media payload."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-level moments."""
    if not payload:
        return [0.0] * n
    b = list(payload[:4096])
    mean = sum(b) / len(b)
    mx, mn = float(max(b)), float(min(b))
    return [float(len(payload)), round(mean, 6), mx, mn][:n]


def decode_image_features(
    media: DataFrame, fake: bool = False, batch_hint: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    With ``fake=False`` this is where a real decoder (PIL / torchvision
    / ffmpeg) would run; the container has none, so it raises
    NotImplementedError — the distributed plumbing around it is the
    deliverable here.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; pass fake=True "
                    "for the deterministic byte-level stand-in"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [_fake_features(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
