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
    BinaryType,
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize every image payload to ``width x height`` (1:1 rows).

    Real path would be ``PIL.Image.open(...).resize((w, h))`` per
    payload inside the Arrow batch; absent PIL the ``fake=True``
    stand-in produces a deterministic ``w*h``-byte payload by striding
    the source bytes (preserves "content determines output" so tests
    and oracles can verify the plumbing byte-for-byte).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL; pass fake=True for the "
                    "deterministic byte-stride stand-in"
                )
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if not b:
                    out.append(b"\x00" * target)
                elif len(b) >= target:
                    step = len(b) // target
                    out.append(b[:: step][:target])
                else:
                    reps = -(-target // len(b))
                    out.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame", BinaryType()),
    ]
)

#: fake framing: one frame per this many payload bytes, capped
FRAME_STRIDE_BYTES = 512
MAX_FRAMES = 8


def fake_frame_count(n_bytes: int) -> int:
    """Deterministic frame count for the stand-in sampler."""
    return min(MAX_FRAMES, max(1, n_bytes // FRAME_STRIDE_BYTES))


def sample_frames(media: DataFrame, fake: bool = False) -> DataFrame:
    """Sample frames from every video payload (1 -> N rows).

    Real path: ffmpeg keyframe extraction per payload inside the Arrow
    batch.  The ``fake=True`` stand-in splits the payload into
    ``fake_frame_count`` contiguous chunks (frame ``i`` of ``n`` spans
    bytes ``[i*L//n, (i+1)*L//n)``), which exercises the genuinely
    Spark-side concerns — the row explosion inside ``mapInPandas``,
    the per-frame schema, and downstream partition sizing — with
    engine-reproducible boundary math.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; pass fake=True for "
                    "the deterministic chunking stand-in"
                )
            ids, idxs, totals, sizes, blobs = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n = fake_frame_count(len(b))
                for i in range(n):
                    lo = i * len(b) // n
                    hi = (i + 1) * len(b) // n
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n)
                    sizes.append(hi - lo)
                    blobs.append(b[lo:hi])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_frames": totals,
                    "frame_bytes": sizes,
                    "frame": blobs,
                }
            )

    return media.mapInPandas(frames, FRAME_SCHEMA)
