"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python hop in the engine — one
(de)serialization per batch, not per row).

The media decode is IMPORT-GUARDED, not stubbed: each operator tries
``from PIL import Image`` at call time and uses the real decoder when
the library exists; otherwise — and per-payload whenever a payload
does not decode (corrupt bytes are routine at 100-TB scale) — it falls
back to a deterministic byte-level stand-in, so the same pipeline runs
in containers with and without media libraries.  ``fake=True`` forces
the stand-in everywhere, which is what SQL oracles replay, and
``decoder=`` names an importable mini-PIL module for the real branch —
tests drive it with the pure-Python BMP codec ``_bmp_shim`` so the
real decode path executes even where PIL is absent.
Real video keyframe extraction (ffmpeg) has no pure-PIL equivalent for
non-animated formats; multi-frame images (GIF/TIFF) use PIL's seek().
"""

from __future__ import annotations

import io
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


def _pil_image():
    """Import-guarded PIL handle — resolved at call time ON THE
    EXECUTOR (the worker venv, not the driver's, decides)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _resolve_decoder(fake: bool, decoder: str | None):
    """Pick the decode module inside the mapInPandas closure: forced
    stand-in (``fake``), an explicit importable module exposing the
    mini-PIL API (``decoder`` — a STRING so it pickles to executors;
    tests pass the pure-Python BMP codec ``_bmp_shim`` to execute the
    real branch without PIL), else PIL when importable."""
    if fake:
        return None
    if decoder is not None:
        import importlib  # noqa: PLC0415

        return importlib.import_module(decoder)
    return _pil_image()


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


def _real_features(Image, payload: bytes) -> list[float] | None:
    """Decode -> grayscale pixel moments, same shape as the stand-in.
    Returns None when the payload is not a decodable image so the
    caller falls back deterministically.  Moments run over the raw
    ``tobytes()`` buffer — a per-pixel Python list via ``getdata()``
    would be slow and memory-heavy for large images inside an Arrow
    batch."""
    try:
        with Image.open(io.BytesIO(payload)) as im:
            px = im.convert("L").tobytes()
    except Exception:
        return None
    if not px:
        return [float(len(payload)), 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        round(sum(px) / len(px), 6),
        float(max(px)),
        float(min(px)),
    ]


def decode_image_features(
    media: DataFrame,
    fake: bool = False,
    batch_hint: int = 1024,
    decoder: str | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``fake=False`` uses PIL when importable (grayscale pixel moments);
    payloads PIL cannot decode — and every payload when PIL is absent —
    produce the byte-level stand-in features, so output is total either
    way and identical across environments for non-image payloads.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _resolve_decoder(fake, decoder)

        def feats(p: bytes) -> list[float]:
            if Image is not None:
                real = _real_features(Image, p)
                if real is not None:
                    return real
            return _fake_features(p)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [feats(bytes(p)) for p in pdf["payload"]],
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


def _stride_resize(b: bytes, target: int) -> bytes:
    """Deterministic stand-in: stride/repeat source bytes to exactly
    ``target`` bytes (content determines output, engine-replayable)."""
    if not b:
        return b"\x00" * target
    if len(b) >= target:
        step = len(b) // target
        return b[::step][:target]
    reps = -(-target // len(b))
    return (b * reps)[:target]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    decoder: str | None = None,
) -> DataFrame:
    """Resize every image payload to ``width x height`` (1:1 rows).

    Real path (PIL importable, payload decodes): grayscale resize,
    payload = raw ``w*h`` luminance bytes.  Fallback — per payload on
    decode failure, globally when PIL is absent or ``fake=True`` — is
    the byte-stride stand-in producing the same ``w*h`` payload size,
    so downstream schema/partition math never changes.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        Image = _resolve_decoder(fake, decoder)

        def one(b: bytes) -> bytes:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        return im.convert("L").resize((width, height)).tobytes()
                except Exception:
                    pass
            return _stride_resize(b, target)

        for pdf in batches:
            out = [one(bytes(p)) for p in pdf["payload"]]
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


def _pil_frames(Image, b: bytes) -> list[bytes] | None:
    """Multi-frame image (GIF/TIFF) -> up to MAX_FRAMES grayscale
    frames via PIL seek(); None when the payload doesn't decode."""
    try:
        with Image.open(io.BytesIO(b)) as im:
            n = min(getattr(im, "n_frames", 1), MAX_FRAMES)
            out = []
            for i in range(n):
                im.seek(i)
                out.append(im.convert("L").tobytes())
            return out
    except Exception:
        return None


def _chunk_frames(b: bytes) -> list[bytes]:
    """Stand-in sampler: split the payload into fake_frame_count
    contiguous chunks (frame i of n spans bytes [i*L//n, (i+1)*L//n))."""
    n = fake_frame_count(len(b))
    return [b[i * len(b) // n : (i + 1) * len(b) // n] for i in range(n)]


def sample_frames(
    media: DataFrame, fake: bool = False, decoder: str | None = None
) -> DataFrame:
    """Sample frames from every video payload (1 -> N rows).

    Real path: PIL multi-frame decode (GIF/TIFF keyframes) when PIL is
    importable and the payload decodes; true video containers need
    ffmpeg, which stays out of scope — they fall through to the
    deterministic chunking stand-in, which also serves every payload
    when PIL is absent or ``fake=True``.  Either way this exercises the
    genuinely Spark-side concerns: the row explosion inside
    ``mapInPandas``, the per-frame schema, downstream partition sizing.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _resolve_decoder(fake, decoder)
        for pdf in batches:
            ids, idxs, totals, sizes, blobs = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                chunks = None
                if Image is not None:
                    chunks = _pil_frames(Image, b)
                if chunks is None:
                    chunks = _chunk_frames(b)
                for i, fb in enumerate(chunks):
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(len(chunks))
                    sizes.append(len(fb))
                    blobs.append(fb)
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
