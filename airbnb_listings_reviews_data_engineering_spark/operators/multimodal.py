"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video bytes are carried as ordinary ``binary`` columns with a
``media_type`` tag; per-batch processing goes through mapInPandas so the
payloads move as Arrow binary batches (never row-at-a-time pickling).

The decode step itself is STUBBED: this container has no image/audio
codecs (no PIL/cv2/torchaudio). ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
md5-derived fake decode exercises the full plumbing — schema, batching,
partitioning — end to end. Swap ``_fake_decode`` for the real codec on a
cluster that has one; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = "doc_id long, n_bytes long, digest string"
DECODE_SCHEMA = "doc_id long, width int, height int, mean_intensity double"


def pack_binary(df: DataFrame, id_col: str, text_col: str, media_type: str = "text/plain") -> DataFrame:
    """Wrap a column as an opaque binary payload with a media_type tag.

    (Test stand-in for reading real image/audio bytes; the downstream
    operators only see `binary`.)
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """Byte-level metadata over Arrow batches (mapInPandas, vectorized)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=BINARY_META_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'image decode': dims + mean from the digest."""
    d = hashlib.md5(bytes(payload)).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    mean_intensity = d[2] / 255.0
    return width, height, mean_intensity


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image payloads to (width, height, mean_intensity).

    Real decoding needs an image codec that is NOT in this container —
    without ``fake=True`` this raises NotImplementedError at plan build
    time. The Spark-side plumbing (Arrow batch shape, schema, partition
    parallelism) is identical for the real codec.
    """
    if not fake:
        raise NotImplementedError(
            "no image codec in this environment; pass fake=True for the "
            "deterministic fake decode (plumbing test)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "mean_intensity": decoded.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' for the opaque payload: slice every n-th byte run.

    Stands in for video frame-sampling; demonstrates producing multiple
    rows per input row from a binary column inside mapInPandas.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for frame_idx, off in enumerate(range(0, len(b), every_n_bytes)):
                    chunk = b[off : off + every_n_bytes]
                    rows.append((doc_id, frame_idx, len(chunk)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.mapInPandas(batches, schema="doc_id long, frame_idx int, frame_bytes int")
