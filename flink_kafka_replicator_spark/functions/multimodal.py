"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
exactly the reference's schema-on-read stance for Kafka values
(reference: KafkaMessage.java:9-10, payloads stay byte[] end-to-end).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages: the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested; the actual codecs are
STUBBED — this container has no image/audio libraries — behind
``use_fake_codec`` which produces a deterministic fake decode, or
NotImplementedError when a real codec is requested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = "doc_id bigint, n_bytes int, header_hex string"
IMAGE_META_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, format string"
)
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"
AUDIO_META_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int, duration_ms bigint,"
    " n_windows int"
)


def with_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes here; in
    production this is the raw media bytes from the source)."""
    return df.select("doc_id", F.encode(F.col(text_col), "UTF-8").alias("blob"))


def blob_meta(df: DataFrame) -> DataFrame:
    """Byte-level metadata extraction over binary payloads via mapInPandas
    (Arrow batches; one pandas frame per batch, never per-row Python)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "header_hex": blobs.map(lambda b: bytes(b)[:4].hex()),
                }
            )

    return df.mapInPandas(extract, BLOB_META_SCHEMA)


def decode_image_meta(df: DataFrame, use_fake_codec: bool = True) -> DataFrame:
    """Image decode → metadata. Real codec is stubbed (no image libs in
    this container); the fake path keeps schema / batching real."""
    if not use_fake_codec:
        raise NotImplementedError(
            "real image codecs (PIL/opencv) are not available in this "
            "environment; pass use_fake_codec=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # deterministic fake decode, defined inside the closure so the
        # pickled function is self-contained (workers may not have this
        # package on their sys.path)
        import hashlib as _hl

        def fake_decode(blob: bytes) -> tuple[int, int, int, str]:
            digest = _hl.sha256(blob).digest()
            width = 16 + digest[0] % 240
            height = 16 + digest[1] % 240
            channels = 1 if digest[2] % 4 == 0 else 3
            return width, height, channels, "fake"

        for pdf in batches:
            metas = [fake_decode(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([m[0] for m in metas], dtype="int32"),
                    "height": pd.Series([m[1] for m in metas], dtype="int32"),
                    "channels": pd.Series([m[2] for m in metas], dtype="int32"),
                    "format": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def decode_audio_meta(df: DataFrame, use_fake_codec: bool = True) -> DataFrame:
    """Audio decode → metadata (sample rate, sample count, duration,
    1024-sample analysis-window count). Same stance as the image path:
    real codecs (soundfile/librosa) are absent in this container, so the
    decode is a deterministic fake keyed off the payload digest; the
    Arrow batching, schema, and integer arithmetic are the real
    plumbing a PCM pipeline uses."""
    if not use_fake_codec:
        raise NotImplementedError(
            "real audio codecs (soundfile/librosa) are not available in "
            "this environment; pass use_fake_codec=True for the stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake(blob: bytes) -> tuple[int, int, int, int]:
            d = _hl.sha256(blob).digest()
            sr = 8000 * (1 + d[0] % 6)  # 8k..48k
            ns = len(blob) // 2  # 16-bit PCM
            return sr, ns, ns * 1000 // sr, ns // 1024

        for pdf in batches:
            metas = [fake(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series([m[0] for m in metas], dtype="int32"),
                    "n_samples": pd.Series([m[1] for m in metas], dtype="int32"),
                    "duration_ms": pd.Series([m[2] for m in metas], dtype="int64"),
                    "n_windows": pd.Series([m[3] for m in metas], dtype="int32"),
                }
            )

    return df.mapInPandas(decode, AUDIO_META_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emits one row per sampled frame
    (demonstrates the 1→N mapInPandas fan-out shape). Frames are
    deterministic byte-slices of the payload standing in for real
    keyframe extraction."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"], strict=True):
                b = bytes(blob)
                step = max(len(b) // n_frames, 1)
                for i in range(min(n_frames, len(b))):
                    chunk = b[i * step : (i + 1) * step]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(sample, FRAME_SCHEMA)
