"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
exactly the reference's schema-on-read stance for Kafka values
(reference: KafkaMessage.java:9-10, payloads stay byte[] end-to-end).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. Two codec paths per decoder:

- ``use_fake_codec=True`` — deterministic digest-keyed metadata; the
  oracle-checkable path (the test fixture's blobs are UTF-8 text, not
  media) exercising the real Spark plumbing.
- ``use_fake_codec=False`` — a REAL decode (round 8): PIL / soundfile
  when importable, else pure-stdlib parsers (PNG/GIF/BMP/JPEG header
  reads; ``wave`` for RIFF/WAV PCM). Undecodable payloads yield null
  metadata per row — a poisoned blob must never abort a 100 TB job.
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
            # a NULL payload yields NULL metadata (never len(None) — a
            # missing asset is a per-row condition, not a job abort)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(
                        [len(b) if b is not None else None for b in blobs],
                        dtype="Int32",
                    ),
                    "header_hex": pd.Series(
                        [
                            bytes(b)[:4].hex() if b is not None else None
                            for b in blobs
                        ],
                        dtype="object",
                    ),
                }
            )

    return df.mapInPandas(extract, BLOB_META_SCHEMA)


def _parse_image_header(b: bytes) -> tuple[int, int, int, str] | None:
    """Pure-stdlib image metadata from the container headers of the
    big-four formats — the real decode-metadata path when PIL is not
    installed (format specs are public: PNG IHDR, GIF logical screen
    descriptor, BMP info header, JPEG SOFn markers). Returns
    (width, height, channels, format) or None if unrecognized."""
    import struct as _struct

    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = _struct.unpack(">II", b[16:24])
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return w, h, channels, "png"
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _struct.unpack("<HH", b[6:10])
        return w, h, 3, "gif"
    if len(b) >= 30 and b[:2] == b"BM":
        w, h = _struct.unpack("<ii", b[18:26])
        bits = _struct.unpack("<H", b[28:30])[0]
        return w, abs(h), max(bits // 8, 1), "bmp"
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = _struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, b[i + 9], "jpeg"
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = _struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def decode_image_meta(
    df: DataFrame, use_fake_codec: bool = True
) -> DataFrame:
    """Image decode → metadata. ``use_fake_codec=True`` (the oracle
    fixture path — the test blobs are UTF-8 text, not images) derives
    deterministic metadata from the payload digest. ``False`` runs a
    REAL decode: PIL when importable, else the pure-stdlib header
    parser (:func:`_parse_image_header`) for PNG/GIF/BMP/JPEG;
    unrecognized payloads yield null dimensions with format
    'unknown' — per-row refusal, not a job abort."""
    if not use_fake_codec:

        def decode_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            try:
                import io as _io

                from PIL import Image as _Image  # type: ignore
            except ImportError:
                _Image = None
                _io = None

            from flink_kafka_replicator_spark.functions.multimodal import (
                _parse_image_header,
            )

            def one(blob: bytes):
                if blob is None:  # missing asset → per-row refusal
                    return None, None, None, "unknown"
                b = bytes(blob)
                if _Image is not None:
                    try:
                        with _Image.open(_io.BytesIO(b)) as im:
                            return (
                                im.width,
                                im.height,
                                len(im.getbands()),
                                (im.format or "unknown").lower(),
                            )
                    except Exception:
                        return None, None, None, "unknown"
                meta = _parse_image_header(b)
                if meta is None:
                    return None, None, None, "unknown"
                return meta

            for pdf in batches:
                metas = [one(b) for b in pdf["blob"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": pd.Series(
                            [m[0] for m in metas], dtype="Int32"
                        ),
                        "height": pd.Series(
                            [m[1] for m in metas], dtype="Int32"
                        ),
                        "channels": pd.Series(
                            [m[2] for m in metas], dtype="Int32"
                        ),
                        "format": [m[3] for m in metas],
                    }
                )

        return df.mapInPandas(decode_real, IMAGE_META_SCHEMA)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # deterministic fake decode, defined inside the closure so the
        # pickled function is self-contained (workers may not have this
        # package on their sys.path)
        import hashlib as _hl

        def fake_decode(blob) -> tuple[int | None, int | None, int | None, str]:
            # NULL payload → NULL dims, format stays the codec tag
            # (mirrors the oracle: sha256(NULL) NULLs every derived
            # field while the 'fake' literal survives)
            if blob is None:
                return None, None, None, "fake"
            digest = _hl.sha256(bytes(blob)).digest()
            width = 16 + digest[0] % 240
            height = 16 + digest[1] % 240
            channels = 1 if digest[2] % 4 == 0 else 3
            return width, height, channels, "fake"

        for pdf in batches:
            metas = [fake_decode(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([m[0] for m in metas], dtype="Int32"),
                    "height": pd.Series([m[1] for m in metas], dtype="Int32"),
                    "channels": pd.Series([m[2] for m in metas], dtype="Int32"),
                    "format": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def decode_audio_meta(df: DataFrame, use_fake_codec: bool = True) -> DataFrame:
    """Audio decode → metadata (sample rate, sample count, duration,
    1024-sample analysis-window count). ``use_fake_codec=True`` (the
    oracle fixture path) keys deterministic metadata off the payload
    digest. ``False`` runs a REAL decode: soundfile when importable
    (any libsndfile format), else stdlib ``wave`` for RIFF/WAV PCM;
    undecodable payloads yield null metadata — per-row refusal, not a
    job abort."""
    if not use_fake_codec:

        def decode_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import io as _io

            try:
                import soundfile as _sf  # type: ignore
            except ImportError:
                _sf = None
            import wave as _wave

            def one(blob: bytes):
                if blob is None:  # missing asset → per-row refusal
                    return None, None, None, None
                b = bytes(blob)
                if _sf is not None:
                    try:
                        with _sf.SoundFile(_io.BytesIO(b)) as f:
                            sr, ns = int(f.samplerate), len(f)
                            return sr, ns, ns * 1000 // sr, ns // 1024
                    except Exception:
                        return None, None, None, None
                try:
                    with _wave.open(_io.BytesIO(b), "rb") as w:
                        sr = w.getframerate()
                        ns = w.getnframes()
                        return sr, ns, ns * 1000 // sr, ns // 1024
                except Exception:
                    return None, None, None, None

            for pdf in batches:
                metas = [one(b) for b in pdf["blob"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "sample_rate": pd.Series(
                            [m[0] for m in metas], dtype="Int32"
                        ),
                        "n_samples": pd.Series(
                            [m[1] for m in metas], dtype="Int32"
                        ),
                        "duration_ms": pd.Series(
                            [m[2] for m in metas], dtype="Int64"
                        ),
                        "n_windows": pd.Series(
                            [m[3] for m in metas], dtype="Int32"
                        ),
                    }
                )

        return df.mapInPandas(decode_real, AUDIO_META_SCHEMA)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake(blob):
            if blob is None:  # NULL payload → NULL metadata
                return None, None, None, None
            b = bytes(blob)
            d = _hl.sha256(b).digest()
            sr = 8000 * (1 + d[0] % 6)  # 8k..48k
            ns = len(b) // 2  # 16-bit PCM
            return sr, ns, ns * 1000 // sr, ns // 1024

        for pdf in batches:
            metas = [fake(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series([m[0] for m in metas], dtype="Int32"),
                    "n_samples": pd.Series([m[1] for m in metas], dtype="Int32"),
                    "duration_ms": pd.Series([m[2] for m in metas], dtype="Int64"),
                    "n_windows": pd.Series([m[3] for m in metas], dtype="Int32"),
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
                if blob is None:  # missing asset → zero frames
                    continue
                b = bytes(blob)
                step = max(len(b) // n_frames, 1)
                for i in range(min(n_frames, len(b))):
                    chunk = b[i * step : (i + 1) * step]
                    ids.append(doc_id)
                    idxs.append(i)
                    # hash the frame's lowercase HEX, not its raw
                    # bytes: byte slices can split multi-byte chars,
                    # and SQL engines' md5 is VARCHAR-only — the hex
                    # domain keeps the fingerprint exactly replayable
                    hashes.append(
                        hashlib.md5(chunk.hex().encode("ascii")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(sample, FRAME_SCHEMA)


PHASH_SHINGLE_BYTES = 8
PHASH_SCHEMA = "doc_id bigint, phash bigint, n_shingles int"


def phash64(df: DataFrame) -> DataFrame:
    """64-bit perceptual-style content hash over the opaque binary
    payload: SimHash of the blob's DISTINCT byte 8-grams (set-based —
    a byte-level near-dup of the payload flips few bits). This is the
    media-column face of the text SimHash: the signature a multimodal
    pipeline computes right after decode to catch re-encoded /
    lightly-edited copies of the same asset without parsing it.

    Runs as ONE Arrow-batched mapInPandas stage (never per-row Python
    round trips); the per-blob work is |blob| md5s of 8-byte windows —
    embarrassingly parallel, no shuffle at all until the downstream
    band join. The bit convention matches similarity.simhash_table
    exactly (md5-half bit votes, majority = strictly more than half,
    bit 63 wraps to long-min), so the DuckDB oracle replays signatures
    bit-for-bit from the same shingle set.

    Parallelism: Spark sizes scan splits by BYTES, but this stage's
    cost is per-byte PYTHON work — a small-file corpus (one 1.5 MB
    split at sf0.1) would otherwise run the whole signature pass in a
    single task. When the scan yields fewer partitions than cores, fan
    out first; at production scale the scan already has ≥cores splits
    and no extra shuffle happens."""

    import numpy as np

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = PHASH_SHINGLE_BYTES
        bit_lo = np.arange(32, dtype=np.uint32)
        for pdf in batches:
            out_ids = []
            out_hash = []
            out_n = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"], strict=True):
                # degenerate assets (NULL/empty payload) carry NO
                # signature row — the same zero-shingle contract as
                # similarity.minhash_signature_table; an empty blob's
                # lone b'' shingle would co-band every empty asset
                if blob is None or len(blob) == 0:
                    continue
                out_ids.append(doc_id)
                b = bytes(blob)
                n = len(b)
                shingles = {b[i : i + k] for i in range(max(n - k + 1, 1))}
                m = len(shingles)
                # md5 halves as uint32 pairs (same bits as the former
                # hexdigest slices), bit votes vectorized: votes[j] =
                # Σ_sh (half >> j) & 1 — numpy does the 64·m bit loop
                digs = [hashlib.md5(sh).digest() for sh in shingles]
                hl = np.frombuffer(
                    b"".join(d[0:4] for d in digs), dtype=">u4"
                ).astype(np.uint32)
                hh = np.frombuffer(
                    b"".join(d[4:8] for d in digs), dtype=">u4"
                ).astype(np.uint32)
                votes_lo = ((hl[:, None] >> bit_lo) & 1).sum(axis=0)
                votes_hi = ((hh[:, None] >> bit_lo) & 1).sum(axis=0)
                sig = 0
                for j in range(32):
                    if 2 * int(votes_lo[j]) > m:
                        sig += 1 << j
                    if 2 * int(votes_hi[j]) > m:
                        sig += (1 << (32 + j)) if j < 31 else -(1 << 63)
                out_hash.append(sig)
                out_n.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "phash": pd.Series(out_hash, dtype="int64"),
                    "n_shingles": pd.Series(out_n, dtype="int32"),
                }
            )

    return df.mapInPandas(compute, PHASH_SCHEMA)
