"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery — schema, Arrow batch shape, mapInPandas UDF
signatures, partition-size control — is real and tested. The actual
codec work (JPEG decode, resample, frame sampling) is STUBBED behind
``_decode_stub``: this container ships no image/audio libraries, so the
stub produces a deterministic fake "decoded" payload from the bytes.
Swapping in PIL/ffmpeg is a one-function change; the distributed plan
(fat-row batch caps, metadata pushdown, binary passthrough) is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),  # opaque bytes
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature_hash", LongType(), False),
    ]
)


def _fold(payload: bytes) -> int:
    """Deterministic 64-bit fold of the payload header bytes.

    FNV-1a-STYLE with a stub seed. NOTE: the seed is NOT the real FNV-1a
    64 offset basis (14695981039346656037 — a digit was dropped); it is
    kept as-is because the DuckDB oracles (oracles_sql.py
    "multimodal_features" / "multimodal_frames") mirror this exact
    constant bit-for-bit. Returns 0 for an empty payload.
    """
    if not payload:
        return 0
    h = 1469598103934665603  # deterministic stub seed (not FNV offset basis)
    for b in payload[:4096]:  # bounded work per item, like a header parse
        h = ((h ^ b) * 1099511628211) & ((1 << 64) - 1)
    return h


def _decode_stub(payload: bytes, mime: str) -> tuple[int | None, int | None, int]:
    """STUB for the codec step (no image/audio libs in this container).

    Returns deterministic fake (width, height, feature_hash) derived from
    the payload bytes. Replace with PIL.Image.open / soundfile / PyAV for
    real decoding — the surrounding Spark plumbing does not change.
    """
    if not payload:
        return None, None, 0
    h = _fold(payload)
    if mime.startswith("image/"):
        return 16 + h % 4096, 16 + (h >> 12) % 4096, h % (1 << 62)
    return None, None, h % (1 << 62)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    Fat binary rows: callers should cap Arrow batch rows (job.py sets
    spark.sql.execution.arrow.maxRecordsPerBatch) — same skew discipline
    as the media-heavy docs path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(p if p is not None else b"", m)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "feature_hash": [d[2] for d in decoded],
                }
            )

    return media.select("media_ref", "mime", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES_SCHEMA
    )


def synth_media_table(df: DataFrame, ref_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the text
    (tests/bench only — real corpora carry actual image/audio bytes).

    Mime routing hashes with md5 (not crc32) so the DuckDB oracle can
    reproduce it bit-exactly (oracles_sql.py "multimodal_features")."""
    ref = F.col(ref_col).cast("string")
    bucket = F.conv(F.substring(F.md5(ref), 1, 8), 16, 10).cast("long") % 2
    return df.select(
        ref.alias("media_ref"),
        F.when(bucket == 0, F.lit("image/jpeg")).otherwise(F.lit("audio/wav")).alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_hash", LongType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one media row expands to ceil(n_frames/every_n)
    frame rows through mapInPandas — the 1→N Arrow plumbing shape
    (decode→features above is 1→1). The frame DECODE is stubbed like the
    codec: frame count and per-frame hashes derive deterministically
    from the payload fold (a real sampler replaces the two marked lines
    with PyAV frame iteration; batch shape, schema and partitioning are
    unchanged). Empty payloads produce no frames.

    At 100 TB the expansion factor (frames per clip / every_n) is the
    operative sizing number: output batches are capped by the same
    arrow.maxRecordsPerBatch discipline as the fat-row docs path, and
    the expansion happens INSIDE the narrow map — no join, no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, mimes, nfs, idxs, hashes = [], [], [], [], []
            for ref, mime, payload in zip(
                pdf["media_ref"], pdf["mime"], pdf["payload"]
            ):
                h = _fold(payload if payload is not None else b"")
                if h == 0:
                    continue
                n_frames = 8 + h % 24  # STUB: real sampler reads container metadata
                for i in range(0, n_frames, every_n):
                    refs.append(ref)
                    mimes.append(mime)
                    nfs.append(n_frames)
                    idxs.append(i)
                    # STUB: real sampler hashes decoded frame bytes
                    hashes.append(((h ^ i) * 1099511628211) % (1 << 64) % (1 << 62))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "mime": mimes,
                    "n_frames": pd.array(nfs, dtype="int32"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_hash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.select("media_ref", "mime", "payload").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("src_width", IntegerType(), False),
        StructField("src_height", IntegerType(), False),
        StructField("dst_width", IntegerType(), False),
        StructField("dst_height", IntegerType(), False),
        StructField("resized_hash", LongType(), False),
    ]
)


def resize_media(media: DataFrame, dst_w: int = 64, dst_h: int = 64) -> DataFrame:
    """Resize pass: image rows only (1→{0,1} row shape — non-images and
    empty payloads are dropped inside the map, the selective variant of
    the decode path). The pixel work is stubbed like the codec: source
    dims come from the payload fold exactly as _decode_stub derives
    them, and the "resized" hash mixes the fold with the target dims —
    a real implementation replaces the marked line with PIL
    Image.resize + rehash; schema, batch shape and the narrow no-shuffle
    plan are unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, sws, shs, hashes = [], [], [], []
            for ref, mime, payload in zip(
                pdf["media_ref"], pdf["mime"], pdf["payload"]
            ):
                if not mime.startswith("image/"):
                    continue
                h = _fold(payload if payload is not None else b"")
                if h == 0:
                    continue
                sws.append(16 + h % 4096)
                shs.append(16 + (h >> 12) % 4096)
                refs.append(ref)
                # STUB: real resize decodes, scales, re-hashes the pixels
                hashes.append(
                    ((h ^ (dst_w * 4096 + dst_h)) * 1099511628211)
                    % (1 << 64) % (1 << 62)
                )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "src_width": pd.array(sws, dtype="int32"),
                    "src_height": pd.array(shs, dtype="int32"),
                    "dst_width": pd.array([dst_w] * len(refs), dtype="int32"),
                    "dst_height": pd.array([dst_h] * len(refs), dtype="int32"),
                    "resized_hash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.select("media_ref", "mime", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )
