"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The reference stores non-text artifacts as DocumentArtifact rows with
content_bytes + mime_type (models.py:419-472, check constraint
:464-467). A 100 TB training pipeline extends that: media sits in
BINARY columns, decode/resize/frame-sample run as mapInPandas kernels
so bytes never leave the executor.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this image — the
decode kernels are deterministic fakes behind the same schema and batch
shape, so the Spark-side plumbing (partitioning, Arrow batching, UDF
signatures) is real and tested; swapping in a real codec changes only
the kernel body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, mime_type string, content binary, "
    "meta map<string,string>"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id string, width int, height int, n_channels int, "
    "feature array<float>"
)

FRAME_SCHEMA = "media_id string, frame_index int, ts_ms bigint, frame binary"


def artifact_table(docs: DataFrame, content_col: str = "content",
                   mime_col: str = "mime_type", id_col: str = "media_id") -> DataFrame:
    """Validated artifact rows (models.py:464-467 check constraint:
    exactly one of text/bytes present — here: bytes required)."""
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(mime_col).alias("mime_type"),
        F.col(content_col).alias("content"),
        F.sha2(F.col(content_col), 256).alias("content_hash"),
        F.length(F.col(content_col)).alias("size_bytes"),
    ).where(F.col("content").isNotNull())


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from the content hash. REPLACE with PIL.Image.open when available."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + (h[2] % 2) * 2  # 1 or 3
    return width, height, channels


def image_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary
    stay executor-local). Feature = hash-derived unit vector (STUB —
    swap the kernel body for a real encoder; signature unchanged)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                w, h, c = _fake_decode(content)
                dg = hashlib.sha256(content).digest()
                vec = [((dg[i] / 255.0) * 2 - 1) for i in range(feature_dim)]
                norm = sum(x * x for x in vec) ** 0.5 or 1.0
                rows.append({
                    "media_id": str(mid), "width": w, "height": h,
                    "n_channels": c, "feature": [x / norm for x in vec],
                })
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "n_channels", "feature"])

    return media.select("media_id", "content").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: 1 media row → N frame rows
    (flatMap shape). Frame bytes are hash-derived stubs; a real kernel
    shells to ffmpeg per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                n = 1 + hashlib.sha256(content).digest()[0] % max_frames
                for i in range(n):
                    rows.append({
                        "media_id": str(mid), "frame_index": i,
                        "ts_ms": i * every_ms,
                        "frame": hashlib.sha256(content + i.to_bytes(4, "big")).digest(),
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "ts_ms", "frame"])

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


def media_near_dups(media: DataFrame, feature_dim: int = 8,
                    threshold: float = 0.99) -> DataFrame:
    """Embedding-cosine near-dup over decoded features — the multimodal
    twin of dedup.embedding_dup_pairs, sharing its join strategy."""
    from semantik_spark.operators.dedup import embedding_dup_pairs

    feats = image_features(media, feature_dim).select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").cast("array<double>").alias("embedding"),
    )
    return embedding_dup_pairs(feats, threshold=threshold, dim=feature_dim)


AUDIO_SEGMENT_SCHEMA = (
    "media_id string, segment_index int, start_ms bigint, end_ms bigint, "
    "samples binary"
)


def audio_segments(media: DataFrame, segment_ms: int = 5000,
                   fake_bytes_per_ms: int = 16) -> DataFrame:
    """Audio segmentation plumbing: 1 audio row → N fixed-duration
    segment rows, the shape every downstream audio stage (VAD,
    transcription, speaker turns) consumes. Duration comes from the
    fake decoder (byte length / bytes-per-ms — a real codec reads the
    container header instead); segment payloads are deterministic
    digests standing in for resampled PCM. flatMap-shaped mapInPandas:
    bytes never leave the executor, output rows re-partition freely for
    the per-segment model stage."""
    src = media.select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                duration_ms = max(1, len(content) // fake_bytes_per_ms)
                n = max(1, -(-duration_ms // segment_ms))  # ceil
                for i in range(n):
                    start = i * segment_ms
                    rows.append({
                        "media_id": str(mid), "segment_index": i,
                        "start_ms": start,
                        "end_ms": min(start + segment_ms, duration_ms),
                        "samples": hashlib.sha256(
                            content + b"seg" + i.to_bytes(4, "big")
                        ).digest(),
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "segment_index", "start_ms", "end_ms", "samples"]
            )
            rows = []

    return src.mapInPandas(run, schema=AUDIO_SEGMENT_SCHEMA)


def transcribe_segments(segments: DataFrame, model_factory=None) -> DataFrame:
    """Transcription slot over audio segments — same injected-factory
    contract as functions/model_udfs.py (one model init per partition
    iterator, Arrow batches): ``model_factory() -> callable`` mapping a
    list of sample-bytes to a list of strings. The default fake is a
    deterministic digest-text so the plumbing is testable without an
    ASR model in the image; a real factory returns e.g. a whisper
    pipeline and changes only the kernel body."""
    src = segments.select("media_id", "segment_index", "samples")

    def default_factory():
        return lambda batch: [
            "asr:" + hashlib.sha256(bytes(b)).hexdigest()[:12] for b in batch
        ]

    factory = model_factory or default_factory

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = factory()  # once per partition iterator
        for pdf in batches:
            texts = model(list(pdf["samples"]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "segment_index": pdf["segment_index"],
                "text": texts,
            })

    return src.mapInPandas(
        run, schema="media_id string, segment_index int, text string"
    )
