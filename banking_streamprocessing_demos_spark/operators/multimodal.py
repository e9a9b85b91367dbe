"""Multimodal column handling (north-star extension): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas over ``mapInPandas``.

The real media codecs are NOT in this environment, so the decode step is
stubbed (clearly marked below); everything Spark-side is real and
tested: binary column construction, schema, partition-parallel
mapInPandas with Arrow transfer, batch shapes, and the byte-level
feature extraction that doesn't need a codec (sizes, hashes).

Scale stance: media bytes never leave the executor (no collect); the
pandas stage is a narrow map — no shuffle — and the binary column rides
parquet's byte-array encoding.  At 100 TB you partition by media_type /
date and let column pruning skip the bytes when a query only reads
metadata.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import load_table
from . import Registry

REG = Registry()

MEDIA_TYPES = ["text", "image", "audio", "video"]

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("feat0", LongType(), True),
    ]
)


def decode_media(content: bytes, media_type: str) -> bytes:
    """STUB — media decode.  Real image/audio/video decoding needs codec
    libraries not present in this container; 'text' decodes for real.
    The deterministic passthrough keeps the pipeline testable end-to-end;
    swap in PIL/ffmpeg adapters at deployment."""
    if media_type == "text":
        content.decode("utf-8")  # validates; raises on malformed input
        return content
    # deterministic fake "decode": identity bytes (would be pixel/sample
    # buffers with a real codec)
    return content


def as_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cast as a media table: text → utf-8 binary payload,
    media_type assigned deterministically so every decode path runs."""
    doc = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 4 + 1).cast("int")
    )
    return doc.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        mt.alias("media_type"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: byte-level feature extraction per Arrow batch.
    Runs the (stubbed) decode, then computes size/hash/lead-byte
    features — the real plumbing a codec-backed extractor drops into."""
    for pdf in batches:
        decoded = [
            decode_media(bytes(c), t) for c, t in zip(pdf["content"], pdf["media_type"])
        ]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(b) for b in decoded],
                "content_md5": [hashlib.md5(b).hexdigest() for b in decoded],
                "feat0": [len(b) % 256 for b in decoded],
            }
        )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("out_width", LongType(), True),
        StructField("out_height", LongType(), True),
        StructField("n_bytes_out", LongType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", LongType(), True),
        StructField("frame_offset_bytes", LongType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def resize_media(spark: SparkSession, sf_dir: str, target_w: int = 224, target_h: int = 224) -> "DataFrame":
    """Resize stage (STUB decode): real pixel resampling needs PIL/ffmpeg;
    the Spark-side plumbing — Arrow batches in, per-row byte payloads,
    deterministic output dims — is real and tested.  The stub 'resize'
    keeps a deterministic byte subsample so output size scales with the
    target dims."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, content, mtype in zip(pdf["media_id"], pdf["content"], pdf["media_type"]):
                b = decode_media(bytes(content), mtype)
                # deterministic fake: output bytes proportional to target area
                stride = max(1, len(b) * 4 // (target_w * target_h))
                resized = b[::stride]
                out_rows.append((int(mid), mtype, target_w, target_h, len(resized)))
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "media_type", "out_width", "out_height", "n_bytes_out"],
            )

    return as_media_table(spark, sf_dir).mapInPandas(do_resize, RESIZE_SCHEMA)


def sample_frames(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> "DataFrame":
    """Frame-sampling stage for 'video' media (STUB decode): emits
    n_frames evenly-spaced byte offsets with a content hash per frame —
    the exact row-explosion shape a real keyframe extractor produces
    (one input row → N output rows through mapInPandas)."""
    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, mtype in zip(pdf["media_id"], pdf["content"], pdf["media_type"]):
                if mtype != "video":
                    continue
                b = bytes(content)
                # payloads shorter than n_frames yield fewer frames; the
                # LAST frame absorbs the remainder so every byte belongs
                # to exactly one frame
                k = min(n_frames, len(b)) or 1
                step = len(b) // k if k else 1
                for i in range(k):
                    off = i * step
                    frame = b[off:] if i == k - 1 else b[off : off + step]
                    rows.append((int(mid), i, off, hashlib.md5(frame).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_offset_bytes", "frame_md5"]
            )

    return as_media_table(spark, sf_dir).mapInPandas(do_sample, FRAME_SCHEMA)


@REG.add(
    "mm_resize",
    f"""
    SELECT doc_id AS media_id,
           list_extract(['text','image','audio','video'], CAST(doc_id % 4 AS INT) + 1) AS media_type,
           224 AS out_width, 224 AS out_height,
           CAST(CEIL(octet_length(encode(text))
                 / CAST(GREATEST(octet_length(encode(text)) * 4 // (224*224), 1) AS DOUBLE))
                AS BIGINT) AS n_bytes_out
    FROM documents
    """,
    doc="Multimodal resize stage: mapInPandas over binary payloads with stubbed "
    "pixel decode; deterministic output size hash-checked against SQL.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_media(spark, sf_dir)


@REG.add(
    "mm_frame_sample",
    """
    WITH v AS (
        SELECT doc_id AS media_id, text,
               octet_length(encode(text)) AS n,
               GREATEST(LEAST(4, octet_length(encode(text))), 1) AS k
        FROM documents WHERE doc_id % 4 = 3
    )
    SELECT media_id, i AS frame_index,
           i * (n // k) AS frame_offset_bytes,
           CASE WHEN i = k - 1 THEN md5(substr(text, i * (n // k) + 1))
                ELSE md5(substr(text, i * (n // k) + 1, n // k)) END AS frame_md5
    FROM v, UNNEST(range(k)) AS t(i)
    """,
    doc="Multimodal frame sampling: one video row → N frame rows (offset + "
    "content hash) through mapInPandas.  The corpus is ASCII (byte offsets == "
    "char offsets, asserted in tests), so the python byte-slice md5s are "
    "SQL-recomputable and the driver hash-checks them; shape and byte-coverage "
    "also asserted in tests/test_llm_ops.py.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(spark, sf_dir)


@REG.add(
    "mm_feature_extract",
    """
    SELECT doc_id AS media_id,
           list_extract(['text','image','audio','video'], CAST(doc_id % 4 AS INT) + 1) AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           octet_length(encode(text)) % 256 AS feat0
    FROM documents
    """,
    doc="Multimodal feature extraction: binary column → mapInPandas (Arrow "
    "batches) → decode stub → byte-level features. The pandas output is "
    "hash-checked against a SQL recomputation of the same features.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return as_media_table(spark, sf_dir).mapInPandas(_extract_features, FEATURE_SCHEMA)
