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
