"""Sequence packing for LLM pretraining (round-2 extension): concatenate
the corpus in doc_id order and chunk it into fixed-length training
sequences — the "concat and chunk" layout every large-scale pretraining
pipeline needs.  Output: each document's global token offset and the
range of training sequences it lands in.

Scale stance: the naive formulation is a running sum over a GLOBAL
total order — a single-partition window that serializes the corpus
through one task.  Implemented instead as the textbook two-level
distributed prefix sum, entirely in declarative DataFrame ops:

1. bucket docs by ``doc_id // BUCKET`` and aggregate per-bucket token
   totals (one map-side-combined shuffle, fully parallel);
2. exclusive-prefix the bucket totals with a window over the SMALL
   bucket table (N/BUCKET rows — the recursion base; ~2.4M rows even
   at 10^10 documents, and the pattern recurses if that ever grows);
3. within-bucket exclusive prefix (window partitioned by bucket, fully
   parallel) + join the bucket offsets back (tiny side, AQE broadcasts).

Offsets are pure integer arithmetic — deterministic under any
partitioning, no sampled range boundaries, no partition-id coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import Registry

REG = Registry()

SEQ_LEN = 2048  # tokens per packed training sequence
BUCKET = 4096  # docs per prefix-sum bucket (level-1 fan-in)


@REG.add(
    "pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        FROM documents
    ),
    o AS (
        SELECT doc_id, n_tokens,
               COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS start_offset
        FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {SEQ_LEN} AS start_seq,
           (start_offset + n_tokens - 1) // {SEQ_LEN} AS end_seq,
           (start_offset + n_tokens - 1) // {SEQ_LEN} - start_offset // {SEQ_LEN} + 1 AS n_seqs
    FROM o
    """,
    doc=f"Concat-and-chunk sequence packing (seq len {SEQ_LEN}, whitespace tokens, "
    "same count as text_token_counts.n_tokens_ws): global token offset per doc via "
    "a two-level distributed prefix sum, then the packed-sequence id range each "
    "document spans.  The oracle states the same offsets as one naive window.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (spaces + 1).cast("long").alias("n_tokens")
    )
    d = docs.withColumn("bucket", F.expr(f"doc_id div {BUCKET}"))

    # level 1: per-bucket totals — map-side-combined groupBy, parallel
    bucket_tot = d.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    # level 2: exclusive prefix over the SMALL bucket table; the global
    # window is the recursion base (N/BUCKET rows), never the corpus
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_off = bucket_tot.select(
        "bucket", F.coalesce(F.sum("btot").over(wb), F.lit(0)).alias("boff")
    )
    # level 3: within-bucket exclusive prefix — partitioned by bucket,
    # parallel; join back the per-bucket base offsets (tiny, broadcast)
    wd = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (F.col("boff") + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0))).alias(
        "start_offset"
    )
    out = d.join(F.broadcast(bucket_off), "bucket").select("doc_id", "n_tokens", start)
    last = F.col("start_offset") + F.col("n_tokens") - 1
    start_seq = F.expr(f"start_offset div {SEQ_LEN}")
    end_seq = (last - last % SEQ_LEN) / SEQ_LEN  # div via exact integer arithmetic
    return out.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        start_seq.alias("start_seq"),
        end_seq.cast("long").alias("end_seq"),
        (end_seq.cast("long") - start_seq + 1).alias("n_seqs"),
    )
