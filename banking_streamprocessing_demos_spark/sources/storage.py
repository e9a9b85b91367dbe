"""Durable table storage (S3/D1-D3, U1): the reference's SQLite row
store re-expressed as schema-declared parquet tables.

Semantic mapping (SURVEY §2.2, §2.7):
- CREATE TABLE (D1/D2, py:81-105)  → explicit-schema parquet directory
- PRIMARY KEY / UNIQUE (py:83-84)  → no engine enforcement in Spark;
  enforced at the write path: in-batch dropDuplicates + anti-join
  against the existing table (U1 INSERT OR IGNORE, py:133-152)
- AUTOINCREMENT (py:83)            → monotonically_increasing_id():
  unique, not dense (SURVEY §1.2 documents the deviation)
- indexes (D3, py:108-109)         → none; parquet row-group stats +
  partition pruning serve the access paths at scale
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MESSAGES_SCHEMA, PHONE_NUMBERS_SCHEMA

TABLE_SCHEMAS = {
    "phone_numbers": PHONE_NUMBERS_SCHEMA,
    "messages": MESSAGES_SCHEMA,
}


def create_table(spark: SparkSession, base_dir: str, name: str) -> str:
    """DDL: materialize an empty schema-declared table (D1/D2)."""
    schema = TABLE_SCHEMAS[name]
    path = os.path.join(base_dir, name)
    spark.createDataFrame([], schema).write.mode("ignore").parquet(path)
    return path


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(os.path.join(base_dir, name))


def insert_or_ignore(
    spark: SparkSession, base_dir: str, name: str, rows: DataFrame, key: str
) -> int:
    """U1 (py:133-152): append only rows whose ``key`` is absent — both
    within the incoming batch (first wins) and against the stored table.
    Returns the number of rows actually inserted.

    Scale note: the anti-join shuffles on the key unless the incoming
    batch is small enough to drive a broadcast of its key set; at 100 TB
    the stored side would be bucketed on the key so the probe is
    shuffle-free.  (Delta/Iceberg MERGE replaces this whole function when
    a table format is available.)
    """
    existing = read_table(spark, base_dir, name).select(key)
    fresh = (
        rows.dropDuplicates([key])  # one arbitrary row per in-batch key
        .join(existing, key, "left_anti")
        .persist()  # pin ONE evaluation: count and write must see the
        # same rows (the plan re-reads the stored table and may contain
        # non-deterministic ids; recomputation between count and write
        # could write rows that were never counted)
    )
    try:
        n = fresh.count()
        if n:
            fresh.select(*[f.name for f in TABLE_SCHEMAS[name].fields]).write.mode(
                "append"
            ).parquet(os.path.join(base_dir, name))
    finally:
        fresh.unpersist()
    return n


def with_autoincrement_ids(df: DataFrame, id_col: str = "id") -> DataFrame:
    """AUTOINCREMENT analog: unique-not-dense ids (SURVEY §1.2)."""
    return df.withColumn(id_col, F.monotonically_increasing_id())
