"""Parquet table loaders for the driver-generated testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Loads are plain ``spark.read.parquet`` so Catalyst keeps full pushdown
freedom (column pruning + predicate pushdown reach the scan).  Do NOT
cache here — at 100 TB nothing fits, and caching defeats pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts encoding varies by testdata generation: TIMESTAMP(NANOS)
        # (which Spark 4 rejects natively — read nanos as long, floor to
        # microseconds) or plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ —
        # cast to session-TZ TIMESTAMP; session TZ is pinned UTC, so the
        # wall-clock is preserved and matches DuckDB's naive-as-UTC view).
        # All downstream time math uses ms epoch either way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type.startswith("timestamp_ntz"):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql paths."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
