"""Bucketed-table layout (SURVEY §4 O-IDX): the engine's answer to the
reference's B-tree indexes (phone_message_producer.py:108-109) at
warehouse scale.

Writing both sides of a recurring equi-join bucketed (and sort-merged)
on the join key makes the join shuffle-FREE: each task zips matching
buckets.  On a 100 TB fact table this removes the dominant exchange of
J1/J4-class joins; the cost is paid once at write time.  (The analog at
partition level is the IVF index in similarity.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) managed
    table.  Spark only honors bucket metadata through the catalog
    (saveAsTable), not bare parquet paths."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.  With
    matching bucket specs Catalyst plans a SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
