"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are implemented in ``banking_streamprocessing_demos_spark/``;
each module registers named Query objects (Spark fn + DuckDB oracle
SQL twin) per SURVEY.md §2's operator inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from banking_streamprocessing_demos_spark.operators import merge_registries
from banking_streamprocessing_demos_spark.operators.dedup import REG as DEDUP_REG
from banking_streamprocessing_demos_spark.operators.message_domain import REG as MESSAGE_REG
from banking_streamprocessing_demos_spark.operators.multimodal import REG as MM_REG
from banking_streamprocessing_demos_spark.operators.relational import REG as RELATIONAL_REG
from banking_streamprocessing_demos_spark.operators.similarity import REG as SIM_REG
from banking_streamprocessing_demos_spark.operators.text import REG as TEXT_REG

_REGISTRIES = [RELATIONAL_REG, MESSAGE_REG, DEDUP_REG, SIM_REG, TEXT_REG, MM_REG]


def _all_queries():
    return merge_registries(*_REGISTRIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-way star join +
    aggregation (a3_join_agg_revenue) — the J1/A3 'active per carrier'
    shape (phone_message_producer.py:266-272) at TPC-H-Q5 scale-up."""
    from banking_streamprocessing_demos_spark.operators.relational import a3

    return a3(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in _all_queries().items() if q.oracle is not None}
