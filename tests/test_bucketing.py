"""SURVEY §4: bucketed co-located joins must plan with zero shuffle
Exchanges — the write-once/join-free layout for recurring J1/J4 joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from banking_streamprocessing_demos_spark.plans.explain import count_shuffles, formatted_plan
from banking_streamprocessing_demos_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "b_orders", "o_custkey", n_buckets=8)
    write_bucketed(customer, "b_customer", "o_custkey", n_buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast so the test proves bucketing (not broadcast)
    # removed the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_custkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan[:2000]
        assert count_shuffles(joined) == 0, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_custkey").select("o_orderkey", "c_name")
    plain = (
        load_table(spark, SF_SMALL, "orders")
        .join(
            load_table(spark, SF_SMALL, "customer").withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey",
        )
        .select("o_orderkey", "c_name")
    )
    assert joined.exceptAll(plain).count() == 0
    assert plain.exceptAll(joined).count() == 0
