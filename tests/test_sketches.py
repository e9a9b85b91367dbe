"""Approximate sketches (100 TB staple): HLL distinct counts must land
within documented error bounds of exact — exact-hash oracles can't
check approximate ops, so the tolerance contract lives here."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_approx_count_distinct_tolerance(spark):
    ev = load_table(spark, SF_SMALL, "events")
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd

    li = load_table(spark, SF_SMALL, "lineitem")
    exact = li.select(F.count_distinct("l_orderkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.06


def test_approx_percentile_tolerance(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    exact = li.select(F.percentile(F.col("l_extendedprice"), F.lit(0.5))).first()[0]
    approx = li.select(
        F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10_000))
    ).first()[0]
    assert abs(approx - exact) / exact < 0.01
