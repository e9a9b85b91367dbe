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


def test_hll_estimate_within_error_bound(spark, duck):
    """Deterministic HLL (m=512, rse ~4.6%): every per-group estimate
    must land within 3x the published relative standard error of the
    exact distinct count."""
    from banking_streamprocessing_demos_spark.operators.sketches import sketch_hll_distinct

    est = {r.o_orderpriority: r.est_distinct for r in sketch_hll_distinct(spark, SF_SMALL).collect()}
    exact = dict(
        duck.sql(
            "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert set(est) == set(exact)
    for grp, e in est.items():
        assert abs(e - exact[grp]) / exact[grp] < 0.14, (grp, e, exact[grp])


def test_cms_overestimates_and_finds_heavy_hitters(spark, duck):
    """Count-Min guarantees est >= true count; the exact top-5 heavy
    hitters must appear in the sketch's top-20."""
    from banking_streamprocessing_demos_spark.operators.sketches import sketch_cms_heavy_hitters

    est = {r.user_id: r.est_count for r in sketch_cms_heavy_hitters(spark, SF_SMALL).collect()}
    exact = dict(
        duck.sql("SELECT user_id, COUNT(*) FROM events GROUP BY 1").fetchall()
    )
    assert len(est) == min(20, len(exact))
    for uid, e in est.items():
        assert e >= exact[uid], (uid, e, exact[uid])
    top5_exact = [
        u for u, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    ]
    assert set(top5_exact) <= set(est)


def test_bloom_no_false_negatives(spark, duck):
    """Every order whose customer is truly in the build set MUST pass
    the Bloom pre-filter (no false negatives, by construction), and the
    false-positive rate over probed customers stays under 5%."""
    from banking_streamprocessing_demos_spark.operators.sketches import (
        BLOOM_ACCTBAL,
        sketch_bloom_prefilter,
    )

    out = sketch_bloom_prefilter(spark, SF_SMALL).collect()
    passed_orders = {r.o_orderkey for r in out}
    true_orders = {
        k
        for (k,) in duck.sql(
            f"""SELECT o_orderkey FROM orders
                SEMI JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL}) b
                ON o_custkey = c_custkey"""
        ).fetchall()
    }
    assert true_orders <= passed_orders
    n_probe = duck.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    fp_cust = {r.o_custkey for r in out if r.is_member == 0}
    assert len(fp_cust) / n_probe < 0.05, (len(fp_cust), n_probe)
