"""Property tests for the portable deterministic expression helpers —
the foundation every oracle-checked query's reproducibility rests on."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st
from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.functions.expressions import (
    HEX_DIGITS,
    build_phone_number,
    det_hash_hex,
    det_uniform,
    hex4_to_int,
    weighted_classify,
)


def _python_hex4(seed: str, key: str) -> int:
    h = hashlib.md5(f"{seed}-{key}".encode()).hexdigest()
    return int(h[:4], 16)


def test_det_uniform_matches_python_md5(spark):
    """The Spark expression must equal the straightforward Python md5
    derivation (this is exactly what the DuckDB oracles recompute)."""
    df = spark.range(500).select(
        "id",
        det_uniform("id", seed="42").alias("u"),
        det_hash_hex("id", seed="42").alias("h"),
    )
    for r in df.collect():
        expect_h = hashlib.md5(f"42-{r.id}".encode()).hexdigest()
        assert r.h == expect_h
        assert abs(r.u - _python_hex4("42", str(r.id)) / 65536.0) < 1e-12


def test_uniform_range_and_spread(spark):
    rows = spark.range(2000).select(det_uniform("id", seed="s").alias("u")).collect()
    us = [r.u for r in rows]
    assert all(0.0 <= u < 1.0 for u in us)
    # crude uniformity: quartile occupancy within 3 sigma of expectation
    for lo in (0.0, 0.25, 0.5, 0.75):
        frac = sum(lo <= u < lo + 0.25 for u in us) / len(us)
        assert abs(frac - 0.25) < 0.03, (lo, frac)


@given(
    st.floats(min_value=0.05, max_value=0.9),
    st.floats(min_value=0.05, max_value=0.09),
)
@settings(max_examples=fuzz_examples(10), deadline=None)
def test_weighted_classify_boundaries(spark, p1, p2):
    df = spark.createDataFrame(
        [(0.0,), (p1 - 1e-9,), (p1,), (p1 + p2 - 1e-9,), (p1 + p2,), (0.999999,)], ["u"]
    ).select(weighted_classify(F.col("u"), p1, p2).alias("c"))
    got = [r.c for r in df.collect()]
    assert got == ["normal", "normal", "delayed", "delayed", "never", "never"]


def test_hex4_to_int_covers_domain(spark):
    df = spark.createDataFrame([("0000",), ("ffff",), ("8000",)], ["h"]).select(
        hex4_to_int(F.col("h")).alias("v")
    )
    assert [r.v for r in df.collect()] == [0, 65535, 32768]
    assert len(HEX_DIGITS) == 16


def test_build_phone_number(spark):
    df = spark.createDataFrame([(212, 555, 1234)], ["a", "e", "n"]).select(
        build_phone_number(F.col("a"), F.col("e"), F.col("n")).alias("p")
    )
    assert df.first().p == 2125551234


def test_morton_code_matches_python_reference(spark):
    """Bit-interleave correctness vs a pure-Python reference, plus the
    locality property that justifies the layout: sorting by the Morton
    code keeps 2-D neighbors closer than a single-key sort does."""
    from banking_streamprocessing_demos_spark.operators.relational import f13_morton_code
    from tests.conftest import SF_SMALL

    rows = f13_morton_code(spark, SF_SMALL).collect()

    def py_morton(x, y):
        m = 0
        for i in range(16):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    assert rows
    for r in rows[:500]:
        assert r.morton == py_morton(r.x, r.y), (r.x, r.y)

    # locality: average |Δx| + |Δy| between rows adjacent in morton
    # order must beat adjacency in plain x order's |Δy| spread
    by_morton = sorted(rows, key=lambda r: r.morton)
    by_x = sorted(rows, key=lambda r: (r.x, r.event_id))
    d_morton = sum(
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(by_morton, by_morton[1:])
    ) / (len(rows) - 1)
    d_x = sum(
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(by_x, by_x[1:])
    ) / (len(rows) - 1)
    assert d_morton < d_x, (d_morton, d_x)
