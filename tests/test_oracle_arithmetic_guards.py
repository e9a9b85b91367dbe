"""Pinning tests for the two round-9 latent cross-engine divergences
(round-9 VERDICT #3 / driver ADVICE):

1. ``_avg6_sql`` must stay exact at WIDE magnitudes: the pre-fix form
   multiplied a DECIMAL(38,6) sum by 1e6, which overflows width 38 in
   DuckDB and silently detours through DOUBLE — correct only while
   |t|*1e6 << 2^53.  The fixed form narrows to DECIMAL(30,6) first so
   the product stays exact decimal.  Fixture: micro-units 2^53 + 1,
   the first integer a double cannot represent.

2. ``_VARIANT_SQL`` (the phash spliced re-encode) must stay
   well-defined for payloads shorter than 2 chars: the unguarded form
   rendered substr(text, 1, -1), whose negative-length semantics are
   engine-specific.  The GREATEST guard clamps the prefix length at 0;
   this pin runs the SAME formula in DuckDB (//) and Spark (div) over
   0..3-char payloads and a corpus-contract-sized one.
"""

from __future__ import annotations

import duckdb
import pytest

from banking_streamprocessing_demos_spark.operators.multimodal import _VARIANT_SQL
from banking_streamprocessing_demos_spark.operators.text import _avg6_spark, _avg6_sql

# micro-units 2^53 + 1: exactly representable in DECIMAL(18,6)
# (9007199254.740993 — 16 digits), NOT representable as a double
WIDE_T = "9007199254.740993"
WIDE_N = 2
# exact half-away-from-zero mean in micro-units:
# (2 * (2^53 + 1) + 2) // 4 = 2^52 + 1
WIDE_EXPECT = (2 * (2**53 + 1) + WIDE_N) // (2 * WIDE_N) / 1_000_000.0


def test_avg6_wide_magnitude_duckdb_exact() -> None:
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_avg6_sql('t', 'n')} AS avg FROM "
        f"(SELECT CAST('{WIDE_T}' AS DECIMAL(18,6)) AS t, "
        f"CAST({WIDE_N} AS BIGINT) AS n)"
    ).fetchone()[0]
    assert got == WIDE_EXPECT
    # negative branch: sign handling must survive the same magnitude
    got_neg = con.execute(
        f"SELECT {_avg6_sql('t', 'n')} AS avg FROM "
        f"(SELECT CAST('-{WIDE_T}' AS DECIMAL(18,6)) AS t, "
        f"CAST({WIDE_N} AS BIGINT) AS n)"
    ).fetchone()[0]
    assert got_neg == -WIDE_EXPECT


def test_avg6_beyond_bigint_bound_fails_loud_never_silent() -> None:
    """The _avg6_sql docstring's contract: within |t| <= ~9.2e12 the
    recipe is exact (covered above); BEYOND the BIGINT micro-unit bound
    it must fail LOUDLY (conversion/overflow error), never silently
    detour through a lossy representation.  (On this DuckDB version
    DECIMAL(38,6)*1e6 is exact hugeint math up to width 38 and raises
    on true overflow — the (30,6) narrowing keeps the formula inside
    exact-decimal territory on any engine version either way.)"""
    con = duckdb.connect()
    with pytest.raises(duckdb.Error):
        con.execute(
            f"SELECT {_avg6_sql('t', 'n')} AS avg FROM "
            "(SELECT CAST('9300000000000.000001' AS DECIMAL(20,6)) AS t, "
            "CAST(2 AS BIGINT) AS n)"
        ).fetchone()


def test_avg6_beyond_bigint_bound_fails_loud_spark(spark) -> None:
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    df = spark.sql(
        "SELECT CAST('9300000000000.000001' AS DECIMAL(20,6)) AS t, "
        "CAST(2 AS BIGINT) AS n"
    ).select(_avg6_spark("t", "n").alias("avg"))
    with pytest.raises((PySparkException, Py4JJavaError)):
        df.collect()


def test_avg6_wide_magnitude_spark_matches_duckdb(spark) -> None:
    df = spark.sql(
        f"SELECT CAST('{WIDE_T}' AS DECIMAL(18,6)) AS t, CAST({WIDE_N} AS BIGINT) AS n"
    ).select(_avg6_spark("t", "n").alias("avg"))
    assert df.collect()[0]["avg"] == WIDE_EXPECT


SHORT_PAYLOADS = ["", "a", "ab", "abc", "abcdefgh", "x" * 48]


@pytest.mark.parametrize("payload", SHORT_PAYLOADS, ids=[str(len(p)) for p in SHORT_PAYLOADS])
def test_phash_variant_short_payload_engine_parity(spark, payload: str) -> None:
    duck_sql = _VARIANT_SQL.format(idiv="//")
    spark_sql = _VARIANT_SQL.format(idiv="div")
    d = (
        duckdb.connect()
        .execute(f"SELECT {duck_sql} AS v FROM (SELECT ? AS text)", [payload])
        .fetchone()[0]
    )
    s = (
        spark.createDataFrame([(payload,)], "text string")
        .selectExpr(f"{spark_sql} AS v")
        .collect()[0]["v"]
    )
    assert d == s, f"len={len(payload)}: duckdb={d!r} spark={s!r}"
    # the splice marker always lands; prefix/suffix stay well-defined
    assert "xxxxx" in d
