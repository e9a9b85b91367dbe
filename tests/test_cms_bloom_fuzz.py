"""Property-based tests: the Count-Min and Bloom-filter oracles (pure
md5-derived integer arithmetic) must agree with independent
plain-Python implementations over random small inputs.

CMS: per-key estimate = min over d rows of the (row, bucket) cell
counts, top-20 by (estimate desc, key) — collisions in a 4x1024 grid
are forced by drawing keys from a wide range so hypothesis explores
both exact and overestimated keys.  Bloom: orders whose custkey sets
all k bits of the high-balance build filter, marked member or false
positive.  Both references recompute buckets/positions from hashlib
directly."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.sketches import (
    BLOOM_ACCTBAL,
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_TOPK,
    CMS_W,
    REG,
)


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------------------
# CMS
# --------------------------------------------------------------------------

user_ids = st.lists(st.integers(0, 10**6), min_size=1, max_size=50)


def _cms_reference(keys: list[int]) -> list[tuple[int, int]]:
    cells: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(CMS_D):
            b = _h8(f"cms-{r}-{k}") % CMS_W
            cells[(r, b)] = cells.get((r, b), 0) + 1
    est = {
        k: min(cells[(r, _h8(f"cms-{r}-{k}") % CMS_W)] for r in range(CMS_D))
        for k in set(keys)
    }
    ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:CMS_TOPK]


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(user_ids)
def test_cms_oracle_matches_reference(keys: list[int]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE events (user_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?)", [(k,) for k in keys])
    sql = REG.queries["sketch_cms_heavy_hitters"].oracle
    got = [(r[0], r[1]) for r in con.execute(sql).fetchall()]
    assert got == _cms_reference(keys)


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------

customers = st.lists(
    st.tuples(st.integers(0, 300), st.sampled_from([100.0, 9500.0])),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)
orders = st.lists(st.integers(0, 300), min_size=1, max_size=25)


def _bloom_reference(
    custs: list[tuple[int, float]], order_keys: list[int]
) -> dict[tuple[int, int], int]:
    build = {c for c, bal in custs if bal > BLOOM_ACCTBAL}
    bits = {
        _h8(f"bf-{j}-{c}") % BLOOM_M for c in build for j in range(BLOOM_K)
    }
    out: dict[tuple[int, int], int] = {}
    for okey, ckey in enumerate(order_keys):
        if all(_h8(f"bf-{j}-{ckey}") % BLOOM_M in bits for j in range(BLOOM_K)):
            out[(okey, ckey)] = int(ckey in build)
    return out


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(customers, orders)
def test_bloom_oracle_matches_reference(
    custs: list[tuple[int, float]], order_keys: list[int]
) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE customer (c_custkey BIGINT, c_acctbal DOUBLE)")
    con.executemany("INSERT INTO customer VALUES (?, ?)", custs)
    con.execute("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT)")
    con.executemany(
        "INSERT INTO orders VALUES (?, ?)", list(enumerate(order_keys))
    )
    sql = REG.queries["sketch_bloom_prefilter"].oracle
    got = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    expected = _bloom_reference(custs, order_keys)
    assert got == expected
    # no false negatives by construction: every true member passed
    build = {c for c, bal in custs if bal > BLOOM_ACCTBAL}
    for okey, ckey in enumerate(order_keys):
        if ckey in build:
            assert (okey, ckey) in got and got[(okey, ckey)] == 1
