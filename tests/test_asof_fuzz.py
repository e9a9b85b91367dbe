"""Property-based test: merge_asof must agree with the brute-force
per-row definition (most recent right row at-or-before each left row,
per key) on arbitrary small inputs — ties, unmatched keys, equal
timestamps and all."""

from __future__ import annotations

from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.relational import merge_asof

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # ts
    ),
    min_size=0,
    max_size=25,
)


def brute_force(left, right):
    out = []
    for lk, lt, lid in left:
        cands = [(rt, rv) for rk, rt, rv in right if rk == lk and rt <= lt]
        if cands:
            rt, rv = max(cands)  # greatest ts; ties resolved by dedup below
            out.append((lk, lt, lid, rv, rt))
        else:
            out.append((lk, lt, lid, None, None))
    return sorted(out)


@given(lrows=rows, rrows=rows)
@settings(max_examples=fuzz_examples(12), deadline=None)
def test_merge_asof_matches_bruteforce(spark, lrows, rrows):
    left = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    # right unique per (key, ts) — the operator's documented requirement;
    # payload value = max row index among ties (mirrors j6's MAX dedup)
    dedup = {}
    for i, (k, t) in enumerate(rrows):
        dedup[(k, t)] = max(dedup.get((k, t), -1), 100 + i)
    right = [(k, t, v) for (k, t), v in dedup.items()]

    ldf = spark.createDataFrame(left or [(0, 0, 0)], "key int, ts int, lid int")
    if not left:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "key int, ts int, val int")
    if not right:
        rdf = rdf.limit(0)

    got = sorted(
        (r.key, r.ts, r.lid, r.asof_val, r.asof_ts)
        for r in merge_asof(ldf, rdf, key="key", ts="ts").collect()
    )
    assert got == brute_force(left, right)


def brute_join(big, small):
    out = []
    for bk, bv in big:
        for sk, sv in small:
            if bk is not None and bk == sk:
                out.append((bk, bv, sv))
    return sorted(out)


@given(
    big=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 99)),
        max_size=20,
    ),
    small=st.lists(st.tuples(st.integers(0, 5), st.integers(100, 199)), max_size=8),
)
@settings(max_examples=fuzz_examples(8), deadline=None)
def test_salted_join_matches_plain_join(spark, big, small):
    """salted_join must equal the plain inner join on arbitrary inputs —
    null keys dropped, duplicate keys multiplied, hot keys included (the
    pmod salt can never produce an unmatched bucket)."""
    from banking_streamprocessing_demos_spark.operators.skew import salted_join

    bdf = spark.createDataFrame(big or [(0, 0)], "k int, bv int")
    if not big:
        bdf = bdf.limit(0)
    sdf = spark.createDataFrame(small or [(0, 100)], "k int, sv int")
    if not small:
        sdf = sdf.limit(0)
    got = sorted((r.k, r.bv, r.sv) for r in salted_join(bdf, sdf, "k", salt_buckets=4).collect())
    assert got == brute_join(big, small)
