"""Property-based test: merge_asof must agree with the brute-force
per-row definition (most recent right row at-or-before each left row,
per key) on arbitrary small inputs — ties, unmatched keys, equal
timestamps and all."""

from __future__ import annotations

from hypothesis import given, settings
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
@settings(max_examples=12, deadline=None)
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
