"""Property-based test: the generated PQ-codebook oracle (DuckDB CTE
k-means stages) must agree with an independent plain-Python Lloyd
implementation on arbitrary small vector corpora.

The reference reimplements the documented trajectory from scratch —
seeded init (round6 unit sub-vectors of vec_id 0..K-1), round6(|c|^2
- 2 s.c) argmin with lowest-code tiebreak, DECIMAL(20,9)-exact mean
sums rounded to 6dp, empty cells keeping their previous centroid —
using explicit left-associative float folds (Python floats ARE IEEE
doubles, so the arithmetic is bit-identical to DuckDB's sequential
list_dot_product on the same values).  Random inputs exercise the
empty-cell COALESCE branch and tiebreaks that the fixed testdata may
never hit.  DuckDB-only on purpose (the Spark side is hash-checked
against this same oracle by the full gate; Spark-per-example would be
too slow for hypothesis)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.pq import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    _codebook_oracle_sql,
)
from banking_streamprocessing_demos_spark.operators.similarity import DIMS

# a corpus of PQ_K..2*PQ_K vectors of small integer-ish components —
# coarse values make centroid collisions and empty cells common
corpora = st.lists(
    st.lists(
        st.integers(min_value=-3, max_value=3).map(lambda i: i / 2 + 0.25),
        min_size=DIMS,
        max_size=DIMS,
    ),
    min_size=PQ_K,
    max_size=2 * PQ_K,
)


def _round6(x: float) -> float:
    # DuckDB ROUND is half-away-from-zero; Python round() is banker's
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _reference_codebook(vecs: list[list[float]]) -> dict[tuple[int, int, int], float]:
    # unit-normalize
    units = []
    for v in vecs:
        nrm = _dot(v, v) ** 0.5
        units.append([x / nrm for x in v])
    subs = {
        (i, m): u[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        for i, u in enumerate(units)
        for m in range(PQ_M)
    }
    # seeded init: centroid k of subspace m = round6 sub-vector of vec k
    cb = {
        m: [[_round6(x) for x in subs[(k, m)]] for k in range(PQ_K)]
        for m in range(PQ_M)
    }
    for _ in range(PQ_ITERS):
        # assignment: argmin round6(|c|^2 - 2 s.c), lowest code on ties
        groups: dict[tuple[int, int], list[int]] = {}
        for (i, m), s in subs.items():
            best = min(
                range(PQ_K),
                key=lambda k: (_round6(_dot(cb[m][k], cb[m][k]) - 2 * _dot(s, cb[m][k])), k),
            )
            groups.setdefault((m, best), []).append(i)
        # DECIMAL(20,9)-exact mean, rounded 6dp; empty cells unchanged
        new_cb = {m: [list(c) for c in cb[m]] for m in range(PQ_M)}
        for (m, k), members in groups.items():
            for d in range(PQ_SUBDIM):
                total = sum(
                    Decimal(repr(subs[(i, m)][d])).quantize(
                        Decimal("1e-9"), rounding=ROUND_HALF_UP
                    )
                    for i in members
                )
                new_cb[m][k][d] = _round6(float(total) / len(members))
        cb = new_cb
    return {
        (m, k, d + 1): cb[m][k][d]
        for m in range(PQ_M)
        for k in range(PQ_K)
        for d in range(PQ_SUBDIM)
    }


@settings(max_examples=60, deadline=None)
@given(corpora)
def test_pq_codebook_oracle_matches_reference(vecs: list[list[float]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", list(enumerate(vecs))
    )
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(_codebook_oracle_sql()).fetchall()
    }
    expected = _reference_codebook(vecs)
    assert got == expected
