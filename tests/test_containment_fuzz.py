"""Property-based test: the asymmetric-containment oracle (df-capped
shingle equi-join + either-direction tau filter) must agree with an
independent plain-Python implementation over random small corpora —
the short-doc-inside-long-doc case, ties at the tau boundary's
unrounded compare, and pairs dropped when a side's capped shingle set
is empty."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.dedup import CONTAINMENT_TAU, REG

docs = st.lists(
    st.lists(st.sampled_from(["p", "q"]), min_size=1, max_size=14),
    min_size=2,
    max_size=5,
)


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _reference(
    corpus: list[list[str]],
) -> dict[tuple[int, int], tuple[float, float]]:
    shingles = {
        doc_id: {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        for doc_id, ws in enumerate(corpus)
    }
    # SHINGLE_DF_CAP = 1000 never binds on <=5 docs, so no hot set here
    out: dict[tuple[int, int], tuple[float, float]] = {}
    ids = sorted(shingles)
    for a in ids:
        for b in ids:
            if a >= b or not shingles[a] or not shingles[b]:
                continue
            inter = len(shingles[a] & shingles[b])
            if inter == 0:  # equi-join produces no pair row at all
                continue
            ca = inter / len(shingles[a])
            cb = inter / len(shingles[b])
            if ca >= CONTAINMENT_TAU or cb >= CONTAINMENT_TAU:
                out[(a, b)] = (_round6(ca), _round6(cb))
    return out


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(docs)
def test_containment_oracle_matches_reference(corpus: list[list[str]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    sql = REG.queries["text_containment"].oracle
    got = {(r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == _reference(corpus)
