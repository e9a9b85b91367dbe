"""Property-based test: the TF-IDF oracle (tf, distinct-doc df,
smoothed idf, 6dp-rounded score, per-doc top-3 with term tiebreak)
must agree with an independent plain-Python implementation over
random small corpora — tied rounded scores resolved by term order,
terms present in every document, and single-term documents."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import REG

docs = st.lists(
    st.lists(st.sampled_from(["p", "q", "r", "s", "t"]), min_size=1, max_size=12),
    min_size=1,
    max_size=6,
)


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _reference(
    corpus: list[list[str]],
) -> set[tuple[int, str, int, float, int]]:
    n = len(corpus)
    df: dict[str, int] = {}
    for ws in corpus:
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    out: set[tuple[int, str, int, float, int]] = set()
    for doc_id, ws in enumerate(corpus):
        tf: dict[str, int] = {}
        for t in ws:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (t, c, _round6(c * math.log((n + 1.0) / (df[t] + 1.0))))
            for t, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rnk, (t, c, s) in enumerate(scored[:3], start=1):
            out.add((doc_id, t, c, s, rnk))
    return out


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(docs)
def test_tfidf_oracle_matches_reference(corpus: list[list[str]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    sql = REG.queries["text_tfidf_topk"].oracle
    got = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == _reference(corpus)
