"""Property-based test: the corpus-bigram LM oracle (per-doc bigram
multiplicities, corpus conditional counts, 6dp-rounded DECIMAL(18,6)
log probabilities summed exactly, 6dp-rounded average) must agree
with an independent plain-Python implementation over random small
corpora — single-word docs emitting no row, hot bigrams shared by
every doc, and the exact-decimal weighted sum."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import REG

docs = st.lists(
    st.lists(st.sampled_from(["p", "q", "r"]), min_size=1, max_size=10),
    min_size=1,
    max_size=5,
)


def _round6d(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)


def _reference(corpus: list[list[str]]) -> dict[int, tuple[int, float]]:
    big: dict[tuple[int, str, str], int] = {}
    for doc_id, ws in enumerate(corpus):
        for a, b in zip(ws, ws[1:]):
            big[(doc_id, a, b)] = big.get((doc_id, a, b), 0) + 1
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    for (_, a, b), k in big.items():
        c2[(a, b)] = c2.get((a, b), 0) + k
        c1[a] = c1.get(a, 0) + k
    out: dict[int, tuple[int, float]] = {}
    for doc_id in {d for d, _, _ in big}:
        total = Decimal(0)
        n = 0
        for (d, a, b), k in big.items():
            if d != doc_id:
                continue
            logp = _round6d(math.log(c2[(a, b)] / c1[a]))
            total += k * logp
            n += k
        # exact integer half-away-from-zero mean in micro-units — the
        # _avg6_sql contract (the old float(total)/n path lost exact
        # 6dp ties: total -4.220325 over n=6 is exactly -0.7033875,
        # which the engines round away from zero to -0.703388 while the
        # float detour rounded to -0.703387)
        t_micro = int(abs(total) * 1_000_000)
        sign = -1 if total < 0 else 1
        avg = sign * ((2 * t_micro + n) // (2 * n)) / 1_000_000.0
        out[doc_id] = (n, avg)
    return out


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(docs)
def test_bigram_lm_oracle_matches_reference(corpus: list[list[str]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    sql = REG.queries["text_bigram_lm_score"].oracle
    got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == _reference(corpus)
