"""Property-based test: the substring-spans oracle (position-hashed
8-grams -> corpus-wide frequency -> gaps-and-islands span merge) must
agree with an independent plain-Python implementation of the
documented semantics (Lee et al. 2022-style duplicated-substring
accounting) on arbitrary small corpora — overlapping spans, adjacent
spans that must merge, docs shorter than the gram width, zero-dup
docs that must still emit a (0, 0, 0.0) row, and all.

DuckDB-only on purpose: the Spark side is hash-checked against this
same oracle by the full gate; this fuzzes the generated SQL's window
arithmetic (the running-max island rule and the +-1 position algebra
are exactly where an off-by-one would hide)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.dedup import REG, SPAN_N

# 2-4 docs of 1-30 words over a 2-word vocabulary: 8-gram repeats
# (within AND across docs) are common, and doc tails exercise the
# shorter-than-a-gram edge
docs = st.lists(
    st.lists(st.sampled_from(["x", "y"]), min_size=1, max_size=30),
    min_size=2,
    max_size=4,
)


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _reference(corpus: list[list[str]]) -> dict[int, tuple[int, int, float]]:
    from collections import Counter

    grams: list[tuple[int, int, tuple[str, ...]]] = []
    for doc_id, words in enumerate(corpus):
        for pos in range(len(words) - SPAN_N + 1):
            grams.append((doc_id, pos, tuple(words[pos : pos + SPAN_N])))
    freq = Counter(g for _, _, g in grams)
    out: dict[int, tuple[int, int, float]] = {}
    for doc_id, words in enumerate(corpus):
        dup_pos = sorted(
            pos for d, pos, g in grams if d == doc_id and freq[g] >= 2
        )
        spans: list[list[int]] = []
        for pos in dup_pos:
            if spans and spans[-1][1] + 1 >= pos:
                spans[-1][1] = max(spans[-1][1], pos + SPAN_N - 1)
            else:
                spans.append([pos, pos + SPAN_N - 1])
        dup_tokens = sum(e - s + 1 for s, e in spans)
        out[doc_id] = (
            len(spans),
            dup_tokens,
            _round6(dup_tokens / len(words)),
        )
    return out


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(docs)
def test_substring_spans_oracle_matches_reference(corpus: list[list[str]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    sql = REG.queries["dedup_substring_spans"].oracle
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == _reference(corpus)
