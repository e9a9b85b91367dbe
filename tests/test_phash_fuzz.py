"""Property-based test: the perceptual-hash (dHash) oracle's generated
arithmetic — 72 block-sum grid cells, integer cross-multiplied
comparisons, 2x32-bit packing, the variant splice, and the Hamming
cut — must agree with an independent plain-Python implementation over
random ASCII corpora.  Edge regions deliberately covered: payloads
shorter than the 72-cell grid (zero-length cells), equal adjacent cell
means (strict > packs 0), and length-48 minimum docs."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.multimodal import (
    PHASH_CELLS,
    PHASH_HAM_K,
    PHASH_VARIANT_OFFSET,
    REG,
)

# printable-ASCII corpus (matching the testdata contract asserted in
# test_llm_ops: byte offsets == char offsets); includes docs far below
# the 72-byte grid so zero-length cells are exercised
doc_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=200,
)
corpus_strategy = st.lists(doc_text, min_size=1, max_size=12)


def ref_phash(s: str) -> tuple[int, int]:
    """Plain-Python dHash twin of _phash_half_terms + _phash_cell_sql."""
    n = len(s)
    cells = []
    for k in range(PHASH_CELLS):
        start, end = (k * n) // PHASH_CELLS, ((k + 1) * n) // PHASH_CELLS
        cells.append((sum(ord(c) for c in s[start:end]), end - start))
    lo = hi = 0
    for r in range(8):
        for c in range(8):
            (sa, la), (sb, lb) = cells[r * 9 + c], cells[r * 9 + c + 1]
            if sa * lb > sb * la:
                bit = r * 8 + c
                if bit < 32:
                    lo += 1 << bit
                else:
                    hi += 1 << (bit - 32)
    return lo, hi


def ref_variant(s: str) -> str:
    m = len(s) // 2
    return s[: max(m - 1, 0)] + "xxxxx" + s[m + 4 :]


def ref_pairs(payloads: dict[int, str]) -> dict[tuple[int, int], int]:
    ph = {mid: ref_phash(p) for mid, p in payloads.items()}
    out = {}
    for a in ph:
        for b in ph:
            if a < b:
                h = bin(ph[a][0] ^ ph[b][0]).count("1") + bin(
                    ph[a][1] ^ ph[b][1]
                ).count("1")
                if h <= PHASH_HAM_K:
                    out[(a, b)] = h
    return out


@settings(max_examples=fuzz_examples(50), deadline=None)
@given(corpus_strategy)
def test_phash_oracle_matches_reference(corpus: list[str]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(corpus))
    )
    sql = REG.queries["mm_phash_dedup"].oracle
    got = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}

    payloads = {i: t for i, t in enumerate(corpus) if i % 4 == 1}
    payloads.update(
        {
            i + PHASH_VARIANT_OFFSET: ref_variant(t)
            for i, t in enumerate(corpus)
            if i % 8 == 1
        }
    )
    assert got == ref_pairs(payloads)
