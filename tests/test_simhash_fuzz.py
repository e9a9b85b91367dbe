"""Property-based test: the SimHash oracle's bit arithmetic (md5 hex
digit -> nibble -> per-bit +-1 vote -> majority -> 2^bit packing)
must agree with an independent plain-Python implementation over
random small corpora — tied votes (SUM = 0 packs as 0), single-word
docs, repeated words collapsing to one distinct vote, and all."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.dedup import REG, SIMHASH_BITS

docs = st.lists(
    st.lists(st.sampled_from(["p", "q", "r", "s"]), min_size=1, max_size=10),
    min_size=1,
    max_size=5,
)


def _reference(corpus: list[list[str]]) -> dict[int, int]:
    out: dict[int, int] = {}
    for doc_id, ws in enumerate(corpus):
        votes = [0] * SIMHASH_BITS
        for w in set(ws):
            h = hashlib.md5(("sh-" + w).encode()).hexdigest()
            for bit in range(SIMHASH_BITS):
                # the oracle indexes hex digit bit//4 and takes bit
                # (3 - bit%4) of that nibble — MSB-first within nibbles
                nibble = int(h[bit // 4], 16)
                votes[bit] += 1 if (nibble >> (3 - bit % 4)) & 1 else -1
        out[doc_id] = sum(
            (1 << bit) for bit in range(SIMHASH_BITS) if votes[bit] > 0
        )
    return out


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(docs)
def test_simhash_oracle_matches_reference(corpus: list[list[str]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    sql = REG.queries["dedup_simhash"].oracle
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == _reference(corpus)
