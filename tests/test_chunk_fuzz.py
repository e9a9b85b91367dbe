"""Property-based test: the fixed-block chunk-dedup oracle (64-byte
chunk md5s, position-aligned pair counts, containment) must agree with
an independent plain-Python implementation over random ASCII corpora —
including EMPTY payloads (the round-8 review found Spark's
sequence(0,-1) producing phantom descending chunks for them) and
payloads below one chunk."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.multimodal import (
    MM_CHUNK_BYTES,
    MM_CHUNK_MIN_SHARED,
    MM_CHUNK_TRAILER,
    MM_CHUNK_VARIANT_OFFSET,
    REG,
)

# duplicate-heavy alphabet so chunk collisions actually occur; sizes
# straddle 0 / sub-chunk / multi-chunk
doc_text = st.one_of(
    st.just(""),
    st.text(alphabet="ab ", min_size=0, max_size=200),
    # force some byte-identical long docs so shared chunks appear
    st.sampled_from(["x" * 150, "x" * 150 + "tail", "y" * 64 + "x" * 86]),
)
corpus_strategy = st.lists(doc_text, min_size=1, max_size=10)


def ref_chunks(payload: str) -> list[str]:
    n = (len(payload) + MM_CHUNK_BYTES - 1) // MM_CHUNK_BYTES
    return [
        hashlib.md5(
            payload[i * MM_CHUNK_BYTES : (i + 1) * MM_CHUNK_BYTES].encode()
        ).hexdigest()
        for i in range(n)
    ]


def ref_pairs(payloads: dict[int, str]) -> dict[tuple[int, int], tuple[int, float]]:
    chunks = {m: ref_chunks(p) for m, p in payloads.items()}
    out = {}
    for a in chunks:
        for b in chunks:
            if a >= b:
                continue
            shared = sum(
                1 for x, y in zip(chunks[a], chunks[b]) if x == y
            )
            if shared >= MM_CHUNK_MIN_SHARED:
                cont = round(shared / min(len(chunks[a]), len(chunks[b])), 6)
                out[(a, b)] = (shared, cont)
    return out


@settings(max_examples=fuzz_examples(40), deadline=None)
@given(corpus_strategy)
def test_chunk_dedup_oracle_matches_reference(corpus: list[str]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(corpus))
    )
    sql = REG.queries["mm_chunk_dedup"].oracle
    got = {(r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()}

    payloads = {i: t for i, t in enumerate(corpus) if i % 4 == 3}
    payloads.update(
        {
            i + MM_CHUNK_VARIANT_OFFSET: t + MM_CHUNK_TRAILER
            for i, t in enumerate(corpus)
            if i % 8 == 3
        }
    )
    assert got == ref_pairs(payloads)
