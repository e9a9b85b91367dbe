"""Property-based test: the MinHash+LSH oracle (generated CTE chain —
shingling, df-cap anti-join, 32-bit md5 packing, K affine
permutations, banding, bucket self-join, exact-Jaccard verify) must
agree with an independent plain-Python implementation over random
small corpora.

The reference recomputes everything from hashlib primitives: distinct
word 3-grams, v = int(md5('mh-'+s)[:8], 16), h_i = min((a_i*v + b_i)
mod P), bucket = md5(str(h)-joined band rows), candidates from
(band, bucket) collisions, Jaccard over the DF-CAPPED shingle set
with the unrounded tau compare and the 6dp-rounded output.  df_cap is
fuzzed between a tiny value (exercising the hot-shingle anti-join and
the pair-dropping sizes inner join) and the production default."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.dedup import (
    JACCARD_TAU,
    MH_A,
    MH_B,
    MH_P,
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_ROWS,
    minhash_lsh_oracle,
)

docs = st.lists(
    st.lists(st.sampled_from(["p", "q"]), min_size=1, max_size=12),
    min_size=2,
    max_size=6,
)
caps = st.sampled_from([2, 1000])


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _reference(
    corpus: list[list[str]], df_cap: int
) -> dict[tuple[int, int], float]:
    raw = {
        doc_id: {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
        for doc_id, ws in enumerate(corpus)
    }
    df: dict[str, int] = {}
    for ss in raw.values():
        for s in ss:
            df[s] = df.get(s, 0) + 1
    hot = {s for s, n in df.items() if n > df_cap}
    capped = {d: ss - hot for d, ss in raw.items()}

    # signatures over the RAW (uncapped) shingles
    sigs: dict[int, list[int]] = {}
    for d, ss in raw.items():
        if not ss:
            continue
        vs = [int(_md5("mh-" + s)[:8], 16) for s in ss]
        sigs[d] = [
            min((MH_A[i] * v + MH_B[i]) % MH_P for v in vs)
            for i in range(MINHASH_K)
        ]
    buckets: dict[tuple[int, str], set[int]] = {}
    for d, sig in sigs.items():
        for b in range(MINHASH_BANDS):
            key = "-".join(
                str(sig[b * MINHASH_ROWS + r]) for r in range(MINHASH_ROWS)
            )
            buckets.setdefault((b, _md5(key)), set()).add(d)
    cands = {
        (a, b)
        for members in buckets.values()
        for a in members
        for b in members
        if a < b
    }
    out: dict[tuple[int, int], float] = {}
    for a, b in cands:
        na, nb = len(capped[a]), len(capped[b])
        if na == 0 or nb == 0:  # no sizes row -> inner join drops the pair
            continue
        inter = len(capped[a] & capped[b])
        j = inter / (na + nb - inter)
        if j >= JACCARD_TAU:
            out[(a, b)] = _round6(j)
    return out


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(docs, caps)
def test_minhash_lsh_oracle_matches_reference(
    corpus: list[list[str]], df_cap: int
) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(minhash_lsh_oracle(df_cap=df_cap)).fetchall()
    }
    assert got == _reference(corpus, df_cap)
