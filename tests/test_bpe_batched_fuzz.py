"""Property-based test for the BATCHED BPE fit oracle: the generated
per-round CTE chain (rank -> window anti-join acceptance -> ONE
multi-rule list_reduce fold) must agree with an independent plain-
Python implementation of the same batched semantics on arbitrary
small corpora.

The reference applies each round's accepted rules with a FOLD (last
output token + next input token), not an index scan over the original
tokens: the fold CASCADES — a token just created by rule 1 can
immediately be the left side of rule 2 within the same pass — and
both engines' folds share that behavior by construction, so the
reference must too.

DuckDB-only on purpose (the test_bpe_fuzz rationale): the Spark side
is hash-checked against the identical oracle by the driver gate; this
fuzzes the generated SQL, where fold/acceptance bugs would live."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import (
    BPE_BATCH_ROUNDS,
    BPE_BATCH_WINDOW,
    _batch_accept,
    _bpe_batched_oracle,
)

words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=4), min_size=1, max_size=12
)


def _batched_reference(
    freqs: dict[str, int],
    rounds: int = BPE_BATCH_ROUNDS,
    w: int = BPE_BATCH_WINDOW,
) -> tuple[list[tuple], dict[str, list[str]]]:
    toks = {word: list(word) for word in freqs}
    out: list[tuple] = []
    for rnd in range(1, rounds + 1):
        counts: dict = {}
        for word, f in freqs.items():
            t = toks[word]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + f
        if not counts:
            break
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:w]
        accepted = _batch_accept([(a, b, c) for (a, b), c in ranked])
        out.extend((rnd, rn, a, b, a + b, c) for rn, a, b, c in accepted)
        by_b = {b: (a, a + b) for _rn, a, b, _c in accepted}
        for word, t in toks.items():
            acc = [t[0]]
            for x in t[1:]:
                r = by_b.get(x)
                if r is not None and acc[-1] == r[0]:
                    acc[-1] = r[1]  # cascade: merged token stays live
                else:
                    acc.append(x)
            toks[word] = acc
    return out, toks


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(words)
def test_bpe_batched_oracle_matches_reference(ws: list[str]) -> None:
    text = " ".join(ws)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [text])

    freqs: dict[str, int] = {}
    for w in ws:
        freqs[w] = freqs.get(w, 0) + 1
    expected, _toks = _batched_reference(freqs)

    got = con.execute(
        f"SELECT * FROM ({_bpe_batched_oracle()}) ORDER BY round, merge_rank"
    ).fetchall()
    assert [tuple(r) for r in got] == expected

    # structural invariants of every batch: token-disjoint within a
    # round, and the round's rank-1 pair always accepted
    by_round: dict[int, list] = {}
    for rnd, rn, a, b, _m, _c in expected:
        by_round.setdefault(rnd, []).append((rn, a, b))
    for rnd, rows in by_round.items():
        assert rows[0][0] == 1, f"round {rnd} rank-1 pair not accepted"
        seen: set[str] = set()
        for _rn, a, b, in rows:
            assert a not in seen and b not in seen, f"round {rnd} overlap"
            seen.update((a, b))
