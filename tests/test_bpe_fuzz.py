"""Property-based test: the generated BPE-fit oracle (DuckDB CTE
stages — the list_reduce greedy fold plus the empty-merge-stage
fallback) must agree with an independent textbook Sennrich
implementation (index-scan merge application, no fold) on arbitrary
small corpora — early merge exhaustion, single-char words, repeated
merges into the same prefix and all.

DuckDB-only on purpose: the Spark fit is separately pinned against
the same textbook reference on the real corpus
(test_llm_ops.py::test_bpe_fit_matches_textbook_reference), and
Spark-per-example would be far too slow for hypothesis; this test
fuzzes the ORACLE side, where the round-6 empty-stage bug actually
lived."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import (
    BPE_MERGES,
    _bpe_encode_oracle,
    _bpe_oracle,
)

# small alphabet forces merge collisions; 1-4 char words hit the
# single-char (no-pair) and early-exhaustion regimes often
words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=4), min_size=1, max_size=12
)


def _textbook_fit(freqs: dict[str, int]) -> tuple[list[tuple], dict[str, list[str]]]:
    toks = {w: list(w) for w in freqs}
    merges: list[tuple] = []
    for rank in range(1, BPE_MERGES + 1):
        counts: dict = {}
        for w, f in freqs.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, c))
        for w, t in toks.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges, toks


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(words)
def test_bpe_oracle_matches_textbook_on_random_corpora(ws: list[str]) -> None:
    text = " ".join(ws)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [text])

    freqs: dict[str, int] = {}
    for w in ws:
        freqs[w] = freqs.get(w, 0) + 1
    expected_merges, toks = _textbook_fit(freqs)

    got_merges = con.execute(
        f"SELECT * FROM ({_bpe_oracle()}) ORDER BY merge_rank"
    ).fetchall()
    assert [tuple(r) for r in got_merges] == expected_merges

    # encode: per-doc word count and subword count under the fitted vocab
    expected_words = len(ws)
    expected_tokens = sum(len(toks[w]) for w in ws)
    got_enc = con.execute(_bpe_encode_oracle()).fetchall()
    assert got_enc == [(0, expected_words, expected_tokens)]
