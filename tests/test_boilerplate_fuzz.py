"""Property-based test: the boilerplate-strip oracle (the shared
BP_SEG_SQL segmentation + inventory CTEs and the reassembly tail)
must agree with an independent plain-Python implementation of the
documented semantics on arbitrary small corpora — short-tail
segments, all-boilerplate documents, single-word docs and all.

DuckDB-only on purpose: the Spark side shares its expressions with
the streaming twin and is hash-checked against this same oracle by
the full gate; this fuzzes the generated SQL against an independent
reimplementation, the same treatment as the BPE and PQ oracles."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import (
    BP_MIN_DOCS,
    BP_SEG_WORDS,
    REG,
)

# 2-6 docs of 1-14 words over a 3-word vocabulary: repeated segments
# (and therefore inventory hits) are common, tails are short
docs = st.lists(
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=14),
    min_size=2,
    max_size=6,
)


def _reference_strip(corpus: list[list[str]]) -> dict[int, tuple[int, int, str]]:
    segs: dict[int, list[str]] = {}
    for doc_id, words in enumerate(corpus):
        segs[doc_id] = [
            " ".join(words[i : i + BP_SEG_WORDS])
            for i in range(0, len(words), BP_SEG_WORDS)
        ]
    by_seg: dict[str, set[int]] = {}
    for doc_id, ss in segs.items():
        for s in ss:
            by_seg.setdefault(s, set()).add(doc_id)
    boiler = {s for s, ids in by_seg.items() if len(ids) >= BP_MIN_DOCS}
    out: dict[int, tuple[int, int, str]] = {}
    for doc_id, ss in segs.items():
        kept = [s for s in ss if s not in boiler]
        out[doc_id] = (len(ss), len(ss) - len(kept), " ".join(kept))
    return out


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(docs)
def test_boilerplate_oracle_matches_reference(corpus: list[list[str]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    sql = REG.queries["text_boilerplate_strip"].oracle
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(sql).fetchall()
    }
    assert got == _reference_strip(corpus)
