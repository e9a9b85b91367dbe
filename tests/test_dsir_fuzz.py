"""Property-based test: the DSIR importance-weight oracle (hashed
bigram features, add-one-smoothed target/source unigram models,
6dp-DECIMAL-exact per-feature log-ratios) must agree with an
independent plain-Python implementation over random small corpora —
single-word docs emitting no row, docs fully outside the target
language, hash-bucket collisions, and an EMPTY target slice (the
tt=0 smoothing edge).

The Spark side is covered by the standing oracle-parity harness; this
guards the other failure mode — both engines encoding the same wrong
formula.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import (
    DSIR_BUCKETS,
    DSIR_SEED,
    DSIR_TARGET_LANG,
    _dsir_oracle_sql,
)

docs = st.lists(
    st.tuples(
        st.lists(st.sampled_from(["p", "q", "r", "s"]), min_size=1, max_size=8),
        st.sampled_from([DSIR_TARGET_LANG, "de", "zh"]),
    ),
    min_size=1,
    max_size=6,
)


def _feature(bg: str) -> int:
    h = hashlib.md5(f"{DSIR_SEED}-{bg}".encode()).hexdigest()
    return int(h[:4], 16) % DSIR_BUCKETS


def _round6d(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)


def _reference(corpus: list[tuple[list[str], str]]) -> dict[int, tuple[int, float]]:
    docfeat: dict[tuple[int, int], int] = {}
    tgt: dict[int, int] = {}
    for doc_id, (ws, lang) in enumerate(corpus):
        for a, b in zip(ws, ws[1:]):
            f = _feature(f"{a} {b}")
            docfeat[(doc_id, f)] = docfeat.get((doc_id, f), 0) + 1
            if lang == DSIR_TARGET_LANG:
                tgt[f] = tgt.get(f, 0) + 1
    src: dict[int, int] = {}
    for (_d, f), k in docfeat.items():
        src[f] = src.get(f, 0) + k
    ts, tt = sum(src.values()), sum(tgt.values())
    lr = {
        f: _round6d(
            math.log(
                ((tgt.get(f, 0) + 1) / (tt + DSIR_BUCKETS))
                / ((cs + 1) / (ts + DSIR_BUCKETS))
            )
        )
        for f, cs in src.items()
    }
    out: dict[int, tuple[int, float]] = {}
    for (doc_id, f), k in docfeat.items():
        n, t = out.get(doc_id, (0, Decimal(0)))
        out[doc_id] = (n + k, t + k * lr[f])
    return {d: (n, float(t)) for d, (n, t) in out.items()}


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(docs)
def test_dsir_oracle_matches_reference(corpus) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, " ".join(ws), lang) for i, (ws, lang) in enumerate(corpus)],
    )
    got = {
        r[0]: (r[1], r[2]) for r in con.execute(_dsir_oracle_sql()).fetchall()
    }
    assert got == _reference(corpus)


# ---------------------------------------------------------------------------
# stage-2 resample fuzz (round-11 advice): the Gumbel-top-K oracle vs
# an independent Python reference.  The weights fuzz above pins stage 1;
# this pins the LN(-LN(u)) key, its 9dp rounding (DuckDB ROUND on
# DOUBLE is half-away-from-zero via round(x*1e9)/1e9 — mirrored below),
# and the (key DESC, doc_id) ranking, so a libm/rounding boundary flip
# at the top-K cut surfaces here before it surfaces as a driver
# hash-mismatch.
# ---------------------------------------------------------------------------


def _round9_away(x: float) -> float:
    """DuckDB ROUND(double, 9): scale, round half away from zero."""
    m = x * 1e9
    r = math.floor(m + 0.5) if m >= 0 else math.ceil(m - 0.5)
    return r / 1e9


def _reference_resample(
    corpus: list[tuple[list[str], str]],
) -> list[tuple[int, int, float, float, int]]:
    from banking_streamprocessing_demos_spark.operators.text import (
        DSIR_GUMBEL_SEED,
        DSIR_SAMPLE_K,
    )

    rows = []
    for doc_id, (n, logw) in _reference(corpus).items():
        u16 = int(
            hashlib.md5(f"{DSIR_GUMBEL_SEED}-{doc_id}".encode()).hexdigest()[:4],
            16,
        )
        u = (u16 + 1) / 65537.0
        key = _round9_away(logw - math.log(-math.log(u)))
        rows.append((doc_id, n, logw, key))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [
        (d, n, w, k, i + 1)
        for i, (d, n, w, k) in enumerate(rows[: DSIR_SAMPLE_K])
    ]


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(docs)
def test_dsir_resample_oracle_matches_reference(corpus) -> None:
    from banking_streamprocessing_demos_spark.operators.text import (
        _dsir_resample_oracle,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, " ".join(ws), lang) for i, (ws, lang) in enumerate(corpus)],
    )
    got = [
        (r[0], r[1], r[2], r[3], r[4])
        for r in con.execute(
            _dsir_resample_oracle() + " ORDER BY rank"
        ).fetchall()
    ]
    assert got == _reference_resample(corpus)
