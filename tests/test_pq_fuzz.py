"""Property-based test: the generated PQ-codebook oracle (DuckDB CTE
k-means stages) must agree with an independent plain-Python Lloyd
implementation on arbitrary small vector corpora.

The reference reimplements the documented trajectory from scratch —
seeded init (round6 unit sub-vectors of vec_id 0..K-1), round6(|c|^2
- 2 s.c) argmin with lowest-code tiebreak, DECIMAL(20,9)-exact mean
sums rounded to 6dp, empty cells keeping their previous centroid —
using explicit left-associative float folds (Python floats ARE IEEE
doubles, so the arithmetic is bit-identical to DuckDB's sequential
list_dot_product on the same values).  Random inputs exercise the
empty-cell COALESCE branch and tiebreaks that the fixed testdata may
never hit.  DuckDB-only on purpose (the Spark side is hash-checked
against this same oracle by the full gate; Spark-per-example would be
too slow for hypothesis)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.pq import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    TRAIN_SEED,
    _codebook_oracle_sql,
)
from banking_streamprocessing_demos_spark.operators.similarity import DIMS

# a corpus of PQ_K..2*PQ_K vectors of small integer-ish components —
# coarse values make centroid collisions and empty cells common
corpora = st.lists(
    st.lists(
        st.integers(min_value=-3, max_value=3).map(lambda i: i / 2 + 0.25),
        min_size=DIMS,
        max_size=DIMS,
    ),
    min_size=PQ_K,
    max_size=2 * PQ_K,
)


def _round6(x: float) -> float:
    # DuckDB ROUND is half-away-from-zero; Python round() is banker's
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _reference_codebook(
    vecs: list[list[float]], ids: set[int] | None = None
) -> dict[tuple[int, int, int], float]:
    # unit-normalize
    units = []
    for v in vecs:
        nrm = _dot(v, v) ** 0.5
        units.append([x / nrm for x in v])
    subs = {
        (i, m): u[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        for i, u in enumerate(units)
        for m in range(PQ_M)
        if ids is None or i in ids
    }
    # seeded init: centroid k of subspace m = round6 sub-vector of vec k
    cb = {
        m: [[_round6(x) for x in subs[(k, m)]] for k in range(PQ_K)]
        for m in range(PQ_M)
    }
    for _ in range(PQ_ITERS):
        # assignment: argmin round6(|c|^2 - 2 s.c), lowest code on ties
        groups: dict[tuple[int, int], list[int]] = {}
        for (i, m), s in subs.items():
            best = min(
                range(PQ_K),
                key=lambda k: (_round6(_dot(cb[m][k], cb[m][k]) - 2 * _dot(s, cb[m][k])), k),
            )
            groups.setdefault((m, best), []).append(i)
        # DECIMAL(20,9)-exact mean, rounded 6dp; empty cells unchanged
        new_cb = {m: [list(c) for c in cb[m]] for m in range(PQ_M)}
        for (m, k), members in groups.items():
            for d in range(PQ_SUBDIM):
                total = sum(
                    Decimal(repr(subs[(i, m)][d])).quantize(
                        Decimal("1e-9"), rounding=ROUND_HALF_UP
                    )
                    for i in members
                )
                new_cb[m][k][d] = _round6(float(total) / len(members))
        cb = new_cb
    return {
        (m, k, d + 1): cb[m][k][d]
        for m in range(PQ_M)
        for k in range(PQ_K)
        for d in range(PQ_SUBDIM)
    }


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(corpora)
def test_pq_codebook_oracle_matches_reference(vecs: list[list[float]]) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", list(enumerate(vecs))
    )
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(_codebook_oracle_sql()).fetchall()
    }
    expected = _reference_codebook(vecs)
    assert got == expected


# ---------------------------------------------------------------------------
# OPQ rotation parity: the oracle's rotation fold must be
# BIT-IDENTICAL to the plain-Python left-associative fold over the
# same literals — the assumption the whole sim_ann_opq oracle chain
# rests on (a single ULP of fold-order divergence would shift a 6dp
# rounding boundary and desync the trained codebooks).
#
# FINDING (round 7, kept as a negative-result pin): DuckDB's
# list_dot_product is NOT bit-identical to the sequential fold on
# arbitrary doubles — it can differ by 1 ULP (FMA/pairwise summation
# internally).  That is why _opq_oracle_sql generates an EXPLICIT
# left-associative a+b+c term chain instead; this test pins both
# facts: the explicit chain matches Python bitwise on random vectors,
# and list_dot_product diverges somewhere (so nobody "simplifies" the
# term chain back).
# ---------------------------------------------------------------------------

unit_vecs = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=64),
    min_size=DIMS,
    max_size=DIMS,
)


@settings(max_examples=fuzz_examples(30), deadline=None)
@given(unit_vecs)
def test_opq_rotation_duckdb_matches_python_fold_bitwise(u) -> None:
    import struct

    from banking_streamprocessing_demos_spark.operators.pq import _OPQ_R

    rows = _OPQ_R[:8]  # 8 rows keep each example fast; any row would do
    con = duckdb.connect()
    rows_sql = ", ".join("[" + ", ".join(repr(x) for x in r) + "]" for r in rows)
    u_sql = "[" + ", ".join(f"'{repr(x)}'::DOUBLE" for x in u) + "]"
    terms = " + ".join(f"row[{i + 1}] * u[{i + 1}]" for i in range(DIMS))
    # u rides in as STRING-cast doubles: DuckDB's numeric-literal
    # parse is not correctly rounded past ~15 significant digits
    # (0.9999999999999999 parses to 1.0 — pinned below), while the
    # string cast '..'::DOUBLE is exact.  The real oracle never hits
    # this (its vectors come from DOUBLE[] table columns and every
    # generated literal is <=9dp), so the string form makes the fuzz
    # exercise the production regime: double column x literal matrix.
    got = con.execute(
        f"SELECT list_transform(CAST([{rows_sql}] AS DOUBLE[][]), row -> {terms}) "
        f"FROM (SELECT {u_sql} AS u)"
    ).fetchone()[0]
    for r, g in zip(rows, got):
        acc = 0.0
        for x, y in zip(r, u):
            acc = acc + x * y
        assert struct.pack("<d", acc) == struct.pack("<d", g), (acc, g)


def test_list_dot_product_divergence_is_bounded() -> None:
    """The counterexample the fuzz found, pinned as a plain test.  This
    pins only the TOLERANCE BOUND (<=4 ULP) on the known-diverging
    input — it does NOT detect DuckDB switching to a sequentially exact
    kernel (exact equality trivially satisfies the bound; round-7
    ADVICE).  The generated oracles therefore keep explicit left-assoc
    term chains regardless of DuckDB's kernel choice."""
    import struct

    from banking_streamprocessing_demos_spark.operators.pq import _OPQ_R

    row = _OPQ_R[6]
    u = [0.0] * 56 + [0.5, -0.3333333333333333, 0.1, 0.7071067811865476,
                      -0.9999999999999999, 0.123456789, -0.987654321, 0.3141592653589793]
    con = duckdb.connect()
    row_sql = "CAST([" + ", ".join(repr(x) for x in row) + "] AS DOUBLE[])"
    u_sql = "CAST([" + ", ".join(repr(x) for x in u) + "] AS DOUBLE[])"
    ldp = con.execute(f"SELECT list_dot_product({row_sql}, {u_sql})").fetchone()[0]
    acc = 0.0
    for x, y in zip(row, u):
        acc = acc + x * y
    seq_bits = struct.pack("<d", acc)
    # documented divergence: equality here is POSSIBLE for lucky
    # inputs, so assert only the tolerance story — within 4 ULP, and
    # record inequality when it holds (no hard assert on inequality:
    # DuckDB may change its kernel)
    assert abs(ldp - acc) <= 4 * abs(acc) * 2.3e-16 + 1e-300


def test_duckdb_numeric_literal_parse_is_not_correctly_rounded() -> None:
    """The round-7 parse gotcha, pinned: DuckDB 1.0 parses the NUMERIC
    literal 0.9999999999999999 to 1.0 (not the nearest double), while
    the STRING cast parses correctly.  Generated oracles must therefore
    keep embedded float literals short (the standing <=9dp rounding) or
    string-cast them; if this test ever fails, DuckDB fixed its parser
    and the constraint can be dropped."""
    con = duckdb.connect()
    numeric, via_string = con.execute(
        "SELECT 0.9999999999999999::DOUBLE, '0.9999999999999999'::DOUBLE"
    ).fetchone()
    assert via_string == 0.9999999999999999  # correctly rounded
    assert numeric == 1.0  # the documented mis-parse


# ---------------------------------------------------------------------------
# Sampled-training selection parity (round 9): the tsel/ssubs CTEs of
# _train_sample_sql must draw EXACTLY the md5-rank top-n UNION the
# init seeds, and the k-means trajectory over that subset must match
# the plain-Python reference restricted to the same ids.  Small n
# forces true subsetting (the fixed-N_TRAIN registered query only
# subsets at sf >= 0.01); n beyond the corpus pins the degenerate
# sample == corpus case.
# ---------------------------------------------------------------------------


def _reference_sample_ids(n_vecs: int, n: int) -> set[int]:
    import hashlib

    ranked = sorted(
        range(n_vecs),
        key=lambda i: (hashlib.md5(f"{TRAIN_SEED}-{i}".encode()).hexdigest(), i),
    )
    return set(ranked[:n]) | set(range(min(PQ_K, n_vecs)))


@settings(max_examples=fuzz_examples(25), deadline=None)
@given(corpora, st.sampled_from([4, PQ_K + 4, 10_000]))
def test_sampled_codebook_oracle_matches_reference(
    vecs: list[list[float]], n: int
) -> None:
    from banking_streamprocessing_demos_spark.operators.pq import (
        _pq_kmeans_sql,
        _pq_vector_prelude_sql,
        _train_sample_sql,
    )

    sql = (
        _pq_vector_prelude_sql()
        + _train_sample_sql(n)
        + _pq_kmeans_sql(PQ_ITERS, "ssubs")
        + f"""
        SELECT CAST(m AS INT), CAST(k AS INT), CAST(dim AS BIGINT), comp
        FROM c{PQ_ITERS}d
        """
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", list(enumerate(vecs)))
    got = {(r[0], r[1], r[2]): r[3] for r in con.execute(sql).fetchall()}
    ids = _reference_sample_ids(len(vecs), n)
    # the oracle's tsel CTE must equal the reference draw exactly
    tsel = {
        r[0]
        for r in con.execute(
            _pq_vector_prelude_sql() + _train_sample_sql(n) + " SELECT vec_id FROM tsel"
        ).fetchall()
    }
    assert tsel == ids
    assert got == _reference_codebook(vecs, ids=ids)


# ---------------------------------------------------------------------------
# BQ parity fuzz (round 9): the binary-quantization oracle's
# exactly-specified stages — unit normalization (IEEE sqrt/div are
# correctly rounded, so bit-deterministic), MSB-first sign packing,
# and the asymmetric prescreen's explicit left-associative ±u chain —
# must match a from-scratch plain-Python reference on random corpora.
# The rerank tail is EXCLUDED on purpose: it rides list_dot_product,
# whose 1-ULP fold divergence is the documented accepted risk class
# (test_list_dot_product_divergence_is_bounded); the stages checked
# here are the ones with no such caveat.
# ---------------------------------------------------------------------------

bq_corpora = st.lists(
    st.lists(
        # dyadic components (k/4, some zero/negative) keep dots exact
        # while signs and magnitudes vary; sqrt/div of exact dots are
        # IEEE-correctly-rounded, hence bit-identical across engines
        st.integers(min_value=-4, max_value=4).map(lambda i: i / 4),
        min_size=DIMS,
        max_size=DIMS,
    ).filter(lambda v: any(x != 0 for x in v)),
    min_size=6,
    max_size=12,
)


def _bq_reference(vecs: list[list[float]]):
    import math

    from banking_streamprocessing_demos_spark.operators.pq import BQ_WORD
    from banking_streamprocessing_demos_spark.operators.similarity import N_QUERIES

    units = []
    for v in vecs:
        nrm = math.sqrt(_dot(v, v))
        units.append([x / nrm for x in v])

    def pack(sl: list[float]) -> int:
        acc = 0
        for x in sl:
            acc = acc * 2 + (1 if x > 0 else 0)
        return acc

    codes = {
        i: (pack(u[:BQ_WORD]), pack(u[BQ_WORD:])) for i, u in enumerate(units)
    }
    scored = {}
    for qid in range(min(N_QUERIES, len(vecs))):
        qu = units[qid]
        for nid, (lo, hi) in codes.items():
            if nid == qid:
                continue
            acc = 0.0
            for d in range(2 * BQ_WORD):
                word, bit = (lo, BQ_WORD - 1 - d) if d < BQ_WORD else (
                    hi,
                    2 * BQ_WORD - 1 - d,
                )
                s = qu[d] if (word >> bit) & 1 else -qu[d]
                acc = acc + s
            scored[(qid, nid)] = _round6(acc)
    return codes, scored


@settings(max_examples=fuzz_examples(40), deadline=None)
@given(bq_corpora)
def test_bq_codes_and_asym_scores_match_reference(vecs: list[list[float]]) -> None:
    from banking_streamprocessing_demos_spark.operators.pq import _bq_prelude_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", list(enumerate(vecs)))
    ref_codes, ref_scored = _bq_reference(vecs)
    got_codes = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "WITH " + _bq_prelude_sql() + " SELECT vec_id, lo, hi FROM codes"
        ).fetchall()
    }
    assert got_codes == ref_codes
    got_scored = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            "WITH " + _bq_prelude_sql()
            + " SELECT query_id, neighbor_id, adc_score FROM scored"
        ).fetchall()
    }
    assert got_scored == ref_scored
