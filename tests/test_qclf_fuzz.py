"""Property-based test: the learned-quality-classifier oracle (weak
Gopher labels on a seeded sample, per-class add-one-smoothed hashed
bigram models, 6dp-DECIMAL weight vector + prior-log-odds bias, exact
DECIMAL margin) must agree with an independent plain-Python
implementation over random small corpora — all-pass samples (nn=0),
all-fail samples (np=0, tp=0), single-word docs emitting no row, and
hash-bucket collisions.

The Spark side is covered by the standing oracle-parity harness; this
guards the other failure mode — both engines encoding the same wrong
formula (the test_dsir_fuzz pattern, round-11 VERDICT "Next round" #1).
"""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.operators.text import (
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_RATIO,
    GOPHER_MIN_MEAN_WLEN,
    GOPHER_MAX_MEAN_WLEN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    QCLF_BUCKETS,
    QCLF_SAMPLE_N,
    QCLF_SAMPLE_SEED,
    QCLF_SEED,
    STOPWORDS,
    _qclf_oracle_sql,
)

# word pool sized so some generated docs PASS the Gopher battery
# (>= 30 words incl. stopwords, mostly alphabetic) and some fail each
# rule — both label classes and the degenerate one-class samples occur
WORDS = st.sampled_from(["the", "and", "of", "ppp", "qqq", "rrrr", "s", "###"])
docs = st.lists(
    st.lists(WORDS, min_size=1, max_size=40), min_size=1, max_size=6
)


def _round6d(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)


def _feature(bg: str) -> int:
    h = hashlib.md5(f"{QCLF_SEED}-{bg}".encode()).hexdigest()
    return int(h[:4], 16) % QCLF_BUCKETS


def _gopher_pass(ws: list[str]) -> bool:
    text = " ".join(ws)
    spaces = text.count(" ")
    wc = spaces + 1
    chars = len(text) - spaces
    mean_wlen = chars / wc
    sym = (text.count("#") + text.count("...")) / wc
    alpha = sum(1 for w in ws if re.search("[a-z]", w)) / wc
    stop = sum(1 for w in ws if w in STOPWORDS)
    return (
        GOPHER_MIN_WORDS <= wc <= GOPHER_MAX_WORDS
        and GOPHER_MIN_MEAN_WLEN <= mean_wlen <= GOPHER_MAX_MEAN_WLEN
        and sym <= GOPHER_MAX_SYMBOL_RATIO
        and alpha >= GOPHER_MIN_ALPHA_RATIO
        and stop >= GOPHER_MIN_STOPWORDS
    )


def _reference(corpus: list[list[str]]) -> dict[int, tuple[int, float, bool]]:
    labels = {d: _gopher_pass(ws) for d, ws in enumerate(corpus)}
    by_hash = sorted(
        labels,
        key=lambda d: (hashlib.md5(f"{QCLF_SAMPLE_SEED}-{d}".encode()).hexdigest(), d),
    )
    samp = set(by_hash[:QCLF_SAMPLE_N])
    docfeat: dict[tuple[int, int], int] = {}
    cp: dict[int, int] = {}
    cn: dict[int, int] = {}
    for d, ws in enumerate(corpus):
        for a, b in zip(ws, ws[1:]):
            f = _feature(f"{a} {b}")
            docfeat[(d, f)] = docfeat.get((d, f), 0) + 1
            if d in samp:
                (cp if labels[d] else cn)[f] = (cp if labels[d] else cn).get(f, 0) + 1
    tp, tn = sum(cp.values()), sum(cn.values())
    np_, nn = sum(labels[d] for d in samp), sum(not labels[d] for d in samp)
    w = {
        f: _round6d(
            math.log((cp.get(f, 0) + 1) / (tp + QCLF_BUCKETS))
            - math.log((cn.get(f, 0) + 1) / (tn + QCLF_BUCKETS))
        )
        for f in {f for _d, f in docfeat}
    }
    b = _round6d(math.log((np_ + 1) / (nn + 1)))
    out: dict[int, tuple[int, Decimal]] = {}
    for (d, f), k in docfeat.items():
        n, t = out.get(d, (0, Decimal(0)))
        out[d] = (n + k, t + k * w[f])
    return {d: (n, float(b + t), (b + t) > 0) for d, (n, t) in out.items()}


@settings(max_examples=fuzz_examples(50), deadline=None)
@given(docs)
def test_qclf_oracle_matches_reference(corpus) -> None:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_qclf_oracle_sql()).fetchall()
    }
    assert got == _reference(corpus)


def test_qclf_both_label_classes_reachable() -> None:
    """The word pool must actually produce both classes (otherwise the
    fuzz never exercises a two-class fit)."""
    passing = ["the", "and", "ppp", "qqq", "rrrr"] * 6  # 30 words, stopwords, alpha
    failing = ["###"]
    assert _gopher_pass(passing)
    assert not _gopher_pass(failing)
