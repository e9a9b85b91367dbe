"""Lexical retrieval family: BM25 ranking + reciprocal-rank fusion.

The driver's DuckDB hash gate holds the full numeric parity; these
tests pin the retrieval SEMANTICS (matching, saturation, fusion
arithmetic) and the scale-shaped plan.
"""

from __future__ import annotations

import math

from banking_streamprocessing_demos_spark.operators.retrieval import (
    BM25_QUERY,
    BM25_TOPN,
    RRF_DEPTH,
    RRF_K,
    RRF_TOPN,
    _bm25_scored,
    _global_topn,
    rank_fusion_rrf,
    text_bm25_search,
)
from banking_streamprocessing_demos_spark.plans.explain import (
    assert_no_cartesian,
    count_shuffles,
    formatted_plan,
)
from pyspark.sql import functions as F
from tests.conftest import SF_SMALL
from conftest import fuzz_examples


def test_bm25_output_contract(spark):
    rows = text_bm25_search(spark, SF_SMALL).collect()
    assert len(rows) == BM25_TOPN
    # ranks are 1..N and scores descend with doc_id tiebreak
    assert [r["rank"] for r in rows] == sorted(r["rank"] for r in rows)
    ordered = sorted(rows, key=lambda r: r["rank"])
    for a, b in zip(ordered, ordered[1:]):
        assert (a["bm25"], -a["doc_id"]) >= (b["bm25"], -b["doc_id"])
    for r in rows:
        assert 1 <= r["n_terms"] <= len(BM25_QUERY)


def test_bm25_only_matching_docs_are_scored(spark):
    """Every scored doc contains at least one query term, and every doc
    containing a query term is scored — the term filter prunes, never
    drops."""
    scored = {r["doc_id"] for r in _bm25_scored(spark, SF_SMALL).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text").collect()
    expect = {
        r["doc_id"] for r in docs if set(r["text"].split(" ")) & set(BM25_QUERY)
    }
    assert scored == expect


def test_bm25_score_matches_reference_formula(spark):
    """Recompute one returned document's score from first principles
    (pure Python over the raw parquet) — the Okapi/Lucene formula with
    6dp-rounded per-term contributions."""
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for toks in docs.values() if q in toks) for q in BM25_QUERY
    }
    top = sorted(text_bm25_search(spark, SF_SMALL).collect(), key=lambda r: r["rank"])
    for r in top[:3]:
        toks = docs[r["doc_id"]]
        dl = len(toks)
        want = 0.0
        for q in BM25_QUERY:
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            want += round(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
        assert abs(r["bm25"] - want) < 1e-9, (r["doc_id"], r["bm25"], want)


def test_bm25_tf_saturation_vs_tfidf_linearity(spark):
    """The property BM25 adds over TF-IDF: the per-term contribution is
    bounded by idf (as tf -> inf), while TF-IDF grows linearly — so no
    single doc's BM25 can exceed sum(idf) no matter how spammy."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    scored = _bm25_scored(spark, SF_SMALL)
    max_seen = scored.agg(F.max("bm25")).collect()[0][0]
    # loosest possible bound: every df >= 1
    idf_cap = len(BM25_QUERY) * math.log(1 + (docs - 1 + 0.5) / 1.5)
    assert max_seen < idf_cap


def test_rrf_arithmetic_reconciles_sources(spark):
    """Every fused score equals the sum of round6(1/(K+rank)) over the
    source rankings the doc appears in — BOTH sources recomputed
    independently from the raw parquet, full equality per row (the
    first cut only lower-bounded both-source docs against the bm25
    share, which a doubled contribution would have passed)."""
    from decimal import ROUND_HALF_UP, Decimal

    bm25_rank = {
        r["doc_id"]: r["rank"]
        for r in _global_topn(_bm25_scored(spark, SF_SMALL), "bm25", RRF_DEPTH).collect()
    }
    # independent tfidf ranking: linear tf * smoothed idf over query terms
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n = len(docs)
    df = {q: sum(1 for t in docs.values() if q in t) for q in BM25_QUERY}
    tfidf = {}
    for d, toks in docs.items():
        s = Decimal(0)
        matched = False
        for q in BM25_QUERY:
            tf = toks.count(q)
            if tf:
                matched = True
                s += Decimal(
                    str(round(tf * math.log((n + 1.0) / (df[q] + 1.0)), 6))
                )
        if matched:
            tfidf[d] = s
    tfidf_rank = {
        d: i + 1
        for i, d in enumerate(
            sorted(tfidf, key=lambda d: (-tfidf[d], d))[:RRF_DEPTH]
        )
    }
    six = Decimal("0.000001")
    fused = rank_fusion_rrf(spark, SF_SMALL).collect()
    assert len(fused) == RRF_TOPN
    for r in fused:
        want = Decimal(0)
        n_src = 0
        for src in (bm25_rank, tfidf_rank):
            if r["doc_id"] in src:
                n_src += 1
                want += (Decimal(1) / (RRF_K + src[r["doc_id"]])).quantize(
                    six, rounding=ROUND_HALF_UP
                )
        assert r["n_sources"] == n_src, (r["doc_id"], r["n_sources"], n_src)
        assert Decimal(str(r["rrf_score"])) == want, (r["doc_id"], r["rrf_score"], want)


def test_rrf_both_source_docs_beat_tail_singletons(spark):
    """A doc ranked top-3 by BOTH sources must outscore any doc that
    appears in only one source at rank >= 7: 2/(K+3) > 1/(K+7) for
    K=60 — the fusion actually fuses."""
    fused = rank_fusion_rrf(spark, SF_SMALL).collect()
    doubles = [r for r in fused if r["n_sources"] == 2]
    singles = [r for r in fused if r["n_sources"] == 1]
    if doubles and singles:
        assert max(r["rrf_score"] for r in doubles) > min(
            r["rrf_score"] for r in singles
        )


def test_bm25_plan_shape(spark):
    """Scale contract: the global top-N is TakeOrderedAndProject (the
    distributed partial-top-N plan), never a corpus-wide single-
    partition sort window; stats/df sides broadcast; no cartesian."""
    df = text_bm25_search(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert count_shuffles(df) <= 5, plan[:2000]


def test_rrf_plan_shape(spark):
    df = rank_fusion_rrf(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # two source rankings + fusion agg + bounded rank windows
    assert count_shuffles(df) <= 10, plan[:2000]


# ---------------------------------------------------------------------------
# MMR diversification (rank_mmr_diversify)
# ---------------------------------------------------------------------------


def test_mmr_output_contract(spark):
    from banking_streamprocessing_demos_spark.operators.retrieval import (
        MMR_K,
        rank_mmr_diversify,
    )

    rows = sorted(rank_mmr_diversify(spark, SF_SMALL).collect(), key=lambda r: r["mmr_rank"])
    assert [r["mmr_rank"] for r in rows] == list(range(1, MMR_K + 1))
    assert len({r["doc_id"] for r in rows}) == MMR_K
    # first pick is the relevance argmax with zero diversity penalty
    assert rows[0]["max_sim_prior"] == 0.0
    top_bm25 = sorted(text_bm25_search(spark, SF_SMALL).collect(), key=lambda r: r["rank"])
    assert rows[0]["doc_id"] == top_bm25[0]["doc_id"]


def test_mmr_score_arithmetic_and_monotonicity(spark):
    """Each emitted score equals round6(lambda*bm25 - (1-lambda)*
    max_sim_prior) exactly, and the picked-score sequence is monotone
    non-increasing (each pick maximizes over a set whose scores only
    shrink as the selected set grows)."""
    from decimal import ROUND_HALF_UP, Decimal

    from banking_streamprocessing_demos_spark.operators.retrieval import (
        MMR_LAMBDA,
        rank_mmr_diversify,
    )

    rows = sorted(rank_mmr_diversify(spark, SF_SMALL).collect(), key=lambda r: r["mmr_rank"])
    six = Decimal("0.000001")
    lam = Decimal(MMR_LAMBDA)
    pen = Decimal(1) - lam
    for r in rows:
        want = (lam * Decimal(str(r["bm25"])) - pen * Decimal(str(r["max_sim_prior"]))).quantize(
            six, rounding=ROUND_HALF_UP
        )
        assert Decimal(str(r["mmr_score"])) == want, (r["doc_id"], r["mmr_score"], want)
    scores = [r["mmr_score"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores


def test_mmr_actually_diversifies_on_planted_neardups(spark, tmp_path):
    """Plant a pool where the top relevance scores are near-duplicate
    texts: pure BM25 ranks the clones adjacent, MMR must separate them
    (the second clone cannot be picked second)."""
    import os

    sf = str(tmp_path / "mmr")
    os.makedirs(sf, exist_ok=True)
    # two identical top-relevance docs + close-relevance alternatives:
    # the clone's step-2 score is 0.7*0.392 - 0.3*1.0 = -0.026 while a
    # 2-of-3-term doc scores 0.7*0.262 - 0.3*0.5 = +0.033 — the penalty
    # outweighs the relevance gap ONLY because the gap is small (with a
    # dominant clone, lambda=0.7 MMR correctly keeps it: the first cut
    # of this test planted a 3x relevance gap and rightly failed)
    docs = [
        (0, "hash join window"),
        (1, "hash join window"),
        (2, "hash join a.b"),
        (3, "hash window x7"),
        (4, "join window g"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source", "length(text) AS n_chars"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    from banking_streamprocessing_demos_spark.operators.retrieval import (
        rank_mmr_diversify,
        text_bm25_search,
    )

    bm25 = sorted(text_bm25_search(spark, sf).collect(), key=lambda r: r["rank"])
    assert {bm25[0]["doc_id"], bm25[1]["doc_id"]} == {0, 1}  # clones rank 1-2
    mmr = sorted(rank_mmr_diversify(spark, sf).collect(), key=lambda r: r["mmr_rank"])
    assert mmr[0]["doc_id"] == 0
    assert mmr[1]["doc_id"] != 1  # the clone is pushed down by its Jaccard-1 penalty
    assert mmr[1]["max_sim_prior"] < 1.0


# ---------------------------------------------------------------------------
# BM25 oracle parity fuzz (round 9, DuckDB-only like test_pq_fuzz):
# the generated BM25_SQL must agree with a from-scratch plain-Python
# scorer on random adversarial corpora — tf repetition, 0..3 matching
# terms, length spread, and rank ties broken by doc_id.
# ---------------------------------------------------------------------------


def test_bm25_oracle_matches_python_reference_on_random_corpora():
    import duckdb
    from decimal import ROUND_HALF_UP, Decimal
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from banking_streamprocessing_demos_spark.operators.retrieval import BM25_SQL

    tokens = ["hash", "join", "window", "g", "x7", "a.b"]
    corpora = st.lists(
        st.lists(st.sampled_from(tokens), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )

    six = Decimal("0.000001")

    @settings(max_examples=fuzz_examples(40), deadline=None)
    @given(corpora)
    def run(corpus):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        )
        got = {
            r[0]: (r[1], r[2], r[3]) for r in con.execute(BM25_SQL).fetchall()
        }
        # reference
        n = len(corpus)
        avgdl = sum(len(ws) for ws in corpus) / n
        df = {
            q: sum(1 for ws in corpus if q in ws)
            for q in ("hash", "join", "window")
        }
        scored = {}
        for d, ws in enumerate(corpus):
            total, n_terms = Decimal(0), 0
            for q in ("hash", "join", "window"):
                tf = ws.count(q)
                if tf:
                    n_terms += 1
                    idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
                    c = idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avgdl))
                    total += Decimal(repr(c)).quantize(six, rounding=ROUND_HALF_UP)
            if n_terms:
                scored[d] = (float(total), n_terms)
        top = sorted(scored, key=lambda d: (-scored[d][0], d))[:10]
        expected = {
            d: (scored[d][0], scored[d][1], i + 1) for i, d in enumerate(top)
        }
        assert got == expected, (got, expected)

    run()
