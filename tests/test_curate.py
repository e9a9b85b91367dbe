"""pipe_curate_end_to_end — composition semantics beyond the hash gate:
the composed DAG must agree with its standalone component operators
stage by stage (the drift the oracle can't localize)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def curated(spark):
    from banking_streamprocessing_demos_spark.operators.curate import (
        pipe_curate_end_to_end,
    )

    return pipe_curate_end_to_end(spark, SF_SMALL).collect()


def test_survivors_are_gated_canonical_reps(spark, curated):
    """Every output doc passed the standalone gate, and no two
    survivors are near-duplicates of each other at the dedup tau (the
    keep-best stage must leave one representative per cluster)."""
    from banking_streamprocessing_demos_spark.operators.text import pipe_quality_gate

    passed = {
        r["doc_id"] for r in pipe_quality_gate(spark, SF_SMALL).collect() if r["passed"]
    }
    out_ids = {r["doc_id"] for r in curated}
    assert out_ids <= passed
    assert out_ids, "composition produced no survivors"


def test_no_near_duplicate_pair_survives(spark, curated):
    """Among survivors, the exact-Jaccard pair graph at JACCARD_TAU must
    be empty — both endpoints of any near-dup pair can't be kept."""
    from pyspark.sql import functions as F

    from banking_streamprocessing_demos_spark.operators.dedup import (
        JACCARD_TAU,
        NGRAM_N,
        _grams_expr,
        _kept_shingles,
        _pair_jaccard,
    )
    from banking_streamprocessing_demos_spark.sources.tables import load_table

    out_ids = {r["doc_id"] for r in curated}
    docs = (
        load_table(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id").isin(list(out_ids)))
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= NGRAM_N)
    )
    shingles = docs.select("doc_id", F.explode(_grams_expr()).alias("s"))
    pairs = _pair_jaccard(_kept_shingles(shingles)).filter(
        F.col("jaccard_raw") >= JACCARD_TAU
    )
    assert pairs.count() == 0


def _per_doc(curated):
    """One row per doc (the round-8 sample fan-out repeats the per-doc
    plan columns on every sample row; they must agree across samples)."""
    by_doc = {}
    for r in curated:
        prev = by_doc.setdefault(r["doc_id"], r)
        for col in (
            "source", "domain", "tier", "n_tokens", "start_offset",
            "start_seq", "end_seq", "n_seqs", "repeat_factor",
            "n_copies", "planned_tokens",
        ):
            assert prev[col] == r[col], (r["doc_id"], col)
    return list(by_doc.values())


def test_offsets_are_exact_prefix_sums(curated):
    """start_offset must be consistent with the running sum of n_tokens
    in (tier, doc_id) order — the curriculum contract.  Since round 8
    the output is the SAMPLE manifest: docs planned at n_copies = 0
    hold curriculum offsets but emit no sample rows, so the observed
    offsets may jump forward by exactly the missing docs' tokens (never
    backward, never overlap); exact equality over the full doc set is
    pinned by the hash-checked oracle.  Spans/copies are exact integer
    arithmetic."""
    rows = sorted(_per_doc(curated), key=lambda r: (r["tier"], r["doc_id"]))
    run = 0
    for r in rows:
        assert r["start_offset"] >= run, (r["doc_id"], r["start_offset"], run)
        run = r["start_offset"] + r["n_tokens"]
        assert r["n_seqs"] == r["end_seq"] - r["start_seq"] + 1
        assert r["planned_tokens"] == r["n_copies"] * r["n_tokens"]
    # no anchor check on the first visible offset: a doc planned at 0
    # copies may legitimately hold offsets before it, and EXACT offsets
    # over the full doc set are pinned by the hash-checked oracle


def test_sample_manifest_shape(curated):
    """Round-8 sample materialization: per doc exactly n_copies x mult
    sample rows (mult from the standalone domain-mix policy), sample
    ids unique, and positions within each shard dense from 1."""
    from banking_streamprocessing_demos_spark.operators.packing import (
        N_SHARDS,
        PIPE_MIX,
    )
    import hashlib

    def u16(doc_id: int) -> int:
        return int(hashlib.md5(f"mix-{doc_id}".encode()).hexdigest()[:4], 16)

    def mult(doc_id: int, domain: str) -> int:
        w = PIPE_MIX.get(domain, 1.0)
        base = int(w)
        thr = int(round((w - base) * 65536))
        return base + (1 if thr and u16(doc_id) < thr else 0)

    per_doc = {}
    for r in curated:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        expected = rows[0]["n_copies"] * mult(doc_id, rows[0]["domain"])
        assert len(rows) == expected, (doc_id, len(rows), expected)
        assert {(r["epoch_copy"], r["replica"]) for r in rows} == {
            (c, k)
            for c in range(1, rows[0]["n_copies"] + 1)
            for k in range(1, mult(doc_id, rows[0]["domain"]) + 1)
        }

    ids = [r["sample_id"] for r in curated]
    assert len(ids) == len(set(ids)), "sample ids must be unique"
    by_shard = {}
    for r in curated:
        assert 0 <= r["shard_id"] < N_SHARDS
        by_shard.setdefault(r["shard_id"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_epoch_plan_bounds(curated):
    """Repeat factors obey the budget: 0 < r <= MAX_EPOCHS, and copy
    counts sit in {floor(r), floor(r)+1}."""
    import math

    from banking_streamprocessing_demos_spark.operators.packing import MAX_EPOCHS

    for r in curated:
        assert 0 < r["repeat_factor"] <= MAX_EPOCHS
        lo = math.floor(r["repeat_factor"])
        assert r["n_copies"] in (lo, lo + 1), r


def test_bpe_token_counts_at_least_word_counts(spark, curated):
    """BPE metering: each NONEMPTY whitespace word encodes to >= 1
    subword token, so a doc's BPE token count is >= its nonempty word
    count.  (Counted over nonempty split tokens, not spaces+1: the
    encode joins only length>0 words, so text with doubled/leading
    whitespace would make a spaces+1 bound spuriously strict.)"""
    from pyspark.sql import functions as F

    from banking_streamprocessing_demos_spark.sources.tables import load_table

    nonempty = F.size(F.filter(F.split("text", " "), lambda w: F.length(w) > 0))
    wc = {
        r["doc_id"]: r["wc"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", nonempty.alias("wc"))
        .collect()
    }
    for r in curated:
        assert r["n_tokens"] >= wc[r["doc_id"]], r
