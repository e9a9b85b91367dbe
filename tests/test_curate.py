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


def test_offsets_are_exact_prefix_sums(curated):
    """start_offset must equal the running sum of n_tokens in
    (tier, doc_id) order — the curriculum contract; spans/copies are
    exact integer arithmetic."""
    rows = sorted(curated, key=lambda r: (r["tier"], r["doc_id"]))
    run = 0
    for r in rows:
        assert r["start_offset"] == run, (r["doc_id"], r["start_offset"], run)
        run += r["n_tokens"]
        assert r["n_seqs"] == r["end_seq"] - r["start_seq"] + 1
        assert r["planned_tokens"] == r["n_copies"] * r["n_tokens"]


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
