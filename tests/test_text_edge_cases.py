"""Differential edge-case corpus: the text/dedup/multimodal operators
must agree with their oracles (same normalization as the driver gate)
on pathological documents — empty text, single word, repeated words,
whitespace runs — not just the generated corpus.  NULL text is excluded
by contract (documents.text is NOT NULL in the testdata; the generators
never produce it) but empty-after-split shapes are covered."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

EDGE_DOCS = [
    (0, "", "en", "edge", 0),
    (1, "one", "en", "edge", 3),
    (2, "a a a a a a", "en", "edge", 11),
    (3, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
    (4, "the quick brown fox jumps over the lazy cat", "en", "edge", 43),
    (5, "x y", "de", "edge", 3),
    (6, "one two three four five six seven eight nine ten", "es", "edge", 48),
    (7, "one two three four five six seven eight nine zen", "es", "edge", 48),
]

# text/dedup queries that read ONLY the documents table
DOC_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "text_stats_quality",
    "text_langid",
    "text_token_counts",
    "text_fingerprint",
    "text_tfidf_topk",
    "text_repetition",
    "text_pii_scrub",
    "pipe_curation",
    "smp3_stratified_split",
    "pack_sequences",
    "contamination_check",
]


def _normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(v).lower())
            elif v is None:
                vals.append("\0null")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, edge_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet/*.parquet'"
    )
    rel = con.execute(oracles[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert _normalize(srows, sdf.columns) == _normalize(orows, ocols), f"{name}: values"


def test_bigram_lm_score_bounds(spark):
    """avg log P(w2|w1) is always <= 0 (probabilities never exceed 1),
    exactly 0 only when every bigram deterministically follows its left
    word; n_bigrams must equal word_count - 1 per doc."""
    from banking_streamprocessing_demos_spark.operators.text import text_bigram_lm_score, text_stats
    from tests.conftest import SF_SMALL

    scores = {r.doc_id: r for r in text_bigram_lm_score(spark, SF_SMALL).collect()}
    words = {r.doc_id: r.word_count for r in text_stats(spark, SF_SMALL).collect()}
    assert scores
    for doc_id, r in scores.items():
        assert r.avg_logprob <= 0.0, (doc_id, r.avg_logprob)
        assert r.n_bigrams == words[doc_id] - 1, (doc_id, r.n_bigrams, words[doc_id])


def test_chunk_tiling_properties_fuzz(spark, tmp_path):
    """Property fuzz over document lengths 1..130: chunks must tile the
    document exactly (every token covered, order preserved under the
    stride), never exceed CHUNK_TOKENS, start at multiples of the
    stride, and obey the tail rules.  One Spark job for all lengths."""
    from banking_streamprocessing_demos_spark.operators.text import (
        CHUNK_MIN_TAIL,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunk_overlap,
    )

    lengths = list(range(1, 131))
    rows = [
        (n, " ".join(f"d{n}w{i}" for i in range(n)))
        for n in lengths
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source", "length(text) AS n_chars"
    ).write.parquet(sf + "/documents.parquet")
    out = doc_chunk_overlap(spark, sf).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n in lengths:
        words = [f"d{n}w{i}" for i in range(n)]
        chunks = sorted(by_doc[n], key=lambda r: r.chunk_idx)
        assert chunks, n
        covered = set()
        for r in chunks:
            start = r.chunk_idx * CHUNK_STRIDE
            toks = r.chunk_text.split(" ")
            assert 1 <= r.n_tokens <= CHUNK_TOKENS
            assert r.n_tokens == len(toks)
            assert r.n_tokens >= CHUNK_MIN_TAIL or r.chunk_idx == 0
            assert toks == words[start : start + len(toks)], (n, r.chunk_idx)
            covered.update(range(start, start + len(toks)))
        # every token of every doc appears in at least one SURVIVING
        # chunk... except tokens only reachable via a dropped short tail
        dropped_tail_tokens = set(range(n)) - covered
        if dropped_tail_tokens:
            # dropped tokens must all sit inside the final (dropped)
            # sub-CHUNK_MIN_TAIL tail window and be covered by NO earlier
            # chunk only when the doc is longer than one chunk
            assert min(dropped_tail_tokens) >= n - (CHUNK_MIN_TAIL - 1), (n, dropped_tail_tokens)
        else:
            assert covered == set(range(n))


def test_boilerplate_segment_reassembly_identity(spark, tmp_path):
    """Property: when no segment crosses the boilerplate threshold, the
    cleaned text is the ORIGINAL text — segmentation followed by
    in-order reassembly is the identity, including for docs whose tail
    segment is shorter than BP_SEG_WORDS and for single-word docs."""
    from banking_streamprocessing_demos_spark.operators.text import (
        text_boilerplate_strip,
    )

    texts = [
        "one",
        "one two",
        "one two three four",  # exactly one full segment
        "one two three four five",  # full segment + 1-word tail
        " ".join(f"u{i}" for i in range(23)),  # several segments + 3-word tail
        " ".join(f"v{i}" for i in range(24)),  # exact multiple of segment size
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source", "length(text) AS n_chars"
    ).write.parquet(sf + "/documents.parquet")

    out = {r.doc_id: r for r in text_boilerplate_strip(spark, sf).collect()}
    assert set(out) == set(range(len(texts)))
    for i, t in enumerate(texts):
        assert out[i].n_removed == 0, out[i]
        assert out[i].cleaned_text == t, (out[i].cleaned_text, t)
