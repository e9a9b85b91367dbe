"""Shingle document-frequency cap: a stop-phrase shingle shared by more
documents than SHINGLE_DF_CAP must be dropped before the exact pair
join — it carries no Jaccard signal but makes the equi-join quadratic
on its key at corpus scale.  Differential corpus: hot-shingle-only docs
must produce NO pairs under the cap (Spark and oracle agree), while
genuine near-dups sharing rare shingles are still found."""

from __future__ import annotations

import duckdb
import pytest

from banking_streamprocessing_demos_spark.operators.dedup import (
    dedup_minhash,
    dedup_ngram,
    minhash_lsh_oracle,
    ngram_jaccard_oracle,
)

# docs 0-5: text IS the stop-phrase — their only shingle is hot (df=6).
# Uncapped, every pair among them is jaccard 1.0.
# docs 7,8: near-dups via rare shingles (3 of 4 shared -> jaccard 0.6).
HOT_DOCS = [(i, "the end of", "en", "edge", 10) for i in range(6)] + [
    (7, "p q r s t u", "en", "edge", 11),
    (8, "p q r s t v", "en", "edge", 11),
]

SMALL_CAP = 3


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hotshingle")
    spark.createDataFrame(
        HOT_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def hot_con(hot_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{hot_dir}/documents.parquet/*.parquet'"
    )
    return con


def _pairs(rows):
    return sorted((r["doc_a"], r["doc_b"]) for r in rows)


def test_ngram_cap_drops_hot_pairs_and_matches_oracle(spark, hot_dir, hot_con):
    srows = dedup_ngram(spark, hot_dir, df_cap=SMALL_CAP).collect()
    orows = hot_con.execute(ngram_jaccard_oracle(SMALL_CAP)).fetchall()
    assert _pairs(srows) == sorted((a, b) for a, b, *_ in orows)
    # the genuine near-dup survives; NO pair among the hot-only docs
    assert (7, 8) in _pairs(srows)
    assert all(a > 5 for a, _ in _pairs(srows))


def test_ngram_uncapped_would_explode(spark, hot_dir):
    # sanity: without the cap the hot shingle alone yields all 15 pairs
    # at jaccard 1.0 — the quadratic blowup the cap exists to prevent
    pairs = _pairs(dedup_ngram(spark, hot_dir, df_cap=10_000).collect())
    assert sum(1 for a, b in pairs if a <= 5 and b <= 5) == 15


def test_minhash_lsh_verify_stage_respects_cap(spark, hot_dir, hot_con):
    # the hot-only docs collide in every LSH band (identical signatures)
    # but the df-capped verify stage must reject them all
    srows = dedup_minhash(spark, hot_dir, df_cap=SMALL_CAP).collect()
    orows = hot_con.execute(minhash_lsh_oracle(SMALL_CAP)).fetchall()
    assert _pairs(srows) == sorted((a, b) for a, b, *_ in orows)
    assert all(a > 5 for a, _ in _pairs(srows))
