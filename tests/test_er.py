"""Entity-resolution semantics beyond oracle parity: blocking
effectiveness, verify-threshold invariants, honest-recall accounting
for the short-name blind spot, and the scale-critical plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.operators.er import (
    DIRTY_MOD,
    MAX_LEV,
    _clean,
    _dirty,
    _matched,
    _with_block_keys,
    er_blocked_match,
    er_match_quality,
)
from banking_streamprocessing_demos_spark.plans.explain import (
    assert_no_cartesian,
    count_shuffles,
    formatted_plan,
)
from tests.conftest import SF_SMALL


def test_er_dirty_corpus_is_deterministic_single_deletions(spark):
    """Every dirty record is its source name with EXACTLY one character
    deleted at the key-dependent position — the ground-truth corpus
    both engines must derive identically."""
    d = _dirty(spark, SF_SMALL).collect()
    src = {r["rec_id"]: r["name"] for r in _clean(spark, SF_SMALL).collect()}
    assert d
    for r in d:
        orig = src[r["src_id"]]
        assert len(r["name"]) == len(orig) - 1, (r["src_id"], orig, r["name"])
        pos = r["src_id"] % len(orig)
        assert r["name"] == orig[:pos] + orig[pos + 1 :], (orig, r["name"])


def test_er_matches_respect_verify_threshold(spark):
    """No pair survives with edit distance above MAX_LEV, and every
    reported lev is the true Levenshtein distance (spot-checked in
    Python for the whole sf0.001 output)."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    dirty = {r["rec_id"]: r["name"] for r in _dirty(spark, SF_SMALL).collect()}
    clean = {r["rec_id"]: r["name"] for r in _clean(spark, SF_SMALL).collect()}
    rows = er_blocked_match(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["lev"] <= MAX_LEV
        assert r["lev"] == lev(dirty[r["dirty_id"]], clean[r["clean_id"]])
        assert r["matched_name"] == clean[r["clean_id"]]


def test_er_planted_recall_is_full(spark):
    """Round-10 full-recall pin: with the sorted-token third blocking
    pass, EVERY planted dirty record links back to its source — the
    round-9 misses were all separator deletions from short 'xxx yyy'
    names (breaking prefix-4 and suffix-4 at once), which the
    sorted-token key is invariant to.  A future miss would mean either
    a blocking regression or a regenerated corpus with a new blind-spot
    class (e.g. a <7-char name with a mid-position LETTER deletion) —
    both worth failing loudly over."""
    matched_ids = {r["dirty_id"] for r in er_blocked_match(spark, SF_SMALL).collect()}
    src = {r["rec_id"]: r["name"] for r in _clean(spark, SF_SMALL).collect()}
    misses = [
        (r["rec_id"], src[r["src_id"]], r["name"])
        for r in _dirty(spark, SF_SMALL).collect()
        if r["rec_id"] not in matched_ids
    ]
    assert misses == [], misses


def test_er_sorted_token_key_is_separator_deletion_invariant(spark):
    """The property the third pass exists for, pinned directly: the
    sorted-token key of a name and of the same name with its separator
    deleted are identical (so they land in the same block), checked on
    the planted miss class from round 9."""
    rows = (
        spark.createDataFrame([("red rod",), ("redrod",)], "name string")
        .select(F.array_join(F.array_sort(F.split("name", " ")), "").alias("k"))
        .collect()
    )
    assert rows[0]["k"] == rows[1]["k"] == "redrod"


def test_er_blocking_bounds_candidates(spark):
    """The blocked candidate count must sit FAR below all-pairs — the
    whole point of the two-stage shape (165x reduction measured at
    sf0.01; assert one order of magnitude to stay regen-robust)."""
    ck = _with_block_keys(_clean(spark, SF_SMALL)).select(
        F.col("rec_id").alias("clean_id"), "brand", "bkey"
    )
    dk = _with_block_keys(_dirty(spark, SF_SMALL)).select(
        F.col("rec_id").alias("dirty_id"), "brand", "bkey"
    )
    n_cand = dk.join(ck, ["brand", "bkey"]).dropDuplicates(["dirty_id", "clean_id"]).count()
    n_all_pairs = _clean(spark, SF_SMALL).count() * _dirty(spark, SF_SMALL).count()
    assert n_cand * 10 < n_all_pairs, (n_cand, n_all_pairs)


def test_er_quality_aggregates_are_consistent(spark):
    """The quality report's brand rows must reconcile exactly with the
    match output and the dirty corpus: totals, recall, precision."""
    q = er_match_quality(spark, SF_SMALL).collect()
    pairs = er_blocked_match(spark, SF_SMALL).collect()
    n_dirty_total = _dirty(spark, SF_SMALL).count()
    assert sum(r["n_dirty"] for r in q) == n_dirty_total
    assert sum(r["n_pairs"] for r in q) == len(pairs)
    assert sum(r["n_matched"] for r in q) == len({p["dirty_id"] for p in pairs})
    for r in q:
        assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["precision"] <= 1.0
        assert r["n_true_pairs"] <= r["n_pairs"]
        assert r["n_matched"] <= r["n_dirty"]
    # overall linkage quality on the committed corpus: FULL record
    # recall under the round-10 three-pass blocking, high pair
    # precision (0.98 at sf0.01 authoring time)
    recall = sum(r["n_matched"] for r in q) / n_dirty_total
    precision = sum(r["n_true_pairs"] for r in q) / max(sum(r["n_pairs"] for r in q), 1)
    assert recall == 1.0, recall
    assert precision >= 0.9, precision


def test_er_match_plan_shape(spark):
    """Scale contract: both blocking passes are hash-keyed joins (no
    cartesian product anywhere), DIRTY_MOD-th filter is pushed to the
    scan, and the shuffle budget stays fixed (join keys + the pair
    dedup) regardless of corpus size."""
    df = er_blocked_match(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "PushedFilters" in plan or "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert count_shuffles(df) <= 5, plan[:2000]
    assert DIRTY_MOD == 4  # doc constant the blind-spot test relies on


def test_er_cluster_entities_semantics(spark):
    """Canonicalization invariants: entity_id is the component-min
    rec_id; clean records sharing an exact (name, brand) class always
    share an entity; every matched dirty record lands in the entity of
    at least one of its matched clean records; entity_size counts the
    member rows exactly; all entities have >= 2 members."""
    from collections import Counter

    from banking_streamprocessing_demos_spark.operators.er import er_cluster_entities

    rows = er_cluster_entities(spark, SF_SMALL).collect()
    assert rows
    by_entity: dict[int, list[int]] = {}
    ent_of: dict[int, int] = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], []).append(r["rec_id"])
        ent_of[r["rec_id"]] = r["entity_id"]
    sizes = Counter(r["entity_id"] for r in rows)
    for r in rows:
        assert r["entity_size"] == sizes[r["entity_id"]]
    for ent, members in by_entity.items():
        assert len(members) >= 2
        assert ent == min(members), (ent, min(members))
    # exact-class consistency on the clean side
    cls: dict[tuple, set[int]] = {}
    for r in _clean(spark, SF_SMALL).collect():
        cls.setdefault((r["name"], r["brand"]), set()).add(r["rec_id"])
    for members in cls.values():
        ents = {ent_of[m] for m in members if m in ent_of}
        if len(members) >= 2:
            assert len(ents) == 1, (members, ents)
    # every matched dirty record shares an entity with a matched clean record
    match_of: dict[int, set[int]] = {}
    for m in er_blocked_match(spark, SF_SMALL).collect():
        match_of.setdefault(m["dirty_id"], set()).add(m["clean_id"])
    for dirty_id, cleans in match_of.items():
        assert ent_of[dirty_id] in {ent_of[c] for c in cleans if c in ent_of} | {
            ent_of[dirty_id]
        }
        assert any(ent_of[c] == ent_of[dirty_id] for c in cleans), dirty_id
