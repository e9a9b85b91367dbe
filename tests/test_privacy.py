"""Governance operators: k-anonymity audit + tokenizer fertility.

The DuckDB hash gate holds numeric parity; these pin the SEMANTICS
(suppression-ladder monotonicity, level decision rule, fertility
identities against the encode twin).
"""

from __future__ import annotations

from banking_streamprocessing_demos_spark.operators.privacy import (
    K_ANON,
    priv_k_anonymity,
)
from pyspark.sql import functions as F
from tests.conftest import SF_MEDIUM, SF_SMALL


def test_k_anonymity_ladder_monotone_and_level_rule(spark):
    rows = priv_k_anonymity(spark, SF_SMALL).collect()
    n = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert len(rows) == n  # one decision per record
    for r in rows:
        # generalizing can only grow the equivalence class
        assert r["size_l0"] <= r["size_l1"] <= r["size_l2"]
        # gen_level is the FIRST ladder level reaching k
        sizes = (r["size_l0"], r["size_l1"], r["size_l2"])
        want = next((i for i, s in enumerate(sizes) if s >= K_ANON), 3)
        assert r["gen_level"] == want, (r["c_custkey"], sizes, r["gen_level"])


def test_k_anonymity_class_sizes_are_actual_counts(spark):
    """size_l0 must equal the real multiplicity of the record's
    quasi-identifier tuple, recomputed independently."""
    rows = priv_k_anonymity(spark, SF_SMALL).collect()
    from collections import Counter

    counts = Counter((r["nation"], r["segment"], r["bal_bucket"]) for r in rows)
    for r in rows:
        assert r["size_l0"] == counts[(r["nation"], r["segment"], r["bal_bucket"])]


def test_k_anonymity_audit_is_discriminative(spark):
    """The fixture corpus must exercise more than one ladder level —
    an audit that puts every record at one level tests nothing."""
    levels = {r["gen_level"] for r in priv_k_anonymity(spark, SF_SMALL).collect()}
    assert len(levels) >= 2, levels


def test_fertility_identities_against_encode(spark):
    """Per-lang totals must reconcile with pipe_bpe_encode's per-doc
    totals (same fitted vocab, same corpus): token and word sums agree,
    fertility >= 1 (a word is at least one subword), single-token
    fraction in [0, 1]."""
    from banking_streamprocessing_demos_spark.operators.text import (
        pipe_bpe_encode,
        pipe_tokenizer_fertility,
    )

    fert = pipe_tokenizer_fertility(spark, SF_SMALL).collect()
    enc = pipe_bpe_encode(spark, SF_SMALL).agg(
        F.sum("n_words").alias("w"), F.sum("n_tokens_bpe_fit").alias("t")
    ).collect()[0]
    assert sum(r["n_word_occurrences"] for r in fert) == enc["w"]
    assert sum(r["n_tokens"] for r in fert) == enc["t"]
    for r in fert:
        assert r["fertility"] >= 1.0, r
        assert 0.0 <= r["single_token_frac"] <= 1.0, r
        assert r["n_tokens"] >= r["n_word_occurrences"], r


def test_l_diversity_counts_and_homogeneity_flag(spark):
    """distinct_segments recomputed independently per class; l_ok is
    exactly the >= L rule; and the audit is discriminative (the
    fixture has both homogeneous-ish and diverse classes)."""
    from collections import defaultdict

    from banking_streamprocessing_demos_spark.operators.privacy import (
        BAL_BUCKET,
        L_DIVERSE,
        priv_l_diversity,
    )

    import math

    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").collect()
    classes = defaultdict(set)
    sizes = defaultdict(int)
    for r in cust:
        key = (r["c_nationkey"], math.floor(r["c_acctbal"] / BAL_BUCKET))
        classes[key].add(r["c_mktsegment"])
        sizes[key] += 1
    rows = priv_l_diversity(spark, SF_SMALL).collect()
    assert len(rows) == len(classes)
    flags = set()
    for r in rows:
        key = (r["nation"], r["bal_bucket"])
        assert r["class_size"] == sizes[key]
        assert r["distinct_segments"] == len(classes[key])
        assert r["l_ok"] == (len(classes[key]) >= L_DIVERSE)
        flags.add(r["l_ok"])
    assert flags == {True, False}, flags


def test_streaming_kanon_cohorts_reconcile_with_batch_audit(spark):
    """Summing a class's per-cohort counts across all windows must
    recover the batch audit's corpus-wide class size (size_l0), and
    every 'releasable' flag is exactly the within-cohort >= K rule."""
    from collections import defaultdict

    from banking_streamprocessing_demos_spark.operators.privacy import K_ANON
    from banking_streamprocessing_demos_spark.operators.streaming_queries import (
        streaming_k_anonymity_q,
    )

    rows = streaming_k_anonymity_q(spark, SF_SMALL).collect()
    per_class = defaultdict(int)
    for r in rows:
        assert r["releasable"] == (r["class_size"] >= K_ANON)
        per_class[(r["nation"], r["segment"], r["bal_bucket"])] += r["class_size"]
    from banking_streamprocessing_demos_spark.operators.privacy import priv_k_anonymity

    batch = {}
    for r in priv_k_anonymity(spark, SF_SMALL).collect():
        batch[(r["nation"], r["segment"], r["bal_bucket"])] = r["size_l0"]
    assert per_class == batch


def test_dp_release_noise_is_bounded_and_deterministic(spark):
    """priv_dp_release contract: released counts are the true class
    counts plus bounded two-sided-geometric noise (|noise| <= CAP),
    clamped at zero, and the seeded draw is replay-identical."""
    from banking_streamprocessing_demos_spark.operators.privacy import (
        DP_NOISE_CAP,
        priv_dp_release,
    )
    from banking_streamprocessing_demos_spark.sources.tables import load_table

    true = {
        (r["nation"], r["segment"]): r["n"]
        for r in load_table(spark, SF_SMALL, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rel1 = {
        (r["nation"], r["segment"]): r["released_count"]
        for r in priv_dp_release(spark, SF_SMALL).collect()
    }
    rel2 = {
        (r["nation"], r["segment"]): r["released_count"]
        for r in priv_dp_release(spark, SF_SMALL).collect()
    }
    assert rel1 == rel2  # seeded: replay-identical
    assert set(rel1) == set(true)  # every class released exactly once
    noises = []
    for key, n in true.items():
        released = rel1[key]
        assert released >= 0
        assert released >= max(0, n - DP_NOISE_CAP)
        assert released <= n + DP_NOISE_CAP
        noises.append(released - n)
    # the draw actually perturbs: not every class gets zero noise
    assert any(d != 0 for d in noises), noises


def test_dp_noise_thresholds_form_a_valid_cdf():
    """The pre-computed integer CDF: strictly increasing thresholds,
    ending exactly at 65536, symmetric noise support -CAP..CAP."""
    from banking_streamprocessing_demos_spark.operators.privacy import (
        DP_NOISE_CAP,
        _dp_noise_thresholds,
    )

    th = _dp_noise_thresholds()
    assert [k for _, k in th] == list(range(-DP_NOISE_CAP, DP_NOISE_CAP + 1))
    ts = [t for t, _ in th]
    assert all(a < b for a, b in zip(ts, ts[1:])), ts
    assert ts[-1] == 65536
    # symmetry of the folded distribution: P(k) == P(-k) in u16 units
    widths = [b - a for a, b in zip([0] + ts[:-1], ts)]
    assert widths == widths[::-1], widths


def test_dp_release_seed_is_a_real_parameter(spark):
    """Production-randomness pin (round-11 verdict item): the default
    seed is ONLY the cross-engine parity device — a deployment passes a
    secret seed, and the mechanism's arithmetic is seed-independent:
    ANY seed's released counts stay within +-DP_NOISE_CAP of truth,
    while different seeds actually move the draws."""
    from banking_streamprocessing_demos_spark.operators.privacy import (
        DP_NOISE_CAP,
        priv_dp_release,
    )
    from banking_streamprocessing_demos_spark.sources.tables import load_table

    true = {
        (r["nation"], r["segment"]): r["n"]
        for r in load_table(spark, SF_SMALL, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    default = {
        (r["nation"], r["segment"]): r["released_count"]
        for r in priv_dp_release(spark, SF_SMALL).collect()
    }
    moved = 0
    for seed in ("secret-a", "secret-b"):
        rel = {
            (r["nation"], r["segment"]): r["released_count"]
            for r in priv_dp_release(spark, SF_SMALL, seed=seed).collect()
        }
        assert set(rel) == set(true)
        for key, n in true.items():
            assert max(0, n - DP_NOISE_CAP) <= rel[key] <= n + DP_NOISE_CAP, (
                seed,
                key,
                n,
                rel[key],
            )
        if rel != default:
            moved += 1
    # seeds are not a no-op: at least one secret seed changed some draw
    assert moved >= 1


def test_dp_folded_tail_delta_is_small_and_documented():
    """The (epsilon, delta) caveat: folding the geometric tails into
    +-CAP costs delta = 2*alpha^(CAP+1)/(1+alpha) — verify the folded
    mass in the integer CDF matches that closed form within u16
    rounding, and that it is indeed tiny at the shipped parameters."""
    import math

    from banking_streamprocessing_demos_spark.operators.privacy import (
        DP_EPSILON,
        DP_NOISE_CAP,
        _dp_noise_thresholds,
    )

    alpha = math.exp(-DP_EPSILON)
    base = (1 - alpha) / (1 + alpha)
    delta = 2 * alpha ** (DP_NOISE_CAP + 1) / (1 + alpha)
    assert delta < 1e-3  # tiny at epsilon=1, CAP=8
    th = _dp_noise_thresholds()
    ts = [t for t, _ in th]
    widths = dict(
        zip([k for _, k in th], [b - a for a, b in zip([0] + ts[:-1], ts)])
    )
    # each extreme arm carries its geometric mass PLUS half of delta
    for k in (-DP_NOISE_CAP, DP_NOISE_CAP):
        expect = base * alpha ** abs(k) + delta / 2
        assert abs(widths[k] / 65536 - expect) < 2 / 65536, (k, widths[k])


def test_release_end_to_end_gates_and_noise(spark):
    """The composed governance release: releasable == (k-anonymity AND
    l-diversity) recomputed independently per class; released counts
    exist exactly for releasable cells and sit within +-CAP of the true
    cell count; suppressed cells carry NULL.  Runs at sf0.01: the
    sf0.001 customer table (150 rows over ~150 classes) suppresses
    everything, leaving the released branch unexercised."""
    from collections import Counter, defaultdict

    from banking_streamprocessing_demos_spark.operators.privacy import (
        BAL_BUCKET,
        DP_NOISE_CAP,
        K_ANON,
        L_DIVERSE,
        priv_release_end_to_end,
    )
    from banking_streamprocessing_demos_spark.sources.tables import load_table

    import math

    true_cells: Counter = Counter()
    segs = defaultdict(set)
    for r in (
        load_table(spark, SF_MEDIUM, "customer")
        .select("c_nationkey", "c_acctbal", "c_mktsegment")
        .collect()
    ):
        cls = (int(r["c_nationkey"]), math.floor(r["c_acctbal"] / BAL_BUCKET))
        true_cells[(cls, r["c_mktsegment"])] += 1
        segs[cls].add(r["c_mktsegment"])
    class_size = Counter()
    for (cls, _seg), n in true_cells.items():
        class_size[cls] += n

    rows = priv_release_end_to_end(spark, SF_MEDIUM).collect()
    assert len(rows) == len(true_cells)
    saw_released = saw_suppressed = 0
    for r in rows:
        cls = (r["nation"], r["bal_bucket"])
        n = true_cells[(cls, r["segment"])]
        assert r["class_size"] == class_size[cls]
        assert r["distinct_segments"] == len(segs[cls])
        want_ok = class_size[cls] >= K_ANON and len(segs[cls]) >= L_DIVERSE
        assert r["releasable"] == want_ok, (cls, r["segment"])
        if want_ok:
            saw_released += 1
            assert r["released_count"] is not None
            assert max(0, n - DP_NOISE_CAP) <= r["released_count"] <= n + DP_NOISE_CAP
        else:
            saw_suppressed += 1
            assert r["released_count"] is None
    assert saw_released and saw_suppressed  # both branches exercised
