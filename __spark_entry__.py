"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are implemented in ``banking_streamprocessing_demos_spark/``;
each module registers named Query objects (Spark fn + DuckDB oracle
SQL twin) per SURVEY.md §2's operator inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from banking_streamprocessing_demos_spark.operators import merge_registries
from banking_streamprocessing_demos_spark.operators.dedup import REG as DEDUP_REG
from banking_streamprocessing_demos_spark.operators.message_domain import REG as MESSAGE_REG
from banking_streamprocessing_demos_spark.operators.multimodal import REG as MM_REG
from banking_streamprocessing_demos_spark.operators.packing import REG as PACKING_REG
from banking_streamprocessing_demos_spark.operators.relational import REG as RELATIONAL_REG
from banking_streamprocessing_demos_spark.operators.similarity import REG as SIM_REG
from banking_streamprocessing_demos_spark.operators.sketches import REG as SKETCH_REG
from banking_streamprocessing_demos_spark.operators.text import REG as TEXT_REG

_REGISTRIES = [
    RELATIONAL_REG,
    MESSAGE_REG,
    DEDUP_REG,
    SIM_REG,
    TEXT_REG,
    MM_REG,
    PACKING_REG,
    SKETCH_REG,
]

# The round driver checks the FIRST 50 queries() entries in insertion
# order.  Round-3 rotation (per round-2 VERDICT "Next round #1"): the
# 36 queries that had zero driver evidence after two rounds (they sat
# in the tail behind the static round-2 priority list) are promoted to
# slots 1-36; new round-3 operators follow; the remaining slots are
# refreshed flagships (the highest-value twice-green queries, one per
# §2 capability family).  Demoted queries stay registered and are still
# hash-verified every round by tools/check_correctness.py — the
# committed CORRECTNESS_FULL_r{N}.json artifact records the full
# registry, not just the driver's 50-row window.
_PROMOTED_NEVER_CHECKED = [
    # joins / aggs / windows (rounds-1-2 extensions, never driver-run)
    "j6_asof_join",
    "j7_range_join",
    "j8_salted_skew_join",
    "a7_pricing_summary",
    "a8_rollup_counts",
    "a9_distinct_aggs",
    "a10_pivot_counts",
    "a11_grouping_sets",
    "w1_hourly_event_counts",
    "w2_latency_quantiles",
    "w3_event_gaps",
    "w5_session_window",
    "w6_retention_cohorts",
    "w7_funnel",
    "w8_funnel_windowed",
    "w9_scd2_intervals",
    "s8_set_operations",
    "smp3_stratified_split",
    # message-domain / streaming analytics
    "gen_alert_rates_by_carrier",
    "gen_timeout_alerts",
    "gen_carrier_active_counts",
    "gen_status_histogram",
    "st1_join_variant",
    # round-2 LLM-pipeline extensions
    "pack_sequences",
    "contamination_check",
    "text_repetition",
    "dedup_semantic_clusters",
    "text_pii_scrub",
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "sketch_bloom_prefilter",
    "dedup_substring_spans",
    "pipe_domain_mix",
    "text_bigram_lm_score",
    "pipe_quality_prune",
    "pipe_shard_assign",
]

# New this round — zero prior driver evidence by construction.
_ROUND3_NEW = [
    "doc_chunk_overlap",
    "dedup_exact_normalized",
    "f12_json_props",
    "w10_anomaly_zscore",
    "sim_knn_graph",
    "emb_random_project",
    "j9_full_outer_reconcile",
    "text_containment",
    "emb_label_centroids",
    "smp4_group_split",
    "text_vocab_topk",
    "u6_merge_upsert",
    "pipe_length_filter",
]

# Twice-green flagships refreshed in any window slots left over (one
# per capability family: stateful detector, interval join, star agg,
# LSH dedup, tf-idf, ANN, packing pipeline, generator snapshot, ...).
_FLAGSHIP_REFRESH = [
    "st1_streaming_detector",
]

# Demoted tail: core §2 relational ops (driver-green rounds 1 AND 2)
# plus everything else twice-proven.  Still verified locally per round.
# New-this-round overflow: the window is full (49 never-checked + the
# st1 flagship), so these carry committed CORRECTNESS_FULL_r03 evidence
# now and rotate into the window next round.
_ROUND3_OVERFLOW = [
    "a12_exact_group_median",
    "f13_morton_code",
]

_DEMOTED_TAIL = [
    "j5_timeout_pairing",
    "a3_join_agg_revenue",
    "dedup_minhash_lsh",
    "dedup_exact",
    "text_tfidf_topk",
    "sim_ann_ivf",
    "w4_sessionization",
    "gen_messages_snapshot",
    "pipe_curation",
    "mm_feature_extract",
    "f_expressions",
    "u3_snapshot_last_event_wins",
    "smp1_deterministic_sample",
    "p1_projection_sort_limit",
    "p2_filter_inequality",
    "p3_filter_eq_single_col",
    "p4_filter_enum",
    "p5_time_threshold",
    "p6_branching_threshold",
    "p7_null_as_status",
    "p8_membership_sets",
    "j1_join_filter_groupby",
    "j2_scalar_correlated_subquery",
    "j3_anti_join",
    "j4_semi_join",
    "a1_count_global",
    "a2_groupby_count",
    "a4_group_stats",
    "a6_running_counters",
    "srt1_topn_by_time",
    "u1_insert_or_ignore",
    "u4_heartbeat_rollup",
    "f8_weighted_classify",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "emb_quantize_int8",
    "text_stats_quality",
    "text_langid",
    "text_token_counts",
    "text_fingerprint",
    "mm_resize",
    "mm_frame_sample",
    "s5_console_dry_run",
    "smp2_backpressure_topup",
    "gen_normal_delay_snapshot",
]

_DRIVER_PRIORITY = (
    _PROMOTED_NEVER_CHECKED
    + _ROUND3_NEW
    + _FLAGSHIP_REFRESH
    + _ROUND3_OVERFLOW
    + _DEMOTED_TAIL
)


def _all_queries():
    merged = merge_registries(*_REGISTRIES)
    missing = [n for n in _DRIVER_PRIORITY if n not in merged]
    extra = [n for n in merged if n not in _DRIVER_PRIORITY]
    if missing or extra:
        raise ValueError(
            f"_DRIVER_PRIORITY out of sync with registries: missing={missing} extra={extra}"
        )
    return {n: merged[n] for n in _DRIVER_PRIORITY}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-way star join +
    aggregation (a3_join_agg_revenue) — the J1/A3 'active per carrier'
    shape (phone_message_producer.py:266-272) at TPC-H-Q5 scale-up."""
    from banking_streamprocessing_demos_spark.operators.relational import a3

    return a3(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in _all_queries().items() if q.oracle is not None}
