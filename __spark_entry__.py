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
from banking_streamprocessing_demos_spark.operators.curate import REG as CURATE_REG
from banking_streamprocessing_demos_spark.operators.dedup import REG as DEDUP_REG
from banking_streamprocessing_demos_spark.operators.er import REG as ER_REG
from banking_streamprocessing_demos_spark.operators.message_domain import REG as MESSAGE_REG
from banking_streamprocessing_demos_spark.operators.multimodal import REG as MM_REG
from banking_streamprocessing_demos_spark.operators.packing import REG as PACKING_REG
from banking_streamprocessing_demos_spark.operators.pq import REG as PQ_REG
from banking_streamprocessing_demos_spark.operators.privacy import REG as PRIVACY_REG
from banking_streamprocessing_demos_spark.operators.relational import REG as RELATIONAL_REG
from banking_streamprocessing_demos_spark.operators.retrieval import REG as RETRIEVAL_REG
from banking_streamprocessing_demos_spark.operators.similarity import REG as SIM_REG
from banking_streamprocessing_demos_spark.operators.sketches import REG as SKETCH_REG
from banking_streamprocessing_demos_spark.operators.streaming_queries import (
    REG as STREAMING_Q_REG,
)
from banking_streamprocessing_demos_spark.operators.text import REG as TEXT_REG

_REGISTRIES = [
    RELATIONAL_REG,
    MESSAGE_REG,
    DEDUP_REG,
    ER_REG,
    SIM_REG,
    TEXT_REG,
    RETRIEVAL_REG,
    PRIVACY_REG,
    MM_REG,
    PACKING_REG,
    SKETCH_REG,
    PQ_REG,
    CURATE_REG,
    STREAMING_Q_REG,
]

# The round driver checks the FIRST 50 queries() entries in insertion
# order.  Round-7 rotation (standing policy from round-2 VERDICT #1,
# re-ordered per round-3 VERDICT #3): slots go to (a) every query with
# NO green driver row from any prior round; (b) every query new this
# round; (c) flagship refreshes — the highest-value driver-green
# queries, spanning every §2 + LLM-pipeline capability family,
# re-earning rows on this round's regenerated testdata.  Demoted
# queries stay registered and are hash-verified every round by
# tools/check_correctness.py; the committed CORRECTNESS_FULL_r{N}.json
# artifact records the whole registry, not just the driver's window.
_PROMOTED_NEVER_CHECKED: list[str] = [
    # round-8: the queue is EMPTY — with the r7 PQ-overflow promotions
    # every registered query now has driver-green evidence from some
    # round (the policy's goal state); new queries enter via _ROUND_NEW
]

# New this round — zero prior driver evidence by construction.
_ROUND_NEW: list[str] = [
    # round-9: bounded seeded-sample quantizer training (FAISS-shape
    # scale path) — codebook trajectory + end-to-end sampled search
    "emb_pq_codebook_sampled",
    "sim_ann_pq_sampled",
    # round-9: ingest-time perceptual near-dup gate (mm_phash_dedup twin)
    "streaming_phash_dedup",
    # round-9: SentencePiece-style batched merge learning (K/batch
    # driver round-trips instead of K — the 32k-merge scale shape)
    "pipe_bpe_merges_batched",
    # round-9: int8 scalar-quantization search — the FAISS QT_8bit
    # compression tier (training-free, per-vector scale + tinyint codes)
    "sim_ann_sq8",
    # round-9: entity resolution / record linkage — blocked fuzzy match
    # (two-pass blocking + levenshtein verify) and its quality report
    "er_blocked_match",
    "er_match_quality",
    # round-9: ingest-time record-linkage twin (frozen clean-side
    # block-key inventory, the streaming_chunk_dedup pattern)
    "streaming_er_match",
    # round-9: ER canonicalization (exact-class + fuzzy-link components)
    "er_cluster_entities",
    # round-9: hard-negative mining for contrastive training (IVF-layout
    # candidates, label-inequality filter, top-k per anchor)
    "emb_hard_negatives",
]

# Driver-green flagships refreshed in the remaining slots, spanning the
# capability families: stateful streaming, joins, aggs/windows, updates,
# sampling, generator functions, dedup, ANN/embeddings, text, packing.
_FLAGSHIP_REFRESH = [
    # Round-9 window: core flagships re-earning rows on this round's
    # regenerated testdata, the six r8-rested r7 earners returning
    # (streaming_token_histogram, streaming_pack_sequences,
    # sketch_hll_distinct, pipe_epoch_plan, smp3_stratified_split,
    # dedup_substring_spans), and a 7-query recall rotation of
    # long-demoted families (13 planned; 6 ceded slots to the ten
    # round-new queries).  Six r8 earners rest in the tail this
    # round (dedup_semantic_ivf, streaming_curriculum_histogram,
    # dedup_keep_best, pack_sequences, text_boilerplate_strip,
    # pipe_quality_gate); last round's 10 recalls returned to the tail.
    "streaming_quality_gate",
    "pipe_curriculum_pack",
    "streaming_doc_dedup",
    "streaming_minhash_dedup",
    "st1_streaming_detector",
    "st1_join_variant",
    "gen_messages_snapshot",
    "j1_join_filter_groupby",
    "j5_timeout_pairing",
    "j6_asof_join",
    "j7_range_join",
    "j8_salted_skew_join",
    "a3_join_agg_revenue",
    "a7_pricing_summary",
    "a11_grouping_sets",
    "w1_hourly_event_counts",
    "w5_session_window",
    "u3_snapshot_last_event_wins",
    "u6_merge_upsert",
    "f_expressions",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_semantic_clusters",
    "text_containment",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "sim_knn_graph",
    # rested-in-r8 earners returning
    "streaming_token_histogram",
    "streaming_pack_sequences",
    "sketch_hll_distinct",
    "pipe_epoch_plan",
    "smp3_stratified_split",
    "dedup_substring_spans",
    # recall rotation (returning from the demoted tail)
    "a8_rollup_counts",
    "w10_anomaly_zscore",
    "j9_full_outer_reconcile",
    "text_token_counts",
    "pipe_curation",
    "mm_resize",
    "sketch_cms_heavy_hitters",
    # (emb_quantize_int8, gen_status_histogram, smp2_backpressure_topup,
    # text_fingerprint, pipe_domain_mix and pipe_shard_assign ceded their
    # recall slots to this round's six extra round-new queries — the
    # window holds exactly 50; they return next round)
]

# Round-new overflow (window full): registered and hash-verified via
# tools/check_correctness.py -> CORRECTNESS_FULL_r{N}, promoted to the
# driver window next round per the standing policy.
_ROUND_OVERFLOW: list[str] = [
    # round-9 late additions (window already held 50 when they landed):
    # 1-bit binary-quantization search — the FAISS IndexBinaryFlat tier
    # (sign codes, XOR+popcount Hamming prescreen, exact rerank)
    "sim_ann_binary",
    # lexical retrieval: BM25 query-time ranking (Okapi/Lucene scorer)
    # and reciprocal-rank fusion of two disagreeing lexical rankings —
    # the keyword half of a hybrid RAG stack
    "text_bm25_search",
    "rank_fusion_rrf",
    # ingest-time BM25 percolation (text_bm25_search's streaming twin:
    # standing query, flowing docs, frozen corpus stats)
    "streaming_bm25_match",
    # MMR diversity re-rank of the BM25 pool (exact-decimal greedy over
    # the bounded candidate set; unrolled-CTE oracle)
    "rank_mmr_diversify",
    # per-language tokenizer fertility audit under the fitted BPE rules
    "pipe_tokenizer_fertility",
    # k-anonymity audit over customer quasi-identifiers (governance)
    "priv_k_anonymity",
    # temperature (alpha) sampling: corpus-derived mixture weights
    "pipe_temperature_mix",
    # l-diversity audit (homogeneity-attack check pairing k-anonymity)
    "priv_l_diversity",
    # ingest-time k-anonymity cohort-release gate (priv_k_anonymity's
    # streaming twin)
    "streaming_k_anonymity",
    # IVF-pruned binary search (FAISS BinaryIVF shape): coarse cells x
    # sign codes — the compression x pruning matrix completed
    "sim_ann_ivf_binary",
    # ingest-time temperature-mix drift monitor (frozen alpha policy
    # vs live arrival mix; the mixing family's streaming twin)
    "streaming_temperature_mix",
]

# Demoted tail: everything with green driver rows from prior rounds
# (r1/r2 core ops, r3 promotions).  Still hash-verified locally every
# round via tools/check_correctness.py -> CORRECTNESS_FULL_r{N}.json.
_DEMOTED_TAIL = [
    # recall-rotation entries bumped from the r9 window by round-new volume
    "emb_quantize_int8",
    "gen_status_histogram",
    "smp2_backpressure_topup",
    "text_fingerprint",
    "pipe_domain_mix",
    "pipe_shard_assign",
    # demoted after earning r8 driver rows (r8 round-new + six rested
    # flagships + the r8 recall rotation)
    "mm_phash_dedup",
    "streaming_mrl_assign",
    "sim_ann_opq_trained",
    "pipe_curate_end_to_end",
    "mm_phash_clusters",
    "mm_chunk_dedup",
    "streaming_chunk_dedup",
    "dedup_semantic_ivf",
    "streaming_curriculum_histogram",
    "dedup_keep_best",
    "pack_sequences",
    "text_boilerplate_strip",
    "pipe_quality_gate",
    "a9_distinct_aggs",
    "w7_funnel",
    "gen_timeout_alerts",
    "text_langid",
    "dedup_clusters",
    "smp1_deterministic_sample",
    "p2_filter_inequality",
    "u1_insert_or_ignore",
    "streaming_ivf_assign",
    "f12_json_props",
    # demoted after earning r7 driver rows (PQ-family promotions +
    # round-7 news + six rested flagships)
    "streaming_sessionization",
    "contamination_check",
    "dedup_exact",
    "emb_pq_codebook",
    "sim_ann_pq",
    "streaming_pq_assign",
    "sim_ann_ivfpq",
    "sim_ann_matryoshka",
    "streaming_keep_best",
    "sim_ann_opq",
    # demoted after earning r6 driver rows
    "streaming_boilerplate_strip",
    "pipe_bpe_merges",
    "pipe_bpe_encode",
    "streaming_bpe_encode",
    "streaming_epoch_plan",
    "streaming_hll_distinct",
    "w4_sessionization",
    "dedup_ngram_jaccard",
    "smp4_group_split",
    "sim_ann_ivf",
    "emb_random_project",
    # demoted after earning r5 driver rows
    "w9_scd2_intervals",
    "s8_set_operations",
    "emb_label_centroids",
    "text_pii_scrub",
    "text_bigram_lm_score",
    "smp5_weighted_sample",
    "streaming_reservoir_sample",
    "streaming_heavy_hitters",
    # demoted after earning r4 driver rows
    "text_tfidf_topk",
    "w2_latency_quantiles",
    "a12_exact_group_median",
    "f13_morton_code",
    "w6_retention_cohorts",
    "streaming_cms_cells",
    "streaming_contamination_check",
    "p1_projection_sort_limit",
    "p3_filter_eq_single_col",
    "p4_filter_enum",
    "p5_time_threshold",
    "p6_branching_threshold",
    "p7_null_as_status",
    "p8_membership_sets",
    "j2_scalar_correlated_subquery",
    "j3_anti_join",
    "j4_semi_join",
    "a1_count_global",
    "a2_groupby_count",
    "a10_pivot_counts",
    "w3_event_gaps",
    "a4_group_stats",
    "a6_running_counters",
    "srt1_topn_by_time",
    "u4_heartbeat_rollup",
    "f8_weighted_classify",
    "w8_funnel_windowed",
    "gen_carrier_active_counts",
    "gen_normal_delay_snapshot",
    "gen_alert_rates_by_carrier",
    "s5_console_dry_run",
    "dedup_embedding_cosine",
    "dedup_exact_normalized",
    "text_repetition",
    "doc_chunk_overlap",
    "text_vocab_topk",
    "pipe_length_filter",
    "mm_frame_sample",
    "mm_feature_extract",
    "pipe_quality_prune",
    "sketch_bloom_prefilter",
    "text_stats_quality",
]

_DRIVER_PRIORITY = (
    _PROMOTED_NEVER_CHECKED
    + _ROUND_NEW
    + _FLAGSHIP_REFRESH
    + _ROUND_OVERFLOW
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
