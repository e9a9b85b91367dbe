"""Physical-plan contract tests (SURVEY §4): the scale-critical plan
properties must hold, or a 100 TB deployment degrades silently."""

from __future__ import annotations

from banking_streamprocessing_demos_spark.operators.dedup import dedup_simhash
from banking_streamprocessing_demos_spark.operators.relational import (
    a3,
    j1,
    j3,
    j6_asof,
    j7_range,
    p2,
    p4,
)
from banking_streamprocessing_demos_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    count_shuffles,
    formatted_plan,
    pushed_filters,
    read_schemas,
)
from tests.conftest import SF_SMALL


def test_j1_dimension_broadcast(spark):
    """customer is the dimension side — must be a broadcast hash join,
    never a shuffle join on the fact table's key."""
    assert_broadcast_join(j1(spark, SF_SMALL))


def test_a3_star_join_single_agg_shuffle(spark):
    """All four dimension joins broadcast; the only (non-broadcast)
    exchange allowed is the final aggregation."""
    df = a3(spark, SF_SMALL)
    assert_broadcast_join(df)
    assert count_shuffles(df) <= 1, formatted_plan(df)


def test_a3_lineitem_scan_pruned(spark):
    """Column pruning must reach the parquet scan: lineitem has 11
    columns, the query needs 3."""
    schemas = read_schemas(a3(spark, SF_SMALL))
    li = [s for s in schemas if "l_extendedprice" in s]
    assert li, schemas
    assert "l_quantity" not in li[0] and "l_shipdate" not in li[0], li[0]


def test_filters_pushed_to_scan(spark):
    """Predicate pushdown must reach the parquet reader (P2/P4)."""
    pf2 = pushed_filters(p2(spark, SF_SMALL))
    assert any("event_type" in f for f in pf2), pf2
    pf4 = pushed_filters(p4(spark, SF_SMALL))
    assert any("o_orderstatus" in f for f in pf4), pf4


def test_anti_join_not_cartesian(spark):
    df = j3(spark, SF_SMALL)
    assert_no_cartesian(df)
    assert_broadcast_join(df)


def test_j6_asof_single_shuffle(spark):
    """The merge-asof composition must cost ONE data shuffle (the window
    partitioning on user_id) after the right side's tiny pre-dedup agg —
    never a range-join explosion or per-row subquery."""
    df = j6_asof(spark, SF_SMALL)
    assert_no_cartesian(df)
    # shuffles: right-side (user_id, ts) dedup agg + the window sort;
    # anything beyond that means the asof degenerated
    assert count_shuffles(df) <= 3, formatted_plan(df)
    assert "Window" in formatted_plan(df)


def test_j7_range_join_broadcasts_incidents(spark):
    """The LIMIT-bounded incident side must broadcast: the non-equi
    range predicate then costs a BroadcastNestedLoopJoin probe per event,
    not a shuffle or cartesian of the fact table."""
    plan = formatted_plan(j7_range(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_simhash_no_shuffle(spark):
    """The in-row sketch must stay a narrow map: scan → repartition →
    project, with NO aggregation exchange (a doc's simhash never needs
    other docs)."""
    df = dedup_simhash(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "HashAggregate" not in plan, plan[:2000]
    # the single Exchange is the explicit small-file fan-out repartition
    assert count_shuffles(df) <= 1, plan[:2000]


def test_quantize_no_shuffle(spark):
    """emb_quantize_int8 must stay a narrow map: scan → project, no
    Exchange and no aggregation (each vector quantizes in-row)."""
    from banking_streamprocessing_demos_spark.operators.similarity import emb_quantize

    df = emb_quantize(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 0, plan[:2000]
    assert "HashAggregate" not in plan, plan[:2000]


def test_curation_pipeline_shuffle_budget(spark):
    """pipe_curation's exchanges are exactly its two keyed stages (dedup
    groupBy + final rollup, plus the dedup semi-join's distribution) —
    the hash-membership split must add none."""
    from banking_streamprocessing_demos_spark.operators.text import pipe_curation

    df = pipe_curation(spark, SF_SMALL)
    assert count_shuffles(df) <= 3, formatted_plan(df)


def test_text_repetition_no_shuffle(spark):
    """Repetition signals are in-row HOF folds: scan -> project, zero
    Exchanges (each document's repetition depends only on itself)."""
    from banking_streamprocessing_demos_spark.operators.text import text_repetition

    df = text_repetition(spark, SF_SMALL)
    assert count_shuffles(df) == 0, formatted_plan(df)


def test_pack_sequences_prefix_sum_shape(spark):
    """The RECURSIVE prefix sum must keep the global (no-partition)
    window on the doubly-reduced super-bucket table only: exactly one
    SinglePartition exchange, fed by TWO groupBy reduction levels
    (bucket ``__b3`` then super-bucket ``__b2`` — N/BUCKET^2 rows), and
    a bounded shuffle count — never a corpus-wide single-partition
    sort at ANY corpus size."""
    from banking_streamprocessing_demos_spark.operators.packing import pack_sequences

    df = pack_sequences(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert plan.count("SinglePartition") == 1, plan
    # both reduction levels present: per-bucket and per-super-bucket aggs
    assert "__b3" in plan and "__b2" in plan, plan
    # 5 logical shuffles (2 reduction aggs, 1 tiny global window, 2
    # partitioned windows); the level-1 agg subtree prints twice in the
    # tree (it feeds both the recursion and the join side) and is
    # deduplicated by ReuseExchange at runtime
    assert count_shuffles(df) <= 6, plan


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark shingle set is the tiny side: the probe must be a
    broadcast (map-side) marker join feeding ONE corpus aggregation —
    never a corpus shuffle for the probe, never a second corpus pass
    for the totals (the round-3 one-pass shape)."""
    from banking_streamprocessing_demos_spark.operators.dedup import contamination_check

    df = contamination_check(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin LeftOuter" in plan, plan
    # exactly ONE corpus aggregation exchange (total + contaminated
    # counted together — keyed on doc_id); the rest are the two local
    # fan-out repartitions inside the shingle builder and the tiny
    # benchmark-side distinct.  The old two-pass shape had TWO doc_id
    # aggregation exchanges.
    assert plan.count("hashpartitioning(doc_id") == 1, plan
    assert count_shuffles(df) <= 4, plan


def test_hll_register_table_shape(spark):
    """HLL must fold through partial aggregation: two map-side-combined
    hash-agg shuffles (grp×bucket registers, then per-grp fold) and no
    sort/window anywhere — the register table bounds shuffle width at
    #groups×512 regardless of input size."""
    from banking_streamprocessing_demos_spark.operators.sketches import sketch_hll_distinct

    df = sketch_hll_distinct(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert count_shuffles(df) <= 2, plan
    assert "Window" not in plan and "Sort" not in plan.replace("SortAggregate", ""), plan


def test_cms_cells_broadcast(spark):
    """The 4×1024 CMS cell table must broadcast to the probe side —
    never a shuffle join keyed on (row, bucket)."""
    from banking_streamprocessing_demos_spark.operators.sketches import (
        sketch_cms_heavy_hitters,
    )

    df = sketch_cms_heavy_hitters(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_doc_chunk_overlap_no_shuffle(spark):
    """Chunking is per-document in-row work: scan → posexplode → project
    with NO Exchange — the property that makes it free at any corpus
    size."""
    from banking_streamprocessing_demos_spark.operators.text import doc_chunk_overlap

    df = doc_chunk_overlap(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 0, plan[:2000]
    assert "HashAggregate" not in plan, plan[:2000]


def test_dedup_exact_normalized_single_shuffle(spark):
    """Normalize-then-hash dedup keeps the dedup_exact shuffle budget:
    exactly one Exchange (the 16-byte-key groupBy, map-side combined)."""
    from banking_streamprocessing_demos_spark.operators.dedup import dedup_exact_normalized

    df = dedup_exact_normalized(spark, SF_SMALL)
    assert count_shuffles(df) == 1, formatted_plan(df)[:2000]


def test_knn_graph_centroids_broadcast(spark):
    """The k-NN graph's quantizer side must broadcast (cells are tiny);
    the only large shuffle keys on cell_id — never an all-pairs join."""
    from banking_streamprocessing_demos_spark.operators.similarity import sim_knn_graph

    df = sim_knn_graph(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_knn_graph_ranking_exchange_is_skinny(spark):
    """The per-vector centroid-ranking exchange must carry ONLY
    (vec_id, cell_id, cell_cos) — never the 64-dim arrays.  Before
    round 4 the arrays rode the N x n_cells ranking shuffle (~30 GB at
    a 30x corpus) and dominated the whole query; this pins the fix."""
    import re

    from banking_streamprocessing_demos_spark.operators.similarity import sim_knn_graph

    plan = formatted_plan(sim_knn_graph(spark, SF_SMALL))
    blocks = re.findall(
        r"\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: hashpartitioning", plan
    )
    ranking = [b for b in blocks if "cell_cos" in b]
    assert ranking, plan[:2000]
    for b in ranking:
        assert not re.search(r"embedding#|qv#|cv#|\bv#", b), b


def test_emb_random_project_no_shuffle(spark):
    """JL projection is a plan-literal matrix times each row: scan →
    project, zero Exchange."""
    from banking_streamprocessing_demos_spark.operators.similarity import emb_random_project

    df = emb_random_project(spark, SF_SMALL)
    assert count_shuffles(df) == 0, formatted_plan(df)[:2000]


def test_smp4_group_split_no_shuffle(spark):
    """Group-aware split is a pure per-row hash: no Exchange, no sort."""
    from banking_streamprocessing_demos_spark.operators.relational import smp4_group_split

    df = smp4_group_split(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 0, plan[:2000]
    assert "Sort" not in plan, plan[:2000]


def test_vocab_topk_take_ordered(spark):
    """Corpus vocabulary top-k must use TakeOrderedAndProject (per-
    partition top-k + merge), never a global Sort of all words."""
    from banking_streamprocessing_demos_spark.operators.text import text_vocab_topk

    df = text_vocab_topk(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_smp5_weighted_sample_take_ordered(spark):
    """Weighted sampling must select its top-k via TakeOrderedAndProject
    (per-partition heaps + merge) — a global Sort of the corpus to take
    200 rows is the plan bug this pins against.  Also pin the
    length-weighting semantics: the sample's mean token count must
    exceed the corpus mean (longer docs are proportionally likelier
    under the Efraimidis-Spirakis key)."""
    from banking_streamprocessing_demos_spark.operators.relational import (
        smp5_weighted_sample,
    )
    from banking_streamprocessing_demos_spark.sources.tables import load_table

    df = smp5_weighted_sample(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    rows = df.collect()
    assert len(rows) == 200
    from pyspark.sql import functions as F

    corpus_mean = (
        load_table(spark, SF_SMALL, "documents")
        .select(
            (
                F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + 1
            ).alias("n")
        )
        .agg(F.avg("n"))
        .collect()[0][0]
    )
    sample_mean = sum(r.n_tokens for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_j9_reconcile_detail_preaggregated(spark):
    """The full-outer reconcile must aggregate the detail side BEFORE
    the join (key-to-key, never row-to-row): the join inputs are one
    agg each, and no cartesian appears."""
    from banking_streamprocessing_demos_spark.operators.relational import (
        j9_full_outer_reconcile,
    )

    import re

    df = j9_full_outer_reconcile(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    # exactly one join node (counted via detail headers, not the tree echo)
    joins = [
        line
        for line in plan.splitlines()
        if re.match(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", line.strip())
    ]
    assert len(joins) == 1, joins
    assert "FullOuter" in plan, plan[:2000]
    # the detail side reaches the join through its own aggregate
    assert plan.count("partial_sum") >= 1, plan[:2000]


def test_curriculum_pack_prefix_sum_shape(spark):
    """Curriculum packing reuses the recursive prefix sum on the
    (tier, doc_id) composite key: still exactly one SinglePartition
    exchange (the doubly-reduced super-bucket table) — the quality gate
    composition must not smuggle in a global sort."""
    from banking_streamprocessing_demos_spark.operators.packing import (
        pipe_curriculum_pack,
    )

    df = pipe_curriculum_pack(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert plan.count("SinglePartition") == 1, plan
    assert "__b3" in plan and "__b2" in plan, plan


def test_knn_graph_jl_prescreen_exchanges_are_skinny(spark):
    """The scale path (auto_cells past the pinned floor engages the JL
    prescreen) must keep BOTH ranking exchanges skinny: the 16-dim JL
    scoring shuffle carries (vec_id, cell_id, cell_cos) and the
    full-dimension rescore shuffles only the shortlist — no 64-dim
    array ever rides an N x n_cells exchange."""
    import re

    from banking_streamprocessing_demos_spark.operators.similarity import sim_knn_graph

    plan = formatted_plan(sim_knn_graph(spark, SF_SMALL, n_cells=32))
    blocks = re.findall(
        r"\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: hashpartitioning", plan
    )
    ranking = [b for b in blocks if "cell_cos" in b]
    assert ranking, plan[:2000]
    for b in ranking:
        assert not re.search(r"embedding#|qv#|cv#|jv#|\bv#", b), b


def test_boilerplate_strip_shuffle_budget(spark):
    """text_boilerplate_strip: three hash-keyed exchanges only — the
    (seg_key, doc_id) distinct, the seg_key df-count, and the final
    doc_id reassembly.  The boilerplate probe joins broadcast/equi on
    the 16-byte md5 key, never on raw segment text."""
    from banking_streamprocessing_demos_spark.operators.text import (
        text_boilerplate_strip,
    )

    df = text_boilerplate_strip(spark, SF_SMALL)
    assert count_shuffles(df) <= 3, formatted_plan(df)
    assert_no_cartesian(df)


def test_keep_best_window_exchange_skinny(spark):
    """dedup_keep_best: the per-cluster argmax window shuffles only the
    skinny (doc_id, word_count, cluster_id) projection — document text
    must be consumed by the scan-side word_count projection and never
    travel through the cluster_id exchange."""
    import re

    from banking_streamprocessing_demos_spark.operators.dedup import dedup_keep_best

    plan = formatted_plan(dedup_keep_best(spark, SF_SMALL))
    exchanges = re.findall(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\][^(]*hashpartitioning\(cluster_id",
        plan,
    )
    assert exchanges, plan
    for cols in exchanges:
        assert "text#" not in cols, cols


def test_curate_end_to_end_no_stage_reexecution(spark):
    """pipe_curate_end_to_end (the composed curation DAG): every
    expensive stage must be sealed behind its skinny checkpoint — the
    FINAL plan may contain NO parquet scan (gate/dedup/BPE/source-map
    all read materialized stage boundaries) and EXACTLY TWO Generates —
    the round-8 sample-materialization explodes (epoch copies x
    domain-mix replicas), both narrow maps over the checkpointed
    per-doc plan; no shingle or word explode survives past its stage,
    so no upstream stage can re-execute inside the downstream fan-out
    (the re-execution trap the curriculum sweep caught live).  Exactly
    two SinglePartition exchanges are budgeted, both over bounded
    tables: the prefix sum's doubly-reduced super-bucket table and the
    epoch plan's grand total over the per-SOURCE aggregate (rows =
    n_sources)."""
    from banking_streamprocessing_demos_spark.operators.curate import (
        pipe_curate_end_to_end,
    )

    df = pipe_curate_end_to_end(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "Scan parquet" not in plan, plan
    # each operator appears twice in a formatted plan (tree line +
    # "(NNN) Generate" detail header); count the detail headers
    assert plan.count(") Generate") == 2, plan
    assert plan.count("SinglePartition") == 2, plan
    assert_no_cartesian(df)


def test_checkpointed_operators_expose_stage_lineage(spark):
    """Round-8 VERDICT #5: eager checkpoints make the FINAL plan opaque
    (ExistingRDD at each stage boundary), so the checkpointed operators
    route their boundaries through plans.explain.checkpoint_stage and a
    capture_stages() run must recover the full pre-checkpoint lineage:
    named stages, each stage plan rooted in real lineage (the first
    stage scans parquet; no captured stage is ExistingRDD-only), and
    tools/dump_plans.py renders these into PLANS.md."""
    from banking_streamprocessing_demos_spark.operators.multimodal import (
        mm_phash_dedup,
    )
    from banking_streamprocessing_demos_spark.operators.pq import opq_trained_index
    from banking_streamprocessing_demos_spark.plans.explain import capture_stages

    with capture_stages() as stages:
        mm_phash_dedup(spark, SF_SMALL)
    names = [s for s, _p in stages]
    assert names == ["phash_sketch"], names
    assert "Scan parquet" in stages[0][1], stages[0][1][:500]

    with capture_stages() as stages:
        opq_trained_index(spark, SF_SMALL)
    names = [s for s, _p in stages]
    assert names == [
        "opq_fixture_stretch",
        "opq_fixture_renormalize",
        "opq_composed_givens_rotation",
        "opq_allocation_permute_round6",
    ], names
    # first stage reads the real table; later stages chain off the
    # previous checkpoint (ExistingRDD root) but still show THEIR OWN
    # transformation lineage, which is the point of the capture
    assert "Scan parquet" in stages[0][1]
    for _s, plan in stages:
        assert "Project" in plan or "Scan parquet" in plan, plan[:300]
    # capture is strictly observational: outside the context the
    # operator takes the zero-overhead path
    out = mm_phash_dedup(spark, SF_SMALL)
    assert out.columns == ["media_a", "media_b", "hamming"]


def test_dsir_ratio_is_broadcast_and_models_are_bounded(spark):
    """DSIR's scale contract: the log-ratio side table joins back to the
    per-doc features as a BROADCAST (never a shuffle keyed on the
    corpus-sized feature rows), and the table itself is bounded by
    DSIR_BUCKETS at any corpus size."""
    from banking_streamprocessing_demos_spark.operators.text import (
        DSIR_BUCKETS,
        dsir_ratio_table,
        pipe_dsir_weights,
    )

    assert dsir_ratio_table(spark, SF_SMALL).count() <= DSIR_BUCKETS
    df = pipe_dsir_weights(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_perplexity_buckets_window_exchange_is_skinny(spark):
    """The per-language NTILE runs over SKINNY (doc_id, lang, score)
    rows — the document text must never ride the ranking exchange (the
    dedup_keep_best lesson)."""
    from banking_streamprocessing_demos_spark.operators.text import (
        pipe_perplexity_buckets,
    )

    df = pipe_perplexity_buckets(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    # the window input exchange is hashpartitioning(lang); no plan line
    # carrying it may also carry the text column
    for line in plan.splitlines():
        if "hashpartitioning(lang" in line:
            assert "text" not in line, line


def test_dp_release_is_one_aggregate_no_joins(spark):
    """The DP release plan: one grouped count + in-row noise — no join
    anywhere (the noise CASE is a scalar expression over the aggregate
    output), so the query's scale is the class-space cardinality."""
    from banking_streamprocessing_demos_spark.operators.privacy import priv_dp_release

    df = priv_dp_release(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert count_shuffles(df) <= 1, plan[:2000]


def test_hybrid_fusion_sources_are_bounded_topn(spark):
    """Both hybrid-fusion sources must reach the union as bounded top-N
    plans: the BM25 side via TakeOrderedAndProject, never a corpus-wide
    sort window."""
    from banking_streamprocessing_demos_spark.operators.retrieval import (
        rank_fusion_hybrid,
    )

    df = rank_fusion_hybrid(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_dsir_resample_take_ordered(spark):
    """The Gumbel-top-K selection must ride TakeOrderedAndProject
    (per-partition heaps + merge), never a corpus-wide sort — the
    smp5 contract, re-pinned for the composed DSIR pipeline."""
    from banking_streamprocessing_demos_spark.operators.text import pipe_dsir_resample

    df = pipe_dsir_resample(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_gopher_rules_fully_scan_pushed(spark):
    """The Gopher rule battery is pure per-row expressions: the plan
    must contain NO exchange, NO join, and NO aggregate — every flag
    computes inside the scan's codegen stage at any corpus size."""
    from banking_streamprocessing_demos_spark.operators.text import pipe_gopher_rules

    df = pipe_gopher_rules(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 0, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert "Aggregate" not in plan, plan[:2000]


def test_perplexity_sampled_assignment_is_broadcast(spark):
    """The sampled-threshold form's CORPUS-WIDE stage must be a
    broadcast hash join on lang (shuffle-free assignment — the whole
    point of the CCNet trade): the only exchanges allowed are inside
    the bounded threshold-fit side (the 120-doc sample and the shared
    LM fit), never a per-language ranking of all corpus rows."""
    from banking_streamprocessing_demos_spark.operators.text import (
        pipe_perplexity_buckets,
        pipe_perplexity_buckets_sampled,
    )

    df = pipe_perplexity_buckets_sampled(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # the shared scored frame must build once: its LM-fit exchanges are
    # reused across the sample side and the assignment side.  AQE defers
    # reuse detection to runtime, so the pin reads the EXECUTED plan
    # (the static plan double-counts the shared subtree).
    df.collect()
    post = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in post, post[:2000]


def test_rank_cells_arrow_plan_is_one_python_stage(spark):
    """The adopted keep=1 arrow assignment: the ranking side must be a
    single ArrowEvalPython/MapInArrow stage over the scan — no
    N x n_cells row blowup, no window exchange on the scoring path."""
    from banking_streamprocessing_demos_spark.operators.similarity import (
        _normed,
        rank_cells_arrow,
    )

    df = rank_cells_arrow(_normed(spark, SF_SMALL), 64, keep=1)
    plan = formatted_plan(df)
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "PythonMapInArrow" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_quality_classifier_scoring_is_broadcast(spark):
    """pipe_quality_classifier's corpus-wide stage must score through
    BROADCAST joins of the fixed-size model (weight vector + bias) —
    the text side shuffles only for its own per-doc feature count
    (map-side combined), never for the model."""
    from banking_streamprocessing_demos_spark.operators.text import (
        pipe_quality_classifier,
    )

    df = pipe_quality_classifier(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # no sort-merge join anywhere: every join in the pipeline has a
    # bounded side (sample labels, bucket counts, totals, weights, bias)
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_quality_classifier_calibration_single_pass(spark):
    """The 13-threshold PR sweep must be ONE grouped aggregation over
    the scored rows crossed with the broadcast grid — no per-threshold
    rescan (13 scans would show 13+ parquet reads of documents)."""
    from banking_streamprocessing_demos_spark.operators.text import (
        pipe_quality_classifier_calibration,
    )

    df = pipe_quality_classifier_calibration(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan[:2000]
    # documents is scanned a bounded number of times (model-fit label +
    # sample + per-class count sides, the scoring features, and the
    # calibration labels — 10 in the static plan), NOT once per
    # threshold: the bound is structural in the pipeline's sides and
    # must stay strictly below the 13-threshold grid
    assert plan.count("documents.parquet") <= 10, plan.count("documents.parquet")


def test_mm_align_no_window_no_cartesian(spark):
    """mm_text_image_align: two equi joins against embeddings + per-row
    vector arithmetic — no window exchange, no cartesian blowup, no
    aggregate on the scoring path (the only aggregate allowed is the
    1-row doc-count used by the planted-pair modulus)."""
    from banking_streamprocessing_demos_spark.operators.multimodal import (
        mm_text_image_align,
    )

    df = mm_text_image_align(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan[:2000]
    assert_no_cartesian(df)
