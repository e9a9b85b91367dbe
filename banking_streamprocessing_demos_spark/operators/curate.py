"""The full curation pipeline composed as ONE job (round-7 VERDICT #6).

Every stage below exists as an individually hash-checked operator; this
module runs the composition a real 100 TB curation user would submit as
a single DAG:

    quality gate  ->  keep-best near-dup dedup (among gated docs)
                  ->  BPE tokenizer fit + token metering (on the curated
                      corpus — the tokenizer a training pipeline ships
                      is fit on curated data, not the raw crawl)
                  ->  curriculum pack (tiered by the gate's LM score,
                      offsets in BPE tokens)
                  ->  epoch/repeat plan (per-source budgets in BPE
                      tokens over the curated corpus)
                  ->  sample materialization: epoch copies x domain-mix
                      replicas -> shard assignment + in-shard position
                      (the mixed, sharded write-out a training run
                      actually consumes — round-8 extension)

Composed plans rot in two specific ways this module guards against
(both previously caught live in this repo):

- STAGE RE-EXECUTION: a downstream operator referencing an expensive
  upstream subtree through Catalyst re-runs it per reference (the
  curriculum sweep caught the gate running 2-4x inside the prefix
  sum).  Every stage boundary here is a skinny eager localCheckpoint
  (verdict table, survivor ids, per-doc token counts) — corpus text is
  never checkpointed, and tests/test_plans.py asserts the final plan
  holds no gate/dedup/BPE subtree.
- LOST PROJECTION PUSHDOWN: each stage re-reads the documents table
  through its own narrow projection (text for shingling/fitting,
  doc_id+source for planning) joined against the checkpointed skinny
  survivor ids, so the parquet scans stay column-pruned instead of
  dragging one wide row through the whole DAG.

Reference parity: the reference engine has no curation pipeline (SURVEY
§2 north-star extension); stage semantics are pinned by the component
operators' oracles, and the composed oracle below chains the SAME
generated CTEs (gate, shingle/cluster labels, BPE stages) scoped to
each stage's survivor set, so the composition cannot drift from its
parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.expressions import det_hash_hex, hex4_to_int
from ..plans.explain import checkpoint_stage
from ..sources.tables import load_table
from . import Registry
from .dedup import (
    _CLUSTER_LABELS_SQL,
    JACCARD_TAU,
    NGRAM_N,
    _grams_expr,
    _kept_shingles,
    _pair_jaccard,
    _shingles_sql,
    min_label_labels,
)
from .packing import (
    CURR_T1,
    CURR_T2,
    CURR_TIER_STRIDE,
    EPOCH_BUDGET_FACTOR,
    MAX_EPOCHS,
    N_SHARDS,
    SEQ_LEN,
    _epoch_u16,
    _hex4_sql,
    _mult_case_sql,
    exclusive_prefix_sum,
)
from .sketches import _hex8_sql
from .text import _bpe_cte_stages, _quality_gate_sql

REG = Registry()


def _curate_oracle_sql() -> str:
    """One generated chain: the gate CTE, the shingle/cluster-label CTEs
    scoped to gated docs, keep-best ranking, the BPE fit stages scoped
    to the surviving docs, token metering, the curriculum prefix sum,
    and the per-source epoch plan — each block the SAME SQL its
    standalone oracle uses."""
    bpe_stages, fitted = _bpe_cte_stages(docs_rel="sdocs")
    return f"""
    WITH RECURSIVE
    gate AS MATERIALIZED ({_quality_gate_sql()}),
    gdocs AS MATERIALIZED (
        SELECT d.doc_id, d.text, d.source
        FROM documents d JOIN gate g ON d.doc_id = g.doc_id AND g.passed
    ),
    {_shingles_sql(docs_rel="gdocs")},
    {_CLUSTER_LABELS_SQL},
    wc AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                   AS word_count
        FROM gdocs
    ),
    lab AS (
        SELECT w.doc_id, COALESCE(l.cluster_id, w.doc_id) AS cluster_id, w.word_count
        FROM wc w LEFT JOIN labels l ON w.doc_id = l.doc_id
    ),
    rnk AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY word_count DESC, doc_id) AS rn
        FROM lab
    ),
    reps AS MATERIALIZED (SELECT doc_id FROM rnk WHERE rn = 1),
    sdocs AS MATERIALIZED (SELECT g.* FROM gdocs g JOIN reps USING (doc_id)),
    {bpe_stages},
    enc AS MATERIALIZED (
        SELECT d.doc_id, CAST(SUM(len(string_split(t.toks, ' '))) AS BIGINT) AS n_tokens
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM sdocs) d
        JOIN {fitted} t USING (word)
        WHERE length(d.word) > 0
        GROUP BY d.doc_id
    ),
    tiered AS (
        SELECT e.doc_id, e.n_tokens,
               CASE WHEN g.avg_logprob >= {CURR_T1!r} THEN 0
                    WHEN g.avg_logprob >= {CURR_T2!r} THEN 1
                    ELSE 2 END AS tier
        FROM enc e JOIN gate g ON e.doc_id = g.doc_id
    ),
    o AS (
        SELECT doc_id, tier, n_tokens,
               COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY tier, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS start_offset
        FROM tiered
    ),
    src AS MATERIALIZED (
        SELECT s.doc_id, s.source, d.lang FROM sdocs s JOIN documents d USING (doc_id)
    ),
    tot AS (
        SELECT s.source, SUM(e.n_tokens) AS t
        FROM enc e JOIN src s USING (doc_id) GROUP BY s.source
    ),
    gg AS (SELECT SUM(t) AS total_tokens, COUNT(*) AS n_src FROM tot),
    rf AS (
        SELECT source,
               LEAST({MAX_EPOCHS}, ({EPOCH_BUDGET_FACTOR} * total_tokens / n_src) / t) AS r
        FROM tot, gg
    ),
    eplan AS (
        SELECT o.doc_id, s.source, s.lang AS domain,
               CAST(o.tier AS BIGINT) AS tier, o.n_tokens,
               o.start_offset,
               o.start_offset // {SEQ_LEN} AS start_seq,
               (o.start_offset + o.n_tokens - 1) // {SEQ_LEN} AS end_seq,
               (o.start_offset + o.n_tokens - 1) // {SEQ_LEN}
                   - o.start_offset // {SEQ_LEN} + 1 AS n_seqs,
               ROUND(rf.r, 6) AS repeat_factor,
               CAST(FLOOR(rf.r) AS BIGINT)
                   + CASE WHEN {_epoch_u16("o.doc_id")}
                               < CAST(ROUND((rf.r - FLOOR(rf.r)) * 65536, 0) AS BIGINT)
                          THEN 1 ELSE 0 END AS n_copies,
               (CAST(FLOOR(rf.r) AS BIGINT)
                   + CASE WHEN {_epoch_u16("o.doc_id")}
                               < CAST(ROUND((rf.r - FLOOR(rf.r)) * 65536, 0) AS BIGINT)
                          THEN 1 ELSE 0 END) * o.n_tokens AS planned_tokens
        FROM o JOIN src s ON o.doc_id = s.doc_id JOIN rf ON s.source = rf.source
    ),
    mix AS (
        SELECT p0.*,
               {_mult_case_sql("domain")} AS mult
        FROM (SELECT eplan.*,
                     {_hex4_sql("md5('mix-' || CAST(doc_id AS VARCHAR))")} AS u16
              FROM eplan) p0
    ),
    cop AS (
        SELECT mix.*, CAST(epoch_copy AS BIGINT) AS epoch_copy
        FROM mix, UNNEST(range(1, n_copies + 1)) t(epoch_copy)
    ),
    sam AS (
        SELECT cop.*, CAST(replica AS BIGINT) AS replica,
               md5('currep-' || CAST(doc_id AS VARCHAR) || '-'
                   || CAST(epoch_copy AS VARCHAR) || '-'
                   || CAST(replica AS VARCHAR)) AS sample_id
        FROM cop, UNNEST(range(1, mult + 1)) t2(replica)
    ),
    sh AS (
        SELECT sam.*, md5('shard-' || sample_id) AS hx,
               CAST({_hex8_sql("md5('shard-' || sample_id)")} % {N_SHARDS} AS BIGINT)
                   AS shard_id
        FROM sam
    )
    SELECT doc_id, source, domain, tier, n_tokens, start_offset, start_seq,
           end_seq, n_seqs, repeat_factor, n_copies, planned_tokens,
           epoch_copy, replica, sample_id, shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY hx, sample_id)
                AS BIGINT) AS pos_in_shard
    FROM sh
    """


@REG.add(
    "pipe_curate_end_to_end",
    _curate_oracle_sql(),
    doc="The COMPLETE curation pipeline as one driver-checked DAG: "
    "quality-gate the corpus, near-dup cluster the survivors and keep "
    "one best representative per cluster, fit the BPE tokenizer ON the "
    "curated corpus and meter every survivor in BPE tokens, curriculum-"
    "pack survivors into fixed-length training sequences (tiered by the "
    "gate's LM score), assign per-source epoch/repeat factors under "
    "the token budget, then MATERIALIZE the training-sample manifest: "
    "epoch copies x domain-mix replicas (pipe_domain_mix's policy), "
    "each sample with a stable md5 id, shard of 64, and position in "
    "shard (pipe_shard_assign's reproducible global shuffle) — one row "
    "per final training sample carrying its doc's tier, token count, "
    "packed-sequence span, and repeat plan.  Scale "
    "shape: each stage boundary is a SKINNY eager checkpoint (verdict, "
    "survivor ids, per-doc token counts — never text), so no stage "
    "re-executes inside a downstream fan-out (the trap the curriculum "
    "sweep caught live) and the final plan is two broadcast joins over "
    "the checkpointed token table; every documents re-scan is a narrow "
    "pruned projection joined to the checkpointed id table.",
)
def pipe_curate_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _bpe_fit_docs, pipe_quality_gate

    # STAGE 1 — gate.  Checkpoint the skinny verdict once (the
    # pipe_curriculum_pack lesson: filtering the live gate plan loses
    # the bigram-LM ReusedExchange and re-executes the gate per branch).
    gate = checkpoint_stage(
        pipe_quality_gate(spark, sf_dir).select("doc_id", "avg_logprob", "passed"),
        "stage1_gate_verdict",
    )
    gated = gate.filter("passed").select("doc_id", "avg_logprob")

    docs = load_table(spark, sf_dir, "documents")
    # narrow text projection joined to the gated id set — the shingle
    # scan reads only survivors' text
    gdocs = docs.select("doc_id", "text").join(gated.select("doc_id"), "doc_id")

    # STAGE 2 — keep-best near-dup dedup among gated docs (the
    # dedup_keep_best composition, scoped to stage-1 survivors).
    words = gdocs.select("doc_id", F.split("text", " ").alias("words")).filter(
        F.size("words") >= NGRAM_N
    )
    shingles = words.select("doc_id", F.explode(_grams_expr()).alias("s"))
    pairs = (
        _pair_jaccard(_kept_shingles(shingles))
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
    )
    clusters = min_label_labels(pairs, "doc_id")
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    wc = gdocs.select("doc_id", (spaces + 1).cast("long").alias("word_count"))
    lab = wc.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    best_first = Window.partitionBy("cluster_id").orderBy(
        F.col("word_count").desc(), "doc_id"
    )
    # checkpoint the SKINNY survivor id table: stages 3-5 reference it
    # from four different subtrees (fit vocab scan, encode scan, source
    # map, final join) — without this the whole gate+dedup DAG would
    # re-execute per reference
    reps = checkpoint_stage(
        lab.withColumn("rn", F.row_number().over(best_first))
        .filter(F.col("rn") == 1)
        .select("doc_id"),
        "stage2_keepbest_survivors",
    )
    sdocs = docs.select("doc_id", "text").join(reps, "doc_id")

    # STAGE 3 — BPE fit on the curated corpus + per-doc token metering.
    _merges, vocab = _bpe_fit_docs(sdocs)
    mapping = vocab.select(
        "word", F.size(F.split("toks", " ")).cast("long").alias("word_toks")
    )
    doc_words = sdocs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    enc = (
        doc_words.join(F.broadcast(mapping), "word")
        .groupBy("doc_id")
        .agg(F.sum("word_toks").cast("long").alias("n_tokens"))
    )
    # skinny (doc_id, n_tokens): the prefix sum reads its input from
    # two branches per level, and the epoch aggregate reads it again
    enc = checkpoint_stage(enc, "stage3_bpe_token_meter")

    # STAGE 4 — curriculum pack (tier from the gate's LM score, offsets
    # in BPE tokens via the recursive distributed prefix sum).
    tiered = enc.join(gated, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.when(F.col("avg_logprob") >= CURR_T1, 0)
        .when(F.col("avg_logprob") >= CURR_T2, 1)
        .otherwise(2)
        .cast("long")
        .alias("tier"),
    )
    keyed = tiered.withColumn(
        "curr_id", F.col("tier") * F.lit(CURR_TIER_STRIDE) + F.col("doc_id")
    )
    packed = exclusive_prefix_sum(keyed, "curr_id", "n_tokens", "start_offset")

    # STAGE 5 — epoch plan per source over the curated corpus, budgets
    # in BPE tokens (pipe_epoch_plan's formula on stage-3 counts).
    # The (doc_id, source) map is read from three branches (the final
    # join, the per-source totals, and the grand total under them) —
    # checkpoint the skinny projection so the final plan contains no
    # parquet scan at all, only the stage-boundary RDDs.
    src = checkpoint_stage(
        docs.select("doc_id", "source", "lang").join(reps, "doc_id"),
        "stage5_source_map",
    )
    toks = enc.join(src, "doc_id")
    tot = toks.groupBy("source").agg(F.sum("n_tokens").alias("t"))
    g = tot.agg(F.sum("t").alias("total_tokens"), F.count("*").alias("n_src"))
    rf = tot.crossJoin(F.broadcast(g)).select(
        "source",
        F.least(
            F.lit(MAX_EPOCHS),
            (F.lit(EPOCH_BUDGET_FACTOR) * F.col("total_tokens") / F.col("n_src"))
            / F.col("t"),
        ).alias("r"),
    )
    u16 = hex4_to_int(det_hash_hex("doc_id", seed="epoch"))
    thr = F.round((F.col("r") - F.floor("r")) * 65536, 0).cast("long")
    n_copies = F.floor("r").cast("long") + F.when(u16 < thr, 1).otherwise(0)

    start_seq = F.expr(f"start_offset div {SEQ_LEN}")
    end_seq = F.expr(f"(start_offset + n_tokens - 1) div {SEQ_LEN}")
    plan = (
        packed.join(src, "doc_id")
        .join(F.broadcast(rf), "source")
        .select(
            "doc_id",
            "source",
            F.col("lang").alias("domain"),
            "tier",
            "n_tokens",
            "start_offset",
            start_seq.alias("start_seq"),
            end_seq.alias("end_seq"),
            (end_seq - start_seq + 1).alias("n_seqs"),
            F.round("r", 6).alias("repeat_factor"),
            n_copies.alias("n_copies"),
            (n_copies * F.col("n_tokens")).alias("planned_tokens"),
        )
    )

    # STAGE 6 — materialize the training-sample manifest (round-7
    # VERDICT #6: the real job ends in mixed, sharded output): the epoch
    # plan's n_copies explode into per-epoch sample copies, the domain-
    # mix multiplier (pipe_domain_mix's policy on the lang column, same
    # 'mix' seed) replicates each copy, and every final sample gets a
    # deterministic md5 id, an md5-derived shard of {N_SHARDS}, and a
    # position within its shard (pipe_shard_assign's reproducible
    # global shuffle — the only window partitions by shard_id, so
    # shards order independently in parallel).  Both explodes are
    # narrow maps over the already-checkpointed per-doc plan; zero
    # additional scans.
    mixed = plan.withColumn(
        "u16", hex4_to_int(det_hash_hex("doc_id", seed="mix"))
    ).withColumn("mult", F.expr(_mult_case_sql("domain")))
    copies = mixed.select(
        *plan.columns,
        "mult",
        F.explode(
            F.when(
                F.col("n_copies") >= 1, F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ).otherwise(F.array().cast("array<long>"))
        ).alias("epoch_copy"),
    )
    samples = copies.select(
        *plan.columns,
        "epoch_copy",
        F.explode(
            F.when(
                F.col("mult") >= 1,
                F.sequence(F.lit(1).cast("long"), F.col("mult").cast("long")),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("replica"),
    ).withColumn(
        "sample_id",
        F.md5(
            F.concat(
                F.lit("currep-"),
                F.col("doc_id").cast("string"),
                F.lit("-"),
                F.col("epoch_copy").cast("string"),
                F.lit("-"),
                F.col("replica").cast("string"),
            )
        ),
    )
    sharded = samples.withColumn(
        "hx", F.md5(F.concat(F.lit("shard-"), F.col("sample_id")))
    ).withColumn(
        "shard_id", F.conv(F.substring("hx", 1, 8), 16, 10).cast("long") % N_SHARDS
    )
    w = Window.partitionBy("shard_id").orderBy("hx", "sample_id")
    return sharded.select(
        *plan.columns,
        "epoch_copy",
        "replica",
        "sample_id",
        "shard_id",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )
