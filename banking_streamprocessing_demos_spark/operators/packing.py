"""Sequence packing for LLM pretraining (round-2 extension): concatenate
the corpus in doc_id order and chunk it into fixed-length training
sequences — the "concat and chunk" layout every large-scale pretraining
pipeline needs.  Output: each document's global token offset and the
range of training sequences it lands in.

Scale stance: the naive formulation is a running sum over a GLOBAL
total order — a single-partition window that serializes the corpus
through one task.  Implemented instead as a RECURSIVE distributed
prefix sum (``exclusive_prefix_sum``), entirely declarative:

1. bucket rows by ``id // BUCKET`` and aggregate per-bucket totals
   (one map-side-combined shuffle, fully parallel);
2. exclusive-prefix the bucket totals by RECURSING on the bucket
   table — with the default 3 levels the recursion base (the only
   non-partitioned window) sees N/BUCKET^2 rows: ~6k rows at 10^11
   documents, never the corpus;
3. within-bucket exclusive prefix (window partitioned by bucket, fully
   parallel) + join the bucket offsets back (tiny side, broadcast).

Offsets are pure integer arithmetic — deterministic under any
partitioning, no sampled range boundaries, no partition-id coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import Registry
from .sketches import _hex8_sql
from .text import BIGRAM_LM_SQL, _quality_gate_sql

REG = Registry()

SEQ_LEN = 2048  # tokens per packed training sequence
BUCKET = 4096  # docs per prefix-sum bucket (fan-in per recursion level)
PREFIX_LEVELS = 3  # doc -> bucket -> super-bucket; base table = N/BUCKET^2 rows


def exclusive_prefix_sum(
    df: DataFrame,
    id_col: str,
    val_col: str,
    out_col: str,
    fanin: int = BUCKET,
    levels: int = PREFIX_LEVELS,
) -> DataFrame:
    """Distributed exclusive prefix sum of ``val_col`` in ``id_col`` order,
    as a ``levels``-deep recursive bucket decomposition:

    - base (levels == 1): one global window over the input — only ever
      reached on a table already reduced to N/fanin^(levels-1) rows;
    - recurse: per-bucket totals (map-side-combined groupBy), exclusive
      prefix of the bucket totals at levels-1, a PARTITIONED within-bucket
      window, and a broadcast join of the bucket base offsets.

    With the defaults (fanin 4096, 3 levels) the single-partition window
    sees N/16.8M rows — ~6k rows at 10^11 documents — so there is no
    unbounded single-task stage at any realistic corpus size; pass a
    higher ``levels`` to recurse further.  Offsets are exact integer
    arithmetic, deterministic under any partitioning."""
    if levels <= 1:
        w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
        return df.withColumn(out_col, F.coalesce(F.sum(val_col).over(w), F.lit(0)))

    # level-scoped names so the recursion (whose id_col IS a bucket col)
    # never collides with this level's columns
    b, btot, boff = f"__b{levels}", f"__btot{levels}", f"__boff{levels}"
    bucketed = df.withColumn(b, F.expr(f"{id_col} div {fanin}"))
    totals = bucketed.groupBy(b).agg(F.sum(val_col).alias(btot))
    offsets = exclusive_prefix_sum(totals, b, btot, boff, fanin, levels - 1)
    wd = (
        Window.partitionBy(b)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(val_col).over(wd), F.lit(0))
    return (
        bucketed.join(F.broadcast(offsets.select(b, boff)), b)
        .withColumn(out_col, F.col(boff) + within)
        .drop(b, boff)
    )


@REG.add(
    "pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        FROM documents
    ),
    o AS (
        SELECT doc_id, n_tokens,
               COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS start_offset
        FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {SEQ_LEN} AS start_seq,
           (start_offset + n_tokens - 1) // {SEQ_LEN} AS end_seq,
           (start_offset + n_tokens - 1) // {SEQ_LEN} - start_offset // {SEQ_LEN} + 1 AS n_seqs
    FROM o
    """,
    doc=f"Concat-and-chunk sequence packing (seq len {SEQ_LEN}, whitespace tokens, "
    "same count as text_token_counts.n_tokens_ws): global token offset per doc via "
    "a two-level distributed prefix sum, then the packed-sequence id range each "
    "document spans.  The oracle states the same offsets as one naive window.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (spaces + 1).cast("long").alias("n_tokens")
    )
    # three-level recursive prefix sum: the only non-partitioned window
    # runs over the N/BUCKET^2-row super-bucket table (plan-asserted in
    # tests/test_plans.py) — no unbounded single-task stage at any size
    out = exclusive_prefix_sum(docs, "doc_id", "n_tokens", "start_offset").select(
        "doc_id", "n_tokens", "start_offset"
    )
    # integer `div` end-to-end: float division is exact only below 2^53
    # cumulative tokens, which a 100 TB corpus exceeds
    start_seq = F.expr(f"start_offset div {SEQ_LEN}")
    end_seq = F.expr(f"(start_offset + n_tokens - 1) div {SEQ_LEN}")
    return out.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        start_seq.alias("start_seq"),
        end_seq.alias("end_seq"),
        (end_seq - start_seq + 1).alias("n_seqs"),
    )


# ---------------------------------------------------------------------------
# domain mixing: deterministic up/down-sampling to target mix weights
# ---------------------------------------------------------------------------
# weight w per domain: every doc yields floor(w) replicas plus one more
# for the deterministic fraction of docs selected by u16 < frac*65536 —
# so fr (0.5) is DOWN-sampled to half and zh (3.0) up-sampled 3x, the
# exact mechanics of pretraining data-mixture rebalancing
PIPE_MIX = {"en": 1.0, "de": 1.5, "es": 2.25, "fr": 0.5, "zh": 3.0}

_HEX = "0123456789abcdef"


def _hex4_sql(hexpr: str) -> str:
    """First 4 md5 hex digits -> int in [0, 65535] — delegates to the
    shared functions/expressions.py::hex4_sql (single source beside its
    Spark twin hex4_to_int; round-10 de-cycling)."""
    from ..functions.expressions import hex4_sql

    return hex4_sql(hexpr)


def _mult_case_sql(col: str = "lang") -> str:
    """Replica multiplier per domain: base + fractional Bernoulli via an
    INTEGER threshold on u16 (frac*65536 is exact) — no float compares,
    bit-identical across engines.  ``col`` names the domain column
    (the curate DAG carries it as ``domain``)."""
    branches = []
    for lang, wgt in PIPE_MIX.items():
        base = int(wgt)
        thr = int(round((wgt - base) * 65536))
        expr = f"{base} + CASE WHEN u16 < {thr} THEN 1 ELSE 0 END" if thr else str(base)
        branches.append(f"WHEN '{lang}' THEN {expr}")
    return f"CASE {col} " + " ".join(branches) + " ELSE 1 END"


@REG.add(
    "pipe_domain_mix",
    f"""
    WITH hashed AS (
        SELECT doc_id, lang, md5('mix-' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ),
    u AS (SELECT doc_id, lang, {_hex4_sql('hx')} AS u16 FROM hashed),
    m AS (SELECT doc_id, lang, {_mult_case_sql()} AS mult FROM u)
    SELECT doc_id, lang AS domain, CAST(replica AS BIGINT) AS replica,
           md5('mixrep-' || CAST(doc_id AS VARCHAR) || '-' || CAST(replica AS VARCHAR))
               AS sample_id
    FROM m, UNNEST(range(1, mult + 1)) AS t(replica)
    """,
    doc="Training-mixture rebalancing: per-domain target weights become "
    "deterministic replica counts (floor + md5-thresholded fractional part), "
    "materialized by exploding a per-row sequence — a NARROW map (no shuffle), "
    "so remixing a 100 TB corpus costs one pass.  Replicas carry stable md5 "
    "sample ids for downstream shuffling/sharding.",
)
def pipe_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.expressions import det_hash_hex, hex4_to_int

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    u = docs.withColumn("u16", hex4_to_int(det_hash_hex("doc_id", seed="mix")))
    m = u.withColumn("mult", F.expr(_mult_case_sql()))
    replicas = m.select(
        "doc_id",
        F.col("lang").alias("domain"),
        F.explode(
            F.when(F.col("mult") >= 1, F.sequence(F.lit(1), F.col("mult"))).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("replica"),
    )
    return replicas.select(
        "doc_id",
        "domain",
        F.col("replica").cast("long").alias("replica"),
        F.md5(
            F.concat(
                F.lit("mixrep-"),
                F.col("doc_id").cast("string"),
                F.lit("-"),
                F.col("replica").cast("string"),
            )
        ).alias("sample_id"),
    )


# ---------------------------------------------------------------------------
# quality pruning: keep the top fraction of each domain by LM score
# ---------------------------------------------------------------------------
PRUNE_KEEP_FRAC = 0.8  # keep top 80% per domain


@REG.add(
    "pipe_quality_prune",
    f"""
    WITH lm AS ({BIGRAM_LM_SQL}),
    scored AS (
        SELECT d.doc_id, d.lang, lm.avg_logprob,
               ROW_NUMBER() OVER (PARTITION BY d.lang
                                  ORDER BY lm.avg_logprob DESC, d.doc_id) AS rank_in_domain,
               COUNT(*) OVER (PARTITION BY d.lang) AS n_domain
        FROM documents d JOIN lm USING (doc_id)
    )
    SELECT doc_id, lang, avg_logprob, rank_in_domain
    FROM scored
    WHERE rank_in_domain <= CAST(ceil({PRUNE_KEEP_FRAC} * n_domain) AS BIGINT)
    """,
    doc=f"Perplexity-style quality pruning (CCNet/FineWeb recipe): rank each "
    f"domain's documents by the corpus-bigram LM score and keep the top "
    f"{PRUNE_KEEP_FRAC:.0%} (doc_id tiebreak — fully deterministic).  The rank "
    "window partitions by domain, so pruning parallelizes across domains; at "
    "skewed domain sizes the per-domain threshold would be computed from an "
    "approx-quantile pre-pass instead of a full sort (documented trade-off; "
    "the windowed form is the exact-oracle-checkable variant).",
)
def pipe_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import text_bigram_lm_score

    lm = text_bigram_lm_score(spark, sf_dir).select("doc_id", "avg_logprob")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.col("avg_logprob").desc(), "doc_id")
    wc = Window.partitionBy("lang")
    scored = (
        docs.join(lm, "doc_id")
        .withColumn("rank_in_domain", F.row_number().over(w))
        .withColumn("n_domain", F.count("*").over(wc))
    )
    return scored.filter(
        F.col("rank_in_domain") <= F.ceil(PRUNE_KEEP_FRAC * F.col("n_domain")).cast("long")
    ).select("doc_id", "lang", "avg_logprob", "rank_in_domain")


# ---------------------------------------------------------------------------
# shard assignment: deterministic global shuffle into training shards
# ---------------------------------------------------------------------------
N_SHARDS = 64


@REG.add(
    "pipe_shard_assign",
    f"""
    WITH hashed AS (
        SELECT doc_id,
               md5('shard-' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, hx,
               {_hex8_sql('hx')} % {N_SHARDS} AS shard_id
        FROM hashed
    )
    SELECT doc_id, shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY hx, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM keyed
    """,
    doc=f"Training-shard assignment ({N_SHARDS} shards): every document lands in "
    "md5-derived shard with a deterministic position given by the hash order — "
    "a reproducible GLOBAL shuffle of the corpus (the write-out step before "
    "pretraining) without any global sort: the only window partitions by "
    "shard_id, so shards order independently in parallel.  Shard count is a "
    "constant here; at 100 TB you raise it so each shard's sort fits an "
    "executor (the pattern recurses like pack_sequences if not).",
)
def pipe_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hx = F.md5(F.concat(F.lit("shard-"), F.col("doc_id").cast("string")))
    keyed = docs.withColumn("hx", hx).withColumn(
        "shard_id", F.conv(F.substring("hx", 1, 8), 16, 10).cast("long") % N_SHARDS
    )
    w = Window.partitionBy("shard_id").orderBy("hx", "doc_id")
    return keyed.select(
        "doc_id", "shard_id", F.row_number().over(w).cast("long").alias("pos_in_shard")
    )


# ---------------------------------------------------------------------------
# epoch/repeat planning under a fixed token budget (round-4 extension)
# ---------------------------------------------------------------------------
EPOCH_BUDGET_FACTOR = 2.0  # token budget = factor x corpus tokens
MAX_EPOCHS = 4.0  # repeat ceiling per source (data-constrained scaling)


def _epoch_u16(col: str = "doc_id") -> str:
    return _hex4_sql(f"md5('epoch-' || CAST({col} AS VARCHAR))")


@REG.add(
    "pipe_epoch_plan",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    tot AS (SELECT source, SUM(n_tokens) AS t FROM toks GROUP BY source),
    g AS (SELECT SUM(t) AS total_tokens, COUNT(*) AS n_src FROM tot),
    rf AS (
        SELECT source,
               LEAST({MAX_EPOCHS},
                     ({EPOCH_BUDGET_FACTOR} * total_tokens / n_src) / t) AS r
        FROM tot, g
    )
    SELECT k.doc_id, k.source, k.n_tokens,
           ROUND(rf.r, 6) AS repeat_factor,
           CAST(FLOOR(rf.r) AS BIGINT)
               + CASE WHEN {_epoch_u16()}
                           < CAST(ROUND((rf.r - FLOOR(rf.r)) * 65536, 0) AS BIGINT)
                      THEN 1 ELSE 0 END AS n_copies,
           (CAST(FLOOR(rf.r) AS BIGINT)
               + CASE WHEN {_epoch_u16()}
                           < CAST(ROUND((rf.r - FLOOR(rf.r)) * 65536, 0) AS BIGINT)
                      THEN 1 ELSE 0 END) * k.n_tokens AS planned_tokens
    FROM toks k JOIN rf USING (source)
    """,
    doc=f"Epoch/repeat planning under a fixed token budget (the data-"
    f"constrained-scaling question): per-source token totals -> repeat factor "
    f"r = min({MAX_EPOCHS}, fair-share / source-tokens) with budget = "
    f"{EPOCH_BUDGET_FACTOR}x corpus tokens split evenly across sources -> "
    "per-doc copy count floor(r) + deterministic fractional Bernoulli.  "
    "Unlike pipe_domain_mix (a FIXED replica policy, pure map), the policy "
    "here is DERIVED from the corpus: one map-side-combined per-source agg "
    "(rows = n_sources) broadcast back over a narrow map — remixing 100 TB "
    "costs one aggregate pass + one scan.  Over-represented sources get "
    "r < 1 (probabilistic downsampling), scarce ones repeat up to the "
    f"{MAX_EPOCHS}-epoch ceiling.  All arithmetic is IEEE +,*,/ on exact "
    "integer sums (no libm), and the Bernoulli threshold is an INTEGER u16 "
    "compare, so both engines agree bit-for-bit.",
)
def pipe_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.expressions import det_hash_hex, hex4_to_int

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + 1)
        .cast("long")
        .alias("n_tokens"),
    )
    tot = toks.groupBy("source").agg(F.sum("n_tokens").alias("t"))
    g = tot.agg(
        F.sum("t").alias("total_tokens"), F.count("*").alias("n_src")
    )
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
    return toks.join(F.broadcast(rf), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        F.round("r", 6).alias("repeat_factor"),
        n_copies.alias("n_copies"),
        (n_copies * F.col("n_tokens")).alias("planned_tokens"),
    )


# ---------------------------------------------------------------------------
# curriculum packing: quality-tier-ordered concat-and-chunk (round 5)
# ---------------------------------------------------------------------------
# tier thresholds on the 6dp-rounded corpus-bigram LM score (gate floor
# is QG_MIN_AVG_LOGPROB = -3.41; passing docs at the test SF span about
# [-3.41, -3.26], so these cut the gated corpus into ~thirds)
CURR_T1 = -3.37  # tier 0 (best): avg_logprob >= T1
CURR_T2 = -3.39  # tier 1: T2 <= avg_logprob < T1; tier 2: the rest
CURR_TIER_STRIDE = 1 << 40  # curriculum order id = tier * stride + doc_id


@REG.add(
    "pipe_curriculum_pack",
    f"""
    WITH gate AS ({_quality_gate_sql()}),
    toks AS (
        SELECT d.doc_id, g.avg_logprob,
               CAST(length(d.text) - length(replace(d.text, ' ', '')) + 1 AS BIGINT)
                   AS n_tokens
        FROM documents d JOIN gate g USING (doc_id)
        WHERE g.passed
    ),
    tiered AS (
        SELECT doc_id, n_tokens,
               CASE WHEN avg_logprob >= {CURR_T1!r} THEN 0
                    WHEN avg_logprob >= {CURR_T2!r} THEN 1
                    ELSE 2 END AS tier
        FROM toks
    ),
    o AS (
        SELECT doc_id, tier, n_tokens,
               COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY tier, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                        0) AS start_offset
        FROM tiered
    )
    SELECT doc_id, CAST(tier AS BIGINT) AS tier, n_tokens, start_offset,
           start_offset // {SEQ_LEN} AS start_seq,
           (start_offset + n_tokens - 1) // {SEQ_LEN} AS end_seq,
           (start_offset + n_tokens - 1) // {SEQ_LEN} - start_offset // {SEQ_LEN} + 1
               AS n_seqs
    FROM o
    """,
    doc=f"CURRICULUM packing (pack_sequences ∘ pipe_quality_gate, the round-4 "
    "verdict's suggested composition): gate the corpus with the composed "
    "quality classifier, bucket survivors into quality TIERS by fixed "
    "thresholds on the 6dp-rounded bigram-LM score (best tier first — "
    "easy-to-hard curriculum ordering for pretraining), then concat-and-"
    "chunk tier by tier.  The curriculum total order is (tier, doc_id), "
    f"realized as the integer key tier*2^40 + doc_id fed to the SAME "
    "recursive distributed prefix sum as pack_sequences — fixed tier "
    "thresholds mean NO global sort and no quantile pass; the only new "
    "cost over pack_sequences is the gate itself.  Offsets are exact "
    "integer arithmetic; the oracle states them with one naive window.",
)
def pipe_curriculum_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import pipe_quality_gate

    # Materialize the gate's NATURAL plan once, then filter the
    # materialized rows.  Filtering/pruning the live gate plan instead
    # perturbs its subtrees so the corpus-bigram explode loses its
    # ReusedExchange and runs twice — measured 13.8s for the pruned
    # plan vs 8.7s for the full gate at a x10 corpus — and the prefix
    # sum below would re-execute that doubled plan in both of its
    # branches.  One checkpoint of the skinny verdict table makes the
    # whole composition cost gate + epsilon.  This executes the gate at
    # DataFrame-CONSTRUCTION time (plan dumps and .explain pay it too);
    # eager=False does NOT avoid that under AQE — checkpointing needs the
    # finalized RDD and AQE finalization executes the query stages, so
    # the lazy form was measured running the same jobs at construction
    # (14 jobs / 7.5 s at x10).  A .cache() would be lazy but persists by
    # LOGICAL PLAN, silently warming repeated calls in one session (the
    # round-5 bench-masking gotcha) — eager checkpoint of a fresh RDD per
    # call keeps every invocation honestly cold.
    gate_full = (
        pipe_quality_gate(spark, sf_dir)
        .select("doc_id", "avg_logprob", "passed")
        .localCheckpoint(eager=True)
    )
    gate = gate_full.filter("passed").select("doc_id", "avg_logprob")
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (spaces + 1).cast("long").alias("n_tokens")
    )
    tiered = docs.join(gate, "doc_id").select(
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
    # (exclusive_prefix_sum consumes keyed in two branches per level;
    # with the gate checkpointed above, keyed is just a documents scan
    # + broadcast join — cheap to evaluate twice.)
    out = exclusive_prefix_sum(keyed, "curr_id", "n_tokens", "start_offset")
    start_seq = F.expr(f"start_offset div {SEQ_LEN}")
    end_seq = F.expr(f"(start_offset + n_tokens - 1) div {SEQ_LEN}")
    return out.select(
        "doc_id",
        "tier",
        "n_tokens",
        "start_offset",
        start_seq.alias("start_seq"),
        end_seq.alias("end_seq"),
        (end_seq - start_seq + 1).alias("n_seqs"),
    )


# ---------------------------------------------------------------------------
# temperature (alpha) sampling (round 9): the OTHER mixing policy — where
# pipe_domain_mix applies FIXED per-domain weights, alpha-sampling
# DERIVES them from the empirical distribution: q_i ∝ p_i^alpha
# (XLM-R / mT5 multilingual convention, alpha = 0.3), so rare domains
# are up-sampled toward uniform and dominant ones down-sampled, with
# the total expected sample budget preserved (sum n_i * w_i = N).
# ---------------------------------------------------------------------------

MIX_ALPHA = "0.3"


def _tmix_weights_sql() -> str:
    """Per-domain alpha-sampling weight CTEs, INTEGER MICRO-UNITS end
    to end: s_int = round6(p_i^alpha)*1e6 (the one libm call,
    6dp-rounded into DECIMAL then scaled exactly), z_int = exact
    integer sum, and the weight w_i = (s_i/z)*N/n_i is carried as
    w_micro — the half-away-rounded integer
    (2*s_int*N*1e6 + z_int*n_i) // (2*z_int*n_i), never a
    ROUND-of-DOUBLE.  The first cut rounded the rational w_i through
    double ROUND in both engines — the exact cross-engine 6dp-tie
    disagreement class the repo's _avg6_sql docstring records as
    fuzz-found REAL (round-9 self-review finding).  The wide products
    ride HUGEINT here and DECIMAL(38,0) on the Spark side (bound:
    2e12 * n_tot, i.e. safe past 1e25 corpus tokens)."""
    return f"""
    stats AS (
        SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_i
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n_tot FROM stats),
    s AS (
        SELECT lang, n_i,
               CAST(CAST(ROUND(POWER(CAST(n_i AS DOUBLE) / n_tot, {MIX_ALPHA}), 6)
                         AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS s_int
        FROM stats CROSS JOIN tot
    ),
    z AS (SELECT CAST(SUM(s_int) AS BIGINT) AS z_int FROM s),
    w AS (
        SELECT lang, n_i,
               CAST((2 * CAST(s_int AS HUGEINT) * n_tot * 1000000
                     + CAST(z_int AS HUGEINT) * n_i)
                    // (2 * CAST(z_int AS HUGEINT) * n_i) AS BIGINT) AS w_micro
        FROM s CROSS JOIN z CROSS JOIN tot
    )"""


def tmix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, w_micro): the alpha-sampling weight table derived from the
    BASE corpus — shared by the batch materialization below and the
    streaming drift monitor (streaming_queries.streaming_temperature_mix),
    which broadcasts it as the FROZEN policy side."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    stats = docs.groupBy("lang").agg(F.sum("dl").cast("long").alias("n_i"))
    tot = stats.agg(F.sum("n_i").cast("long").alias("n_tot"))
    s = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_i",
        "n_tot",
        (
            F.round(F.pow(F.col("n_i").cast("double") / F.col("n_tot"), float(MIX_ALPHA)), 6)
            .cast("decimal(18,6)")
            * 1000000
        )
        .cast("bigint")
        .alias("s_int"),
    )
    z = s.agg(F.sum("s_int").cast("bigint").alias("z_int"))
    # half-away-rounded integer micro-weight, wide products in
    # DECIMAL(38,0) (DuckDB twin rides HUGEINT) — see _tmix_weights_sql
    return s.crossJoin(F.broadcast(z)).selectExpr(
        "lang",
        "CAST((2 * CAST(s_int AS DECIMAL(38,0)) * n_tot * 1000000"
        "      + CAST(z_int AS DECIMAL(38,0)) * n_i)"
        "     div (2 * CAST(z_int AS DECIMAL(38,0)) * n_i) AS BIGINT) AS w_micro",
    )


@REG.add(
    "pipe_temperature_mix",
    f"""
    WITH {_tmix_weights_sql()},
    hashed AS (
        SELECT doc_id, lang, md5('tmix-' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ),
    u AS (SELECT doc_id, lang, {_hex4_sql('hx')} AS u16 FROM hashed),
    m AS (
        SELECT u.doc_id, u.lang, w.w_micro,
               CAST(w.w_micro // 1000000 AS INT)
               + CASE WHEN u.u16 < ((w.w_micro % 1000000) * 65536) // 1000000
                      THEN 1 ELSE 0 END AS mult
        FROM u JOIN w ON u.lang = w.lang
    )
    SELECT doc_id, lang AS domain,
           CAST(w_micro AS DOUBLE) / 1000000 AS weight,
           CAST(replica AS BIGINT) AS replica,
           md5('tmixrep-' || CAST(doc_id AS VARCHAR) || '-' || CAST(replica AS VARCHAR))
               AS sample_id
    FROM m, UNNEST(range(1, mult + 1)) AS t(replica)
    """,
    doc=f"Temperature (alpha={MIX_ALPHA}) mixture rebalancing — the "
    "policy that DERIVES the per-domain weights from the corpus itself "
    "(q_i proportional to p_i^alpha over token shares, the XLM-R/mT5 "
    "multilingual convention): rare domains up-sample toward uniform, "
    "dominant ones down-sample, expected total samples preserved "
    "(sum n_i*w_i = N).  The weight table is a 5-row broadcast derived "
    "from one skinny per-domain token aggregate; replica counts use "
    "pipe_domain_mix's exact mechanics (floor(w) + md5-u16 Bernoulli "
    "against an INTEGER threshold derived in-engine from the DECIMAL "
    "weight — no float compares), so remixing is one narrow pass at "
    "any corpus size.  The one libm call (p^alpha) is 6dp-rounded into "
    "DECIMAL before the exact normalization sum, the repo's standing "
    "LN treatment.",
)
def pipe_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.expressions import det_hash_hex, hex4_to_int

    w = tmix_weights(spark, sf_dir)
    u = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .withColumn("u16", hex4_to_int(det_hash_hex("doc_id", seed="tmix")))
    )
    thr = F.expr("((w_micro % 1000000) * 65536) div 1000000")
    m = u.join(F.broadcast(w), "lang").select(
        "doc_id",
        "lang",
        "w_micro",
        (
            F.expr("w_micro div 1000000").cast("int")
            + F.when(F.col("u16") < thr, 1).otherwise(0)
        ).alias("mult"),
    )
    replicas = m.select(
        "doc_id",
        F.col("lang").alias("domain"),
        (F.col("w_micro").cast("double") / 1000000).alias("weight"),
        F.explode(
            F.when(F.col("mult") >= 1, F.sequence(F.lit(1), F.col("mult"))).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("replica"),
    )
    return replicas.select(
        "doc_id",
        "domain",
        "weight",
        F.col("replica").cast("long").alias("replica"),
        F.md5(
            F.concat(
                F.lit("tmixrep-"),
                F.col("doc_id").cast("string"),
                F.lit("-"),
                F.col("replica").cast("string"),
            )
        ).alias("sample_id"),
    )


# ---------------------------------------------------------------------------
# per-source frequency cap (round 11): the MassiveText/Gopher "cap
# documents per domain" rule (Rae et al. 2021) — no single source may
# contribute more than SOURCE_CAP documents to the corpus, with the
# survivors chosen by a seeded uniform draw (random-within-domain, the
# paper's rule; a quality-ordered variant just swaps the rank key).
# Output is the DECISION TABLE (every doc with its within-source rank
# and kept flag), the priv_k_anonymity idiom: downstream consumes the
# decision, audit sees the why.
# ---------------------------------------------------------------------------

SOURCE_CAP = 15
SOURCE_CAP_SEED = "srccap"


@REG.add(
    "pipe_source_cap",
    f"""
    WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5('{SOURCE_CAP_SEED}-' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS src_rank
        FROM documents
    )
    SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
           src_rank <= {SOURCE_CAP} AS kept
    FROM r
    """,
    doc=f"Per-source frequency cap (Rae et al. 2021's MassiveText "
    f"cap-documents-per-domain rule): at most {SOURCE_CAP} documents "
    "survive per source, chosen by seeded md5-rank (random-within-"
    "domain per the paper; doc_id tiebreak) — the anti-domination "
    "guard that stops one crawl domain from flooding the mixture, "
    "complementing pipe_domain_mix (which rebalances BETWEEN domains, "
    "while this caps WITHIN one).  Emitted as the full decision table "
    "(rank + kept flag per document, the priv_k_anonymity idiom).  "
    "Scale shape: one hash-partitioned ranking exchange on SKINNY "
    "(doc_id, source) rows — the text never rides the shuffle; a "
    "pathological mega-source makes one hot partition, which at "
    "production scale is pre-split by the standing salting machinery "
    "(j8) or replaced by the sampled-threshold trick since ranks "
    "beyond the cap only need 'kept=false'.",
)
def pipe_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.expressions import det_hash_hex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        det_hash_hex("doc_id", seed=SOURCE_CAP_SEED), "doc_id"
    )
    return docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("src_rank"),
        (F.row_number().over(w) <= SOURCE_CAP).alias("kept"),
    )
