"""Deduplication operators for LLM-data pipelines (north-star extension):
exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-duplicate detection over ``documents`` / ``embeddings``.

Scale stance (100 TB):
- exact/fingerprint dedup is a hash groupBy — one shuffle on a 16-byte
  key, map-side combined;
- n-gram Jaccard is quadratic and exists as the *verifier* for LSH
  candidates, never run all-pairs at scale;
- MinHash+LSH is the scale path: shingle → K min-hashes → band buckets →
  candidate pairs via an equi-join on (band, bucket) — the all-pairs
  blowup is replaced by a join whose output is only the colliding pairs;
- SimHash gives a per-document 32-bit sketch; near-dup = Hamming ≤ k,
  found by banding the sketch the same way.

Determinism/portability: "hash functions" are md5 of seed-prefixed
strings, so DuckDB reproduces every signature bit-for-bit; lexicographic
MIN over hex strings is the MinHash permutation (a valid uniform order
on shingles), which both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.expressions import HEX_DIGITS as HEX
from ..sources.tables import load_table
from . import Registry

REG = Registry()

NGRAM_N = 3
JACCARD_TAU = 0.5
# Shingles shared by more than this many documents are dropped before
# any exact pair join: a stop-phrase shingle ("the end of") carries no
# Jaccard signal but makes the equi-join quadratic on its key — at
# corpus scale a single million-doc shingle is 10^12 pairs.  The cap
# bounds every shingle key's join fan-out to DF_CAP^2; near-duplicate
# pairs still share plenty of rarer shingles.  Applied identically in
# the oracles, so parity holds by construction.
SHINGLE_DF_CAP = 1000
MINHASH_K = 12  # 4 bands x 3 rows
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
COSINE_TAU = 0.45
SIMHASH_BITS = 32
# dedup_embedding_cosine is the EXACT all-pairs verifier — O(N^2) by
# design.  The guard refuses to run it past this corpus size so the
# quadratic join can never be pointed at a real corpus by accident;
# the scale paths are sim_ann_lsh / sim_ann_ivf in similarity.py.
EXACT_COSINE_MAX_ROWS = 100_000

# MinHash permutation family: each shingle is md5-hashed ONCE to a 32-bit
# integer v, and the K "permutations" are h_i(v) = (a_i*v + b_i) mod P —
# the standard universal-hashing construction, 12x less hashing than K
# independent md5s.  a_i < 2^20 keeps a_i*v < 2^52: exact in int64 for
# both engines, no overflow under ANSI arithmetic.
MH_P = 1_000_000_007
MH_A = [((i + 1) * 604_171) % 1_048_573 | 1 for i in range(MINHASH_K)]
MH_B = [((i + 1) * 390_419) % MH_P for i in range(MINHASH_K)]
# DuckDB twin of Spark's conv(substr(md5,1,8),16,10): positional hex decode
_HEX_DECODE = " + ".join(
    f"(strpos('{HEX}', substr(h, {p + 1}, 1)) - 1) * {16 ** (7 - p)}" for p in range(8)
)


# ---------------------------------------------------------------------------
# shared shingle SQL / DataFrame builders
# ---------------------------------------------------------------------------

def _shingles_raw_sql(docs_rel: str = "documents") -> str:
    """The ``shingles_raw`` CTE alone — per-doc DISTINCT word-NGRAM_N-gram
    shingles.  SINGLE textual source for every oracle that shingles a
    corpus (the batch chain below, the streaming minhash/keep-best
    replays): the gram expression is byte-sensitive (it feeds md5), so
    hand-synced copies are exactly how engines drift apart."""
    gram = " || ' ' || ".join(f"words[i+{k}]" for k in range(NGRAM_N))
    return f"""shingles_raw AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, {gram} AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {docs_rel}),
                 UNNEST(range(1, len(words) - {NGRAM_N} + 2)) AS t(i)
        )
    )"""


def _shingles_sql(df_cap: int = SHINGLE_DF_CAP, docs_rel: str = "documents") -> str:
    """CTE chain: raw distinct shingles, hot (df > cap) stop-shingles,
    df-capped ``shingles``, and per-doc ``sizes`` over the capped set.
    MinHash signatures read ``shingles_raw`` (the sketch is in-row and
    never joins); every exact pair join reads the capped ``shingles``.
    ``docs_rel`` scopes the corpus (pipe_curate_end_to_end shingles the
    GATED survivor set, not the raw table)."""
    return f"""
    {_shingles_raw_sql(docs_rel)},
    hot AS (SELECT s FROM shingles_raw GROUP BY s HAVING COUNT(*) > {df_cap}),
    shingles AS (SELECT * FROM shingles_raw ANTI JOIN hot USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id)
"""


_SHINGLES_SQL = _shingles_sql()


def _word_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition BEFORE the explode/hash pipeline: the local corpus is a
    # single input split, which would serialize shingling/hashing onto
    # one task; at cluster scale the scan is already parallel and this
    # moves raw text once
    return (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= NGRAM_N)
    )


def _grams_expr() -> F.Column:
    """DISTINCT word-3-gram shingle array from a ``words`` column —
    in-row (a document's shingles all live in its own array), so no
    corpus-wide distinct shuffle is ever needed."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size("words") - NGRAM_N),
        lambda i: F.concat_ws(
            " ", F.get("words", i), F.get("words", i + 1), F.get("words", i + 2)
        ),
    )
    return F.array_distinct(grams)


def _gram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document array of DISTINCT word-3-gram shingles (the in-row
    view the MinHash signature folds consume)."""
    return _word_docs(spark, sf_dir).select("doc_id", _grams_expr().alias("grams"))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded (doc_id, shingle) pairs — the join-shaped view used by the
    exact-Jaccard verifier stages.

    The explode wraps the gram EXPRESSION directly, never a previously-
    projected array column: whole-stage codegen inlines a projected
    array alias into the generate loop and re-evaluates the whole
    array construction once per OUTPUT row — measured 15x slower
    (32s -> 2.2s on the 10x corpus) than the direct form, which
    builds each document's array once."""
    return _word_docs(spark, sf_dir).select(
        "doc_id", F.explode(_grams_expr()).alias("s")
    )


def _hot_shingles(shingles: DataFrame, df_cap: int) -> DataFrame:
    """Shingle keys whose document frequency exceeds the cap — the
    stop-phrase set.  One map-side-combined count per distinct shingle;
    the surviving set is tiny (stop-phrases), so downstream anti-joins
    broadcast it instead of shuffling the corpus."""
    return (
        shingles.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("s")
    )


def _kept_shingles(shingles: DataFrame, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """Drop df>cap stop-shingles before any exact pair join (they carry
    no Jaccard signal and make the equi-join quadratic on their key).
    The capped set feeds several downstream reads (both pair-join sides,
    per-doc sizes); Spark's exchange reuse shares the shuffled result
    between them (measured: an explicit localCheckpoint is a wash), so
    no manual materialization is needed."""
    return shingles.join(F.broadcast(_hot_shingles(shingles, df_cap)), "s", "left_anti")


def _pair_jaccard(shingles: DataFrame) -> DataFrame:
    """Exact Jaccard for all shingle-colliding pairs: equi-join on the
    shingle, count intersections, join sizes.  (The join IS the candidate
    filter — non-overlapping pairs never materialize.)  Callers pass the
    df-capped shingle set (`_kept_shingles`) so no single shingle key can
    fan out past SHINGLE_DF_CAP^2 pairs."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        # threshold filters must use the RAW ratio (like the oracle's
        # WHERE clause); only the output column is rounded for hashing
        .withColumn("jaccard_raw", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .withColumn("jaccard", F.round(F.col("jaccard_raw"), 6))
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


@REG.add(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content md5; canonical = min doc_id. "
    "One shuffle on a 16-byte key; duplicate elimination at any scale.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies"))
    )


def ngram_jaccard_oracle(df_cap: int = SHINGLE_DF_CAP) -> str:
    """Oracle SQL, parameterized by df cap so tests can pin the cap
    semantics with a small cap on a hot-shingle corpus."""
    return f"""
    WITH {_shingles_sql(df_cap)},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           ROUND(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter / CAST(sa.n + sb.n - inter AS DOUBLE) >= {JACCARD_TAU}
    """


@REG.add(
    "dedup_ngram_jaccard",
    ngram_jaccard_oracle(),
    doc=f"n-gram Jaccard near-dup pairs (3-gram word shingles, tau={JACCARD_TAU}, "
    f"shingle df cap {SHINGLE_DF_CAP}): exact similarity via shingle equi-join — "
    "the verifier stage of LSH.",
)
def dedup_ngram(spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    return (
        _pair_jaccard(_kept_shingles(_shingles(spark, sf_dir), df_cap))
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"MIN(({MH_A[i]} * v + {MH_B[i]}) % {MH_P}) AS h{i}" for i in range(MINHASH_K)
    )
    # signatures read shingles_RAW: the sketch is in-row (never joins),
    # so it keeps full fidelity; only the exact verify join is df-capped
    return f"""hv AS (
        SELECT doc_id, {_HEX_DECODE} AS v
        FROM (SELECT doc_id, md5('mh-' || s) AS h FROM shingles_raw)
    ),
    sigs AS (SELECT doc_id, {mins} FROM hv GROUP BY doc_id)"""


def _band_sql(b: int) -> str:
    cols = " || '-' || ".join(f"h{b * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS))
    return f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sigs"


def _sig_key_sql() -> str:
    """DuckDB twin of ``minhash_sig_key``: md5 over all K slots."""
    cols = " || '-' || ".join(f"h{i}" for i in range(MINHASH_K))
    return f"md5({cols})"


def minhash_lsh_oracle(df_cap: int = SHINGLE_DF_CAP) -> str:
    return f"""
    WITH {_shingles_sql(df_cap)},
    {_minhash_sig_sql()},
    bands AS ({" UNION ALL ".join(_band_sql(b) for b in range(MINHASH_BANDS))}),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               (SELECT COUNT(*) FROM shingles x JOIN shingles y
                 ON x.s = y.s AND x.doc_id = c.doc_a AND y.doc_id = c.doc_b) AS inter
        FROM cands c
    )
    SELECT v.doc_a, v.doc_b,
           ROUND(v.inter / CAST(sa.n + sb.n - v.inter AS DOUBLE), 6) AS jaccard
    FROM verified v
    JOIN sizes sa ON v.doc_a = sa.doc_id
    JOIN sizes sb ON v.doc_b = sb.doc_id
    WHERE v.inter / CAST(sa.n + sb.n - v.inter AS DOUBLE) >= {JACCARD_TAU}
    """


def minhash_sigs(grams_df: DataFrame, *id_cols: str) -> DataFrame:
    """In-row MinHash signatures over a DataFrame carrying a ``grams``
    array column: one md5 per distinct shingle packed to a 32-bit int
    (staged projection — hashed ONCE, not once per permutation), K
    affine permutations + array_min per signature slot.  Returns
    (*id_cols, h0..h{K-1}).  Shared by the banding below and the
    full-signature key (streaming_keep_best's near-identical content
    key) so every MinHash consumer folds the identical sketch."""
    shingle_hash32 = F.transform(
        F.col("grams"),
        lambda s: F.conv(F.substring(F.md5(F.concat(F.lit("mh-"), s)), 1, 8), 16, 10).cast(
            "bigint"
        ),
    )

    def sig(i: int):
        # closure binding the permutation index (not a lambda default arg)
        return F.array_min(
            F.transform(
                F.col("vs"), lambda v: (v * F.lit(MH_A[i]) + F.lit(MH_B[i])) % F.lit(MH_P)
            )
        ).alias(f"h{i}")

    return grams_df.select(*id_cols, shingle_hash32.alias("vs")).select(
        *id_cols, *[sig(i) for i in range(MINHASH_K)]
    )


def minhash_sig_key() -> F.Column:
    """Full-signature content key: md5 over ALL K signature slots —
    collision requires every slot equal (near-identical documents), the
    strictest rung of the banding ladder.  DuckDB twin:
    md5(h0 || '-' || h1 || ... ) in _sig_key_sql."""
    return F.md5(F.concat_ws("-", *[F.col(f"h{i}") for i in range(MINHASH_K)]))


def minhash_bands(grams_df: DataFrame, *id_cols: str) -> DataFrame:
    """In-row MinHash banding: signatures via ``minhash_sigs``, rows
    concatenated per band and re-hashed to the bucket key, then a single
    explode.  Shared by the batch LSH op below and the streaming ingest
    dedup (streaming/jobs.py:streaming_minhash_dedup) so the two can
    never drift: a (band, bucket) collision means the same thing in
    both.  Returns (*id_cols, band, bucket) — MINHASH_BANDS rows per
    input row."""
    sigs = minhash_sigs(grams_df, *id_cols)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "-", *[F.col(f"h{b * MINHASH_ROWS + r}") for r in range(MINHASH_ROWS)]
                    )
                ).alias("bucket"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return sigs.select(*id_cols, F.explode(band_structs).alias("bb")).select(
        *id_cols, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


@REG.add(
    "dedup_minhash_lsh",
    minhash_lsh_oracle(),
    doc=f"MinHash+LSH dedup ({MINHASH_K} hashes, {MINHASH_BANDS} bands x {MINHASH_ROWS}): "
    "shingle → per-permutation min (lexicographic md5 order) → band buckets → "
    "candidate pairs by (band,bucket) equi-join → exact-Jaccard verify over "
    f"df-capped shingles (cap {SHINGLE_DF_CAP}). The scale path: collisions, "
    "not all-pairs.",
)
def dedup_minhash(spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    # signatures computed IN-ROW (a doc's minhashes depend only on its own
    # shingles), bands via a single explode (NOT a 4-way union, which
    # would recompute the shingle→signature pipeline once per band) — see
    # minhash_bands.  The per-doc band table is tiny (MINHASH_BANDS
    # rows/doc) → cache it so the self-join below reads it once.  At
    # cluster scale this materialization is the standard "write
    # signatures once" step of LSH pipelines.
    bands = minhash_bands(_gram_docs(spark, sf_dir), "doc_id").cache()
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify ONLY the LSH candidates: restrict the shingle set to
    # candidate documents before the quadratic pair stage — at scale the
    # candidate set is a vanishing fraction of the corpus, so the exact
    # verify runs over collisions, never all-pairs
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # cache: _pair_jaccard reads this three times (both join sides +
    # sizes); it holds only candidate documents' shingles, a vanishing
    # fraction of the corpus, so the materialization is cheap at any scale.
    # df cap FIRST, computed over the FULL corpus (parity with the oracle's
    # hot CTE over shingles_raw): a stop-shingle is hot corpus-wide even if
    # rare within the candidate subset
    sh_cand = (
        _kept_shingles(sh, df_cap).join(F.broadcast(cand_docs), "doc_id", "left_semi").cache()
    )
    verified = (
        _pair_jaccard(sh_cand)
        .join(cands, ["doc_a", "doc_b"], "left_semi")
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def _simhash_sql() -> str:
    # per distinct word: first 8 md5 hex digits -> 32 bits; +1/-1 vote per bit
    return f"""
    words AS (
        SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
    ),
    wbits AS (
        SELECT doc_id, w, bit,
               CASE WHEN (strpos('{HEX}', substr(md5('sh-' || w), CAST(bit // 4 AS INT) + 1, 1)) - 1)
                         // CAST(POW(2, 3 - bit % 4) AS INT) % 2 = 1
                    THEN 1 ELSE -1 END AS vote
        FROM words, UNNEST(range({SIMHASH_BITS})) AS t(bit)
    ),
    docbits AS (
        SELECT doc_id, bit, CASE WHEN SUM(vote) > 0 THEN 1 ELSE 0 END AS b
        FROM wbits GROUP BY doc_id, bit
    )
    """


@REG.add(
    "dedup_simhash",
    f"""
    WITH {_simhash_sql()}
    SELECT doc_id, CAST(SUM(b * CAST(POW(2, bit) AS BIGINT)) AS BIGINT) AS simhash
    FROM docbits GROUP BY doc_id
    """,
    doc="SimHash 32-bit sketch per document: md5-derived bit votes over distinct "
    "words, majority per bit. Near-dup = Hamming distance <= k over the sketch "
    "(banded the same way as MinHash at scale); sketch itself is hash-checked.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A document's simhash depends ONLY on its own words → compute it
    # entirely IN-ROW with higher-order functions: distinct words → one
    # md5 per word (materialized once as an array column) → 32 aggregate()
    # folds summing ±1 votes → majority bits packed to a bigint.  The plan
    # is scan → project: ZERO shuffles, no row explosion, no join — each
    # partition sketches its documents independently, which is the ideal
    # shape at 100 TB (an earlier explode→vocab-join→groupBy version paid
    # two shuffles and a 100x row blowup for the same answer).
    # one md5 per distinct word, packed to a 32-bit integer: hex digit
    # b//4 at value-bit 3-b%4 (the oracle's layout) is exactly packed bit
    # 31-b, so each per-bit vote below is a single bitwiseAND — no string
    # ops inside the 32 folds
    hash32 = F.transform(
        F.array_distinct(F.split("text", " ")),
        lambda w: F.conv(F.substring(F.md5(F.concat(F.lit("sh-"), w)), 1, 8), 16, 10).cast(
            "bigint"
        ),
    )
    # fan the compute-heavy map across all cores: the corpus here is one
    # small parquet file (one input split), which would serialize the
    # whole sketch onto a single task; a cluster-scale corpus has natural
    # scan parallelism and the repartition collapses to a no-op cost-wise
    # (it moves raw text once, before the 32-fold hash work)
    doc = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", hash32.alias("hv"))
    )

    def fold(bit: int):
        # closure (not a lambda default arg: pyspark treats extra lambda
        # params as lambda variables) binding the bit mask per fold
        mask = F.lit(1 << (31 - bit)).cast("bigint")
        return F.aggregate(
            F.col("hv"),
            F.lit(0),
            lambda acc, v: acc + F.when(v.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    simhash = None
    for bit in range(SIMHASH_BITS):
        s = fold(bit)
        term = F.when(s > 0, F.lit(2**bit).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        simhash = term if simhash is None else simhash + term
    return doc.select("doc_id", simhash.alias("simhash"))


# Recursive-CTE twin of min_label_components over the exact-Jaccard pair
# graph: ends in a ``labels (doc_id, cluster_id)`` CTE covering exactly the
# clustered (non-singleton) documents.  Shared by the dedup_clusters and
# dedup_keep_best oracles so the two can't drift.
_CLUSTER_LABELS_SQL = f"""
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    nd AS (
        SELECT doc_a, doc_b FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter / CAST(sa.n + sb.n - inter AS DOUBLE) >= {JACCARD_TAU}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM nd
        UNION ALL SELECT doc_b, doc_a FROM nd
    ),
    walk(doc, lbl) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.doc
    ),
    labels AS (SELECT doc AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY doc)
"""


@REG.add(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_CLUSTER_LABELS_SQL}
    SELECT doc_id, cluster_id, COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM labels
    """,
    doc="Near-duplicate CLUSTERING: connected components over the exact-Jaccard "
    "pair graph via iterative min-label propagation (the Spark pattern for "
    "fixpoint algorithms — converges in O(component diameter) joins); cluster "
    "id = min doc_id. Oracle recomputes components with a recursive CTE.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _pair_jaccard(_kept_shingles(_shingles(spark, sf_dir)))
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
    )
    return min_label_components(pairs, "doc_id")


def min_label_components(pairs: DataFrame, id_col: str) -> DataFrame:
    """Connected components over an undirected pair graph via iterative
    min-label propagation — output is (id_col, cluster_id, cluster_size)
    with cluster_id = component-min id.  Callers that don't need sizes
    (dedup_keep_best recomputes the count in its own argmax window) use
    ``min_label_labels`` directly and skip the sizes aggregate+join."""
    labels = min_label_labels(pairs, id_col)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(id_col, "cluster_id", "cluster_size")


def min_label_labels(pairs: DataFrame, id_col: str) -> DataFrame:
    """Connected-component labels over an undirected pair graph via
    iterative min-label propagation — the Spark pattern for fixpoint
    algorithms, converging in O(component diameter) joins.  ``pairs``
    has columns (doc_a, doc_b); output is (id_col, cluster_id) with
    cluster_id = component-min id.  Shared by the Jaccard and semantic
    (embedding) dedup clusterings."""
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).withColumnsRenamed({"doc_a": "src", "doc_b": "dst"})
    edges = edges.cache()

    labels = edges.select(F.col("src").alias(id_col)).distinct().withColumn(
        "cluster_id", F.col(id_col)
    )
    # min-label propagation to fixpoint; near-dup components are shallow
    # (pairs/triples), so this converges in a couple of iterations — the
    # cap is a safety net, convergence is checked each round
    converged = False
    for _ in range(20):
        propagated = (
            edges.join(labels, edges.src == labels[id_col])
            .select(F.col("dst").alias(id_col), "cluster_id")
            .unionByName(labels)
            .groupBy(id_col)
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # fuse the convergence check into the checkpoint job: carry the
        # previous round's label through the propagation join, eager-
        # checkpoint ONCE, and read the changed-count as a plain scan of
        # the materialized result — one distributed join per round
        # instead of two (propagate + separate compare-join)
        prev = labels.select(
            F.col(id_col), F.col("cluster_id").alias("prev_cluster_id")
        )
        new_labels = propagated.join(prev, id_col).localCheckpoint()
        changed = new_labels.filter(
            F.col("cluster_id") != F.col("prev_cluster_id")
        ).count()
        labels = new_labels.select(id_col, "cluster_id")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            "min_label_labels: propagation did not converge in 20 rounds "
            "(component diameter > 20) — raise the cap for chain-shaped corpora"
        )
    return labels


@REG.add(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_CLUSTER_LABELS_SQL},
    docs AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS word_count
        FROM documents
    ),
    lab AS (
        SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.word_count
        FROM docs d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ),
    ranked AS (
        SELECT doc_id, cluster_id, word_count,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
               ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY word_count DESC, doc_id) AS rn
        FROM lab
    )
    SELECT doc_id, cluster_id, cluster_size, word_count
    FROM ranked WHERE rn = 1
    """,
    doc="Cluster-representative selection (the curation step AFTER near-dup "
    "clustering): every document lands in a cluster (singletons are their own, "
    "cluster_id = doc_id), and exactly one representative per cluster survives — "
    "the highest-quality member (word count, doc_id tiebreak).  Composes "
    "dedup_clusters' min-label components with a per-cluster argmax: the only "
    "new work over clustering is one doc_id equi-join against the skinny label "
    "table plus ONE keyed window (row_number + count share the cluster_id "
    "shuffle and sort).  No global sort, no driver collect; at 100 TB the "
    "window partition is a duplicate cluster — bounded by near-dup group "
    "size, never corpus size.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _pair_jaccard(_kept_shingles(_shingles(spark, sf_dir)))
        .filter(F.col("jaccard_raw") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
    )
    clusters = min_label_labels(pairs, "doc_id")
    doc = load_table(spark, sf_dir, "documents")
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    docs = doc.select("doc_id", (spaces + 1).cast("long").alias("word_count"))
    lab = docs.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    by_cluster = Window.partitionBy("cluster_id")
    best_first = Window.partitionBy("cluster_id").orderBy(
        F.col("word_count").desc(), "doc_id"
    )
    return (
        lab.withColumn("cluster_size", F.count("*").over(by_cluster))
        .withColumn("rn", F.row_number().over(best_first))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "word_count",
        )
    )


@REG.add(
    "dedup_embedding_cosine",
    f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {COSINE_TAU}
    """,
    doc=f"Embedding cosine near-dup pairs (tau={COSINE_TAU}), double precision. "
    "All-pairs here (the exact verifier); the ANN-bucketed variant in "
    "similarity.py is the scale path.",
)
def dedup_embedding(
    spark: SparkSession, sf_dir: str, max_rows: int = EXACT_COSINE_MAX_ROWS
) -> DataFrame:
    # same normalization/dot-product expressions as the ANN paths — one
    # definition (similarity._normed/_dot) so the exact verifier can
    # never drift from what it verifies
    from .similarity import _dot, _normed

    # size guard BEFORE the quadratic join: this is the exact verifier,
    # never the scale path.  The count is parquet-metadata cheap.
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    if n_vecs > max_rows:
        raise ValueError(
            f"dedup_embedding_cosine is the exact all-pairs verifier (O(N^2)) and "
            f"refuses corpora over {max_rows} vectors (got {n_vecs}). Use the "
            f"bucketed scale paths: sim_ann_lsh / sim_ann_ivf in operators/similarity.py, "
            f"then verify only their candidate pairs."
        )
    n = _normed(spark, sf_dir)
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos_raw") >= COSINE_TAU)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# benchmark contamination (round-2 extension)
# ---------------------------------------------------------------------------

# Deterministic stand-in for an eval/benchmark suite: every 50th doc_id.
# In production this is the real benchmark corpus (a few thousand docs);
# the query shape is identical — the benchmark side stays tiny.
CONTAM_BENCH_MOD = 50
CONTAM_TAU = 0.2  # flag docs sharing >= 20% of their shingles with the benchmark


@REG.add(
    "contamination_check",
    f"""
    WITH {_shingles_sql()},
    bench AS (
        SELECT DISTINCT s FROM shingles_raw WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    ),
    corpus AS (
        SELECT doc_id, s FROM shingles_raw WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
    hits AS (
        SELECT c.doc_id, COUNT(*) AS n_contaminated
        FROM corpus c SEMI JOIN bench b ON c.s = b.s
        GROUP BY c.doc_id
    )
    SELECT h.doc_id, t.n_shingles, h.n_contaminated,
           ROUND(h.n_contaminated / CAST(t.n_shingles AS DOUBLE), 6) AS contamination,
           h.n_contaminated / CAST(t.n_shingles AS DOUBLE) >= {CONTAM_TAU} AS flagged
    FROM hits h JOIN totals t USING (doc_id)
    """,
    doc=f"Benchmark contamination: for each training doc, the fraction of its "
    f"word-3-gram shingles appearing anywhere in the benchmark set (here: every "
    f"{CONTAM_BENCH_MOD}th doc, a deterministic stand-in).  Scale shape: the "
    "benchmark shingle set is tiny and BROADCAST, so the probe is a map-side "
    "semi-join — no corpus shuffle at all beyond the per-doc count; this is the "
    "standard pre-training decontamination pass (n-gram overlap against eval "
    f"suites), flagging at {CONTAM_TAU}.",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    bench = sh.filter(is_bench).select("s").distinct()
    corpus = sh.filter(~is_bench)
    # ONE corpus pass: mark benchmark shingles with a broadcast left
    # join, then count total + contaminated in the same aggregation.
    # (The previous two-subquery shape — semi-join hits + separate
    # totals — shingled the corpus twice; this halves the heavy stage.)
    marked = corpus.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "s", "left"
    )
    agg = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
    )
    frac = F.col("n_contaminated") / F.col("n_shingles").cast("double")
    return agg.filter(F.col("n_contaminated") > 0).select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(frac, 6).alias("contamination"),
        (frac >= CONTAM_TAU).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# semantic (embedding) dedup clusters (round-2 extension)
# ---------------------------------------------------------------------------


def _semantic_oracle_sql() -> str:
    from .similarity import hashed_sql_union

    return f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e),
    hashed AS ({hashed_sql_union()}),
    cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM hashed a JOIN hashed b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    nd AS (
        SELECT c.vec_a, c.vec_b
        FROM cands c
        JOIN n x ON x.vec_id = c.vec_a
        JOIN n y ON y.vec_id = c.vec_b
        WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= {COSINE_TAU}
    ),
    edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM nd
        UNION ALL SELECT vec_b, vec_a FROM nd
    ),
    walk(vec, lbl) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.vec
    )
    SELECT vec_id, cluster_id, COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM (SELECT vec AS vec_id, MIN(lbl) AS cluster_id FROM walk GROUP BY vec)
    """


@REG.add(
    "dedup_semantic_clusters",
    _semantic_oracle_sql(),
    doc=f"SEMANTIC dedup at scale: near-duplicate clusters over the embedding "
    f"space.  Candidate pairs come from corpus-side LSH bucket collisions "
    "(the same deterministic hyperplane tables as sim_ann_lsh — collisions "
    "replace all-pairs), verified by exact cosine >= "
    f"{COSINE_TAU} on candidates only, then clustered by min-label "
    "propagation (shared with dedup_clusters).  This is the scale-path twin "
    "of the guarded dedup_embedding_cosine verifier: at 10^10 vectors you "
    "raise LSH_BITS so expected bucket size stays constant (bits ~ log2(N)) "
    "and the collision join stays linear-ish; the checked configuration "
    "pins the 4-bit/6-table family end-to-end against the oracle.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str, lsh_bits: int | None = None) -> DataFrame:
    from .similarity import LSH_BITS, _dot, _normed, auto_lsh_tables, hashed_buckets

    # lsh_bits=None pins the oracle's LSH_BITS hyperplane family (the
    # driver-checked configuration); scale runs pass auto_lsh_bits(N) so
    # expected bucket size — and with it the collision-join fan-out —
    # stays constant as the corpus grows, with L grown via
    # auto_lsh_tables so wider bit-widths keep the design-point recall
    # (the scale curve is iso-recall, not silently lossier)
    bits = LSH_BITS if lsh_bits is None else lsh_bits
    hashed = hashed_buckets(_normed(spark, sf_dir), bits=bits, tables=auto_lsh_tables(bits))
    a = hashed.alias("a")
    b = hashed.alias("b")
    # exact-cosine verify INSIDE the bucket join: the vectors ride the
    # one linear (tbl, bucket) shuffle, so every collision is scored
    # map-side the moment it's produced and only true near-dup pairs
    # reach the distinct (a pair colliding in k tables re-scores k
    # times — k <= L, far cheaper than exchanging the full candidate
    # set and joining the vectors back by id: that plan shuffles
    # O(collisions) rows where this one shuffles O(N·L) skinny inputs
    # plus O(true pairs) outputs).  Same output set as verify-after-
    # distinct, so the oracle is unchanged.  (A 32-dim sign-projection
    # PREFILTER of this verify was built and measured in round 6 and
    # REJECTED: at tau=0.45 the projected dot added to every collision
    # costs about what the skipped 64-dim dots save — x30 54.6s ->
    # 50-51s, x100 238s -> 295s with the fatter shuffle payload — so
    # the exact in-join verify stays; see SCALE.md.)
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(_dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm")) >= COSINE_TAU)
        .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
        .distinct()
    )
    # hashed feeds BOTH sides of the self-join: pin it (N·L skinny rows
    # + vectors) for the one action that materializes pairs, then free
    # it — the label-propagation loop only ever re-reads the tiny
    # checkpointed pair list, never the hyperplane folds
    hashed.cache()
    try:
        pairs = pairs.localCheckpoint(eager=True)
    finally:
        hashed.unpersist()
    return min_label_components(pairs, "vec_id")


# ---------------------------------------------------------------------------
# IVF-path semantic dedup (round 5: the documented scale successor to
# the LSH-banding path once iso-recall table growth stops paying)
# ---------------------------------------------------------------------------
IVF_DEDUP_PROBES = 2  # cells each vector contributes to as a dedup candidate


def _semantic_ivf_oracle_sql() -> str:
    from .similarity import IVF_CELLS

    return f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e),
    cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n WHERE vec_id < {IVF_CELLS}),
    probed AS (
        SELECT vec_id, cell_id FROM (
            SELECT n.vec_id, c.cell_id,
                   ROW_NUMBER() OVER (PARTITION BY n.vec_id
                       ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC,
                                c.cell_id) AS rn
            FROM n CROSS JOIN cents c
        ) WHERE rn <= {IVF_DEDUP_PROBES}
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM probed a JOIN probed b
          ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
    ),
    nd AS (
        SELECT c.vec_a, c.vec_b
        FROM cands c
        JOIN n x ON x.vec_id = c.vec_a
        JOIN n y ON y.vec_id = c.vec_b
        WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= {COSINE_TAU}
    ),
    edges AS (
        SELECT vec_a AS src, vec_b AS dst FROM nd
        UNION ALL SELECT vec_b, vec_a FROM nd
    ),
    walk(vec, lbl) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.vec
    )
    SELECT vec_id, cluster_id, COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM (SELECT vec AS vec_id, MIN(lbl) AS cluster_id FROM walk GROUP BY vec)
    """


@REG.add(
    "dedup_semantic_ivf",
    _semantic_ivf_oracle_sql(),
    doc=f"Semantic near-dup clustering on the IVF layout — the documented "
    "scale SUCCESSOR to the LSH-banding path (SCALE.md): candidate pairs "
    f"are vectors sharing any of their top-{IVF_DEDUP_PROBES} quantizer "
    "cells (the same deterministic rank_cells ordering as the k-NN graph), "
    "exact-cosine verified IN the cell self-join, then min-label "
    "components.  Scale shape: per-vector verify cost = probes x cell "
    "size, CONSTANT at any corpus size under auto_cells — unlike banding "
    "LSH, holding recall needs no geometric table growth, so the family "
    "stays linear where iso-recall banding goes N^1.22.  The checked "
    "configuration pins the 16-cell quantizer end-to-end against the "
    "recursive-walk SQL oracle; scale runs engage the JL centroid "
    "prescreen exactly as sim_knn_graph does.",
)
def dedup_semantic_ivf(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
    probes: int = IVF_DEDUP_PROBES,
) -> DataFrame:
    from .similarity import (
        IVF_CELLS,
        _dot,
        _normed,
        auto_jl_shortlist,
        ranked_cells_materialized,
    )

    n = _normed(spark, sf_dir)
    cells = IVF_CELLS if n_cells is None else n_cells
    # materialized above the floor: the arrow ranking has no exchange
    # reuse across the self-join's two consumers (similarity.py)
    ranked = ranked_cells_materialized(
        n,
        cells,
        keep=probes,
        jl_shortlist=auto_jl_shortlist(cells, probes),
    )
    # vectors ride the (cell_id) shuffle so every candidate is scored
    # map-side inside the self-join — the same in-join verify shape as
    # the LSH path, with <= probes rows per vector instead of L (and
    # the same round-6 prefilter verdict: exact verify wins).
    assigned = ranked.select("vec_id", "cell_id").join(n, "vec_id")
    a = assigned.alias("a")
    b = assigned.alias("b")
    # assigned feeds BOTH sides of the self-join: pin it so the
    # N x n_cells centroid ranking runs once, not twice (same pattern
    # as the LSH path's hashed.cache())
    assigned.cache()
    try:
        pairs = (
            a.join(
                b,
                (F.col("a.cell_id") == F.col("b.cell_id"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(_dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm")) >= COSINE_TAU)
            .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    finally:
        assigned.unpersist()
    return min_label_components(pairs, "vec_id")


# ---------------------------------------------------------------------------
# substring-span dedup (suffix-array-style, Spark-shaped)
# ---------------------------------------------------------------------------
SPAN_N = 8  # tokens per duplicated-substring probe gram


@REG.add(
    "dedup_substring_spans",
    f"""
    WITH grams AS (
        SELECT doc_id, i - 1 AS pos,
               md5('sp-' || {" || ' ' || ".join(f"words[i+{k}]" for k in range(SPAN_N))}) AS h
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             UNNEST(range(1, len(words) - {SPAN_N - 2})) AS t(i)
    ),
    freq AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, pos FROM grams SEMI JOIN freq USING (h)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos + {SPAN_N - 1}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) + 1 >= pos THEN 0 ELSE 1 END AS new_span
        FROM dup
    ),
    sid AS (
        SELECT doc_id, pos,
               CAST(SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + {SPAN_N - 1} AS e
        FROM sid GROUP BY doc_id, span_id
    ),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_dup_spans,
               CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY doc_id
    ),
    toks AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT t.doc_id,
           CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           CAST(ROUND(COALESCE(p.dup_tokens, 0) / CAST(t.n_tokens AS DOUBLE), 6) AS DOUBLE)
               AS dup_coverage
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"Substring-level dedup à la suffix-array corpus dedup (Lee et al. 2022), "
    f"re-expressed for Spark: every {SPAN_N}-token gram is position-hashed, grams "
    "occurring ≥2 times corpus-wide mark their [pos, pos+7] token spans as "
    "duplicated, and overlapping/adjacent spans merge via the gaps-and-islands "
    "running-max window (partitioned by doc — fully parallel).  Output per doc: "
    "merged span count, duplicated-token total, coverage ratio.  The corpus-wide "
    "gram-frequency groupBy map-side-combines, and the dup filter is a semi-join "
    "(no pair expansion), so no hot gram can go quadratic — the scale property "
    "suffix arrays need a serial build to get.",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring spans.  NULL-safe island rule:
    the first dup gram of a doc has no preceding rows → running max is
    NULL → `max+1 >= pos` is NULL → new_span=1 via the ELSE branch,
    identical in both engines."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "text", F.split("text", " ").alias("words"))
    )
    # gram hash: md5('sp-' || w[i] || ' ' || ... || w[i+7])
    def gram_hash(i):
        parts = [F.lit("sp-")]
        for k in range(SPAN_N):
            if k:
                parts.append(F.lit(" "))
            parts.append(F.get("words", i + k))
        return F.md5(F.concat(*parts))

    grams_arr = F.transform(F.sequence(F.lit(0), F.size("words") - SPAN_N), gram_hash)
    grams = (
        docs.filter(F.size("words") >= SPAN_N)
        .select("doc_id", F.posexplode(grams_arr).alias("pos", "h"))
    )
    freq = grams.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") >= 2).select("h")
    dup = grams.join(freq, "h", "left_semi").select("doc_id", "pos")

    prev = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "new_span",
        F.when(F.max(F.col("pos") + (SPAN_N - 1)).over(prev) + 1 >= F.col("pos"), 0).otherwise(1),
    )
    run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sid = flagged.withColumn("span_id", F.sum("new_span").over(run).cast("long"))
    spans = sid.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + (SPAN_N - 1)).alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
    )
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    toks = docs.select("doc_id", (spaces + 1).cast("long").alias("n_tokens"))
    return toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double"), 6)
        .cast("double")
        .alias("dup_coverage"),
    )


@REG.add(
    "dedup_exact_normalized",
    """
    WITH n AS (
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g')) AS norm_hash
        FROM documents
    )
    SELECT norm_hash, MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_docs
    FROM n GROUP BY norm_hash
    """,
    doc="Exact dedup after canonical normalization (lowercase, trim, collapse "
    "runs of spaces) — the C4-style normalize-then-hash pass that catches "
    "case/whitespace-only near-copies exact hashing misses.  One groupBy on a "
    "16-byte key with map-side combine (min/count): the same single-shuffle "
    "budget as dedup_exact.",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), "[ ]+", " ")
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(norm).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_docs"))
    )


CONTAINMENT_TAU = 0.8


@REG.add(
    "text_containment",
    f"""
    WITH {_shingles_sql()},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / CAST(sa.n AS DOUBLE), 6) AS containment_a,
           ROUND(inter / CAST(sb.n AS DOUBLE), 6) AS containment_b
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter / CAST(sa.n AS DOUBLE) >= {CONTAINMENT_TAU}
       OR inter / CAST(sb.n AS DOUBLE) >= {CONTAINMENT_TAU}
    """,
    doc=f"Asymmetric n-gram CONTAINMENT pairs (|A∩B|/|A| >= {CONTAINMENT_TAU} in "
    "either direction): catches a short document embedded inside a long one — "
    "the quotation/inclusion case symmetric Jaccard structurally misses (inter/"
    "union shrinks as the long side grows).  Same df-capped shingle equi-join "
    "budget as the Jaccard verifier; no new shuffle shape.",
)
def text_containment(spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP) -> DataFrame:
    p = _pair_jaccard(_kept_shingles(_shingles(spark, sf_dir), df_cap))
    ca_raw = F.col("inter") / F.col("n_a")
    cb_raw = F.col("inter") / F.col("n_b")
    return (
        p.filter((ca_raw >= CONTAINMENT_TAU) | (cb_raw >= CONTAINMENT_TAU))
        .select(
            "doc_a",
            "doc_b",
            F.round(ca_raw, 6).alias("containment_a"),
            F.round(cb_raw, 6).alias("containment_b"),
        )
    )
