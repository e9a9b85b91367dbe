"""Approximate-sketch operators (round-2 extension): deterministic
HyperLogLog distinct-count and Count-Min heavy-hitter sketches.

Spark ships HLL internally (``approx_count_distinct``) but its binary
sketch is engine-private — a differential gate against DuckDB's own
``approx_count_distinct`` would compare two different sketches and can
never hash-match.  These operators instead implement the published
algorithms (Flajolet et al. 2007 HLL; Cormode & Muthukrishnan 2005 CMS)
from md5-derived hashes expressible identically in both engines, so the
*estimates themselves* are deterministic and exactly oracle-checkable —
the same differential strategy the rest of the repo uses for
"randomness" (functions/expressions.py det_uniform).

Why the estimates hash-match bit-for-bit:

- every hash is ``md5(seed || key)`` → first 8 hex digits → int, the
  repo-standard portable construction;
- HLL's harmonic sum adds only exact powers of two (2^-rank, rank ≤ 24)
  over ≤ m=512 registers — every partial sum needs ≤ 9+24 bits of
  mantissa, so the double sum is EXACT and order-independent (no
  float-summation nondeterminism to round away);
- the one transcendental (ln in HLL's linear-counting branch) is
  applied to a ratio of small integers and the output rounded to 6dp,
  the repo's established libm-parity treatment;
- CMS is pure integer arithmetic end to end.

Scale: both sketches are the textbook one-pass map-side-combine shapes.
HLL: hash per row → groupBy(grp, bucket) max → groupBy(grp) fold —
two map-side-combined shuffles whose width is #groups × 512 regardless
of input size.  CMS: groupBy(row, bucket) count gives a table of at
most d×w = 4096 cells, broadcast back to the probe side; the input is
touched once.  This is exactly how you'd count distincts / heavy
hitters over 100 TB without holding keys in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import Registry

REG = Registry()

HEX = "0123456789abcdef"

# ---------------------------------------------------------------------------
# HyperLogLog: p=9 → m=512 registers, 23-bit remainder, rank ∈ [1, 24]
# ---------------------------------------------------------------------------
HLL_P = 9
HLL_M = 1 << HLL_P  # 512
HLL_REM_BITS = 32 - HLL_P  # 23
HLL_REM_MOD = 1 << HLL_REM_BITS  # 2^23
# bias-corrected constant alpha_m * m^2, bound once in Python so both
# engines parse the identical shortest-repr double literal
HLL_ALPHA_M2 = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M
HLL_LINEAR_THRESHOLD = 2.5 * HLL_M

# rank of the 23-bit remainder w = 1 + leading zero count; pure integer
# comparisons (no log2 — libm-free), identical text in Spark and DuckDB
_RANK_CASE = (
    "CASE "
    + " ".join(f"WHEN w >= {1 << (HLL_REM_BITS - r)} THEN {r}" for r in range(1, HLL_REM_BITS + 1))
    + f" ELSE {HLL_REM_BITS + 1} END"
)

# 2^-mr as exact decimal literals (Python repr round-trips, both engines
# parse to the exact power of two) — avoids trusting libm pow()
_POW2_NEG_CASE = (
    "CASE mr "
    + " ".join(f"WHEN {r} THEN {2.0 ** -r!r}" for r in range(1, HLL_REM_BITS + 2))
    + " ELSE 1.0 END"
)


def _hex8_sql(hexpr: str) -> str:
    """DuckDB twin of Spark's conv(substr(md5,1,8),16,10): positional
    decode of the first 8 hex digits to a 32-bit integer."""
    return (
        "("
        + " + ".join(
            f"(strpos('{HEX}', substr({hexpr}, {p + 1}, 1)) - 1) * {16 ** (7 - p)}"
            for p in range(8)
        )
        + ")"
    )


def _hex8_col(col) -> F.Column:
    """First 8 md5 hex digits → 32-bit int, JVM-side via conv()."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("long")


_HLL_EST_SQL = f"""
    CASE WHEN {HLL_ALPHA_M2!r} / (sum_inv + ({HLL_M} - n_filled)) <= {HLL_LINEAR_THRESHOLD!r}
              AND n_filled < {HLL_M}
         THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_filled))
         ELSE {HLL_ALPHA_M2!r} / (sum_inv + ({HLL_M} - n_filled)) END
"""


def hll_estimate(n_filled, sum_inv) -> F.Column:
    """HLL estimate (bias-corrected raw + small-range linear counting)
    from the per-group register fold — 6dp-rounded double."""
    raw_e = F.lit(HLL_ALPHA_M2) / (sum_inv + (HLL_M - n_filled))
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / (HLL_M - n_filled))
    est = F.when((raw_e <= HLL_LINEAR_THRESHOLD) & (n_filled < HLL_M), linear).otherwise(raw_e)
    return F.round(est, 6).cast("double")


@REG.add(
    "sketch_hll_distinct",
    f"""
    WITH hashed AS (
        SELECT o_orderpriority AS grp,
               md5('hll-' || CAST(o_custkey AS VARCHAR)) AS hx
        FROM orders
    ),
    ints AS (SELECT grp, {_hex8_sql('hx')} AS h FROM hashed),
    parts AS (SELECT grp, h // {HLL_REM_MOD} AS bucket, h % {HLL_REM_MOD} AS w FROM ints),
    ranks AS (SELECT grp, bucket, {_RANK_CASE} AS rank FROM parts),
    regs AS (SELECT grp, bucket, MAX(rank) AS mr FROM ranks GROUP BY grp, bucket),
    agg AS (
        SELECT grp, COUNT(*) AS n_filled, SUM({_POW2_NEG_CASE}) AS sum_inv
        FROM regs GROUP BY grp
    )
    SELECT grp AS o_orderpriority,
           CAST(n_filled AS BIGINT) AS n_filled,
           CAST(ROUND({_HLL_EST_SQL}, 6) AS DOUBLE) AS est_distinct
    FROM agg
    """,
    doc="Grouped HyperLogLog (p=9, m=512): approx distinct customers per order "
    "priority.  Register table is #groups×512 no matter the input size; the "
    "harmonic sum is exact in doubles (powers of two only) so the estimate is "
    "deterministic and oracle-checked to the last bit.  Small-range linear "
    "counting per the published algorithm.",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), "o_custkey"
    )
    h = _hex8_col(F.md5(F.concat(F.lit("hll-"), F.col("o_custkey").cast("string"))))
    parts = orders.withColumn("h", h).select(
        "grp",
        F.expr(f"h div {HLL_REM_MOD}").alias("bucket"),
        (F.col("h") % HLL_REM_MOD).alias("w"),
    )
    regs = (
        parts.withColumn("rank", F.expr(_RANK_CASE))
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("mr"))
    )
    agg = regs.groupBy("grp").agg(
        F.count("*").alias("n_filled"),
        F.sum(F.expr(_POW2_NEG_CASE)).alias("sum_inv"),
    )
    return agg.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n_filled").cast("long").alias("n_filled"),
        hll_estimate(F.col("n_filled"), F.col("sum_inv")).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch: d=4 hash rows × w=1024 buckets
# ---------------------------------------------------------------------------
CMS_D = 4
CMS_W = 1024
CMS_TOPK = 20


def _cms_bucket_sql(key_expr: str) -> str:
    hx = f"md5('cms-' || r || '-' || CAST({key_expr} AS VARCHAR))"
    return f"{_hex8_sql(hx)} % {CMS_W}"


def _cms_bucket_col(key_col, r_col) -> F.Column:
    hx = F.md5(
        F.concat(F.lit("cms-"), r_col.cast("string"), F.lit("-"), key_col.cast("string"))
    )
    return _hex8_col(hx) % CMS_W


@REG.add(
    "sketch_cms_heavy_hitters",
    f"""
    WITH rows_h AS (
        SELECT user_id, r FROM events
        CROSS JOIN UNNEST(range({CMS_D})) AS t(r)
    ),
    cells AS (
        SELECT r, {_cms_bucket_sql('user_id')} AS bucket, COUNT(*) AS c
        FROM rows_h GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    probes AS (
        SELECT user_id, r, {_cms_bucket_sql('user_id')} AS bucket
        FROM keys CROSS JOIN UNNEST(range({CMS_D})) AS t(r)
    ),
    est AS (
        SELECT p.user_id, CAST(MIN(c.c) AS BIGINT) AS est_count
        FROM probes p JOIN cells c USING (r, bucket)
        GROUP BY p.user_id
    )
    SELECT user_id, est_count FROM est
    ORDER BY est_count DESC, user_id LIMIT {CMS_TOPK}
    """,
    doc=f"Count-Min Sketch heavy hitters (d={CMS_D}, w={CMS_W}): per-user event "
    "counts estimated from a 4×1024-cell integer sketch, top-20 by estimate "
    "(unique-key tiebreak).  The cell table is ≤4096 rows regardless of input "
    "and broadcasts to the probe side; estimates are pure integer min-of-counts "
    "so the oracle is exact.  CMS guarantees est ≥ true count (test-pinned).",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    rs = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r")
    rows_h = ev.select("user_id", rs)
    cells = (
        rows_h.withColumn("bucket", _cms_bucket_col(F.col("user_id"), F.col("r")))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )
    probes = ev.distinct().select("user_id", rs).withColumn(
        "bucket", _cms_bucket_col(F.col("user_id"), F.col("r"))
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").cast("long").alias("est_count"))
    )
    return est.orderBy(F.col("est_count").desc(), F.col("user_id")).limit(CMS_TOPK)


# ---------------------------------------------------------------------------
# Bloom filter: m=65536 bits, k=4 hashes — join pre-filtering
# ---------------------------------------------------------------------------
BLOOM_M = 65536
BLOOM_K = 4
BLOOM_ACCTBAL = 9000.0  # build-side predicate: high-balance customers


def _bloom_pos_sql(key_expr: str) -> str:
    hx = f"md5('bf-' || j || '-' || CAST({key_expr} AS VARCHAR))"
    return f"{_hex8_sql(hx)} % {BLOOM_M}"


def _bloom_pos_col(key_col, j_col) -> F.Column:
    hx = F.md5(
        F.concat(F.lit("bf-"), j_col.cast("string"), F.lit("-"), key_col.cast("string"))
    )
    return _hex8_col(hx) % BLOOM_M


@REG.add(
    "sketch_bloom_prefilter",
    f"""
    WITH build AS (SELECT c_custkey FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL}),
    bpos AS (
        SELECT DISTINCT {_bloom_pos_sql('c_custkey')} AS pos
        FROM build CROSS JOIN UNNEST(range({BLOOM_K})) AS t(j)
    ),
    probe AS (SELECT DISTINCT o_custkey FROM orders),
    ppos AS (
        SELECT o_custkey, j, {_bloom_pos_sql('o_custkey')} AS pos
        FROM probe CROSS JOIN UNNEST(range({BLOOM_K})) AS t(j)
    ),
    hits AS (
        SELECT o_custkey, COUNT(*) AS nhit
        FROM ppos JOIN bpos USING (pos)
        GROUP BY o_custkey
    ),
    passed AS (SELECT o_custkey FROM hits WHERE nhit = {BLOOM_K})
    SELECT o.o_orderkey, o.o_custkey,
           CAST(b.c_custkey IS NOT NULL AS BIGINT) AS is_member
    FROM orders o
    JOIN passed USING (o_custkey)
    LEFT JOIN build b ON b.c_custkey = o.o_custkey
    """,
    doc=f"Bloom-filter join pre-filter (m={BLOOM_M} bits, k={BLOOM_K}): the "
    "high-balance customer keys are folded into a deterministic md5 Bloom "
    "filter whose set-bit table broadcasts to the orders probe — the map-side "
    "pruning that eliminates the shuffle of non-matching fact rows before an "
    "expensive join (what Spark's native bloom_filter_agg/might_contain does "
    "with an engine-private sketch; this portable twin is exactly "
    "oracle-checkable).  Output marks each passed order as true member or "
    "Bloom false positive — no false negatives by construction (test-pinned).",
)
def sketch_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.filter(F.col("c_acctbal") > BLOOM_ACCTBAL).select("c_custkey")
    js = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("j")
    bpos = (
        build.select("c_custkey", js)
        .select(_bloom_pos_col(F.col("c_custkey"), F.col("j")).alias("pos"))
        .distinct()
    )
    probe = orders.select("o_custkey").distinct()
    ppos = probe.select("o_custkey", js).withColumn(
        "pos", _bloom_pos_col(F.col("o_custkey"), F.col("j"))
    )
    hits = (
        ppos.join(F.broadcast(bpos), "pos")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("nhit"))
    )
    passed = hits.filter(F.col("nhit") == BLOOM_K).select("o_custkey")
    return (
        orders.join(F.broadcast(passed), "o_custkey")
        .join(
            F.broadcast(build.withColumnRenamed("c_custkey", "o_custkey").withColumn(
                "is_member_flag", F.lit(1)
            )),
            "o_custkey",
            "left",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("is_member_flag", F.lit(0)).cast("long").alias("is_member"),
        )
    )
