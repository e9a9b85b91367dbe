"""Batch relational operator inventory (SURVEY §2.2-2.8) over the
driver testdata, each with a DuckDB oracle twin.

The reference's relational surface is embedded SQLite SQL + in-memory
Python dataflow (phone_message_producer.py:77-281, 380-635).  Here each
operator class is re-expressed as a declarative DataFrame plan over the
TPC-H-ish testdata so Catalyst owns optimization (pushdown, pruning,
broadcast selection) — zero custom planner machinery, per SURVEY §4.

Determinism rules for exact hash parity with the oracle:
- money aggregates go through DECIMAL so sums are exact and
  order-insensitive in both engines (double summation is order-dependent);
- timestamps surface as ms-epoch BIGINT (``unix_millis`` / ``epoch_ms``);
- every ORDER BY ... LIMIT carries a unique tiebreaker column;
- "random" sampling/classification derives from md5 (identical hex in
  both engines) — see functions/expressions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.expressions import (
    build_phone_number,
    det_hash_hex,
    det_uniform,
    epoch_ms,
    fmt_hhmmss,
    weighted_classify,
)
from ..sources.tables import load_table
from . import Registry

REG = Registry()

# Timeout for the batch undelivered-detector analog (J5): 2 days between a
# user's first 'signup' and first subsequent 'purchase'.  Mirrors the
# reference's configurable undelivered timeout (py:52-53, README.md:31-35)
# scaled to the testdata's 30-day event horizon.
TIMEOUT_MS = 2 * 86_400_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# P-series: projections, filters, predicates (SURVEY §2.3)
# ---------------------------------------------------------------------------


@REG.add(
    "p1_projection_sort_limit",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
    doc="P1/SRT1/SRT2 (py:120-125): projection + ORDER BY + LIMIT; unique sort key.",
)
def p1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .limit(100)
    )


@REG.add(
    "p2_filter_inequality",
    """
    SELECT event_id, user_id, event_type
    FROM events WHERE event_type <> 'purchase'
    """,
    doc="P2 (py:160-165): active-message analog `status != 'delivered'`.",
)
def p2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") != "purchase")
        .select("event_id", "user_id", "event_type")
    )


@REG.add(
    "p3_filter_eq_single_col",
    "SELECT event_id FROM events WHERE event_type = 'purchase'",
    doc="P3 (py:239): delivered-ids analog — equality filter + single-column projection.",
)
def p3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").select("event_id")


@REG.add(
    "p4_filter_enum",
    "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'P'",
    doc="P4 (py:248): equality filter on small enum domain (delivery_type='never' analog).",
)
def p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey", "o_orderpriority")
    )


@REG.add(
    "p5_time_threshold",
    """
    SELECT event_id FROM events
    WHERE (SELECT MAX(epoch_ms(ts)) FROM events) - epoch_ms(ts) >= 15 * 86400000
    """,
    doc="P5 (py:551,813): heartbeat-due event-time threshold `now - last_heartbeat >= interval`; "
    "'now' = table max ts via scalar subquery.",
)
def p5(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    now_ms = ev.agg(F.max(epoch_ms(F.col("ts"))).alias("now_ms"))
    return (
        ev.crossJoin(F.broadcast(now_ms))
        .filter(F.col("now_ms") - epoch_ms(F.col("ts")) >= F.lit(15 * 86_400_000))
        .select("event_id")
    )


@REG.add(
    "p6_branching_threshold",
    """
    SELECT event_id, event_type, value FROM events
    WHERE CASE WHEN event_type = 'click' THEN value >= 10.0
               WHEN event_type = 'view'  THEN value >= 5.0
               ELSE FALSE END
    """,
    doc="P6 (py:580-589): delivery-due predicate branching on delivery_type.",
)
def p6(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = (
        F.when(F.col("event_type") == "click", F.col("value") >= 10.0)
        .when(F.col("event_type") == "view", F.col("value") >= 5.0)
        .otherwise(F.lit(False))
    )
    return _t(spark, sf_dir, "events").filter(pred).select("event_id", "event_type", "value")


@REG.add(
    "p7_null_as_status",
    """
    SELECT user_id FROM events
    GROUP BY user_id
    HAVING MIN(CASE WHEN event_type = 'purchase'
                     AND ts < TIMESTAMP '2024-01-05'
                    THEN epoch_ms(ts) END) IS NULL
    """,
    doc="P7 (py:100): 'undelivered' <=> delivered_time IS NULL — users with no "
    "purchase inside the observation window (nullability is the status bit).",
)
def p7(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") < F.lit("2024-01-05").cast("timestamp")),
            epoch_ms(F.col("ts")),
        )
    ).alias("first_purchase")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(first_purchase)
        .filter(F.col("first_purchase").isNull())
        .select("user_id")
    )


@REG.add(
    "p8_membership_sets",
    """
    SELECT event_id FROM events
    WHERE event_type IN ('click', 'view') AND user_id NOT IN (1, 2, 3)
    """,
    doc="P8 (py:547,577): semi/anti membership against small key sets (isin path).",
)
def p8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view") & ~F.col("user_id").isin(1, 2, 3))
        .select("event_id")
    )


# ---------------------------------------------------------------------------
# J-series: joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


@REG.add(
    "j1_join_filter_groupby",
    """
    SELECT c_mktsegment, COUNT(*) AS active_count
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY c_mktsegment
    """,
    doc="J1/A3 (py:266-272): dim⋈fact + filter + group-by count — active messages per "
    "carrier analog. Dimension side broadcast (Catalyst auto + explicit hint).",
)
def j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("active_count"))
    )


@REG.add(
    "j2_scalar_correlated_subquery",
    """
    SELECT o_orderkey FROM orders o
    WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
    doc="J2 (py:219-223): scalar correlated subquery — Catalyst decorrelates natively.",
)
def j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedicated view name: registering plain "orders" could clobber a
    # concurrently-registered view for a different sf_dir
    _t(spark, sf_dir, "orders").createOrReplaceTempView("j2_orders")
    return spark.sql(
        """
        SELECT o_orderkey FROM j2_orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM j2_orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@REG.add(
    "j3_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="J3 (py:484-486): available-phones analog — set difference as left anti join.",
)
def j3(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    pending = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        pending, customer.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@REG.add(
    "j4_semi_join",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="J4 (py:547,577): delivered-set membership as left semi join.",
)
def j4(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    pending = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        pending, customer.c_custkey == pending.o_custkey, "left_semi"
    ).select("c_custkey")


@REG.add(
    "j5_timeout_pairing",
    f"""
    WITH s AS (
        SELECT user_id, MIN(epoch_ms(ts)) AS first_sent_ms
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    d AS (
        SELECT s.user_id, MIN(epoch_ms(e.ts)) AS delivered_ms
        FROM s JOIN events e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
         AND epoch_ms(e.ts) >= s.first_sent_ms
        GROUP BY s.user_id
    )
    SELECT s.user_id, s.first_sent_ms, d.delivered_ms,
           d.delivered_ms - s.first_sent_ms AS latency_ms,
           (d.delivered_ms IS NULL OR d.delivered_ms - s.first_sent_ms > {TIMEOUT_MS})
               AS alerted
    FROM s LEFT JOIN d ON s.user_id = d.user_id
    """,
    doc="J5/ST1-batch (README.md:31-35; py:99-100): the flagship undelivered-message "
    "detector as a batch plan — first 'sent' (signup) paired with first subsequent "
    "'delivered' (purchase); alert when absent or late. Streaming twin: streaming/detector.py.",
)
def j5(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sent = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_ms(F.col("ts"))).alias("first_sent_ms"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), epoch_ms(F.col("ts")).alias("p_ms")
    )
    delivered = (
        sent.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id")) & (F.col("p_ms") >= F.col("first_sent_ms")),
            "inner",
        )
        .groupBy("user_id")
        .agg(F.min("p_ms").alias("delivered_ms"))
    )
    out = sent.join(delivered, "user_id", "left")
    latency = (F.col("delivered_ms") - F.col("first_sent_ms")).alias("latency_ms")
    alerted = (
        F.col("delivered_ms").isNull() | ((F.col("delivered_ms") - F.col("first_sent_ms")) > TIMEOUT_MS)
    ).alias("alerted")
    return out.select("user_id", "first_sent_ms", "delivered_ms", latency, alerted)


# ---------------------------------------------------------------------------
# A-series: aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------


@REG.add(
    "a1_count_global",
    "SELECT COUNT(*) AS cnt FROM lineitem",
    doc="A1 (py:258-259): global COUNT(*).",
)
def a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@REG.add(
    "a2_groupby_count",
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
    doc="A2 (py:262-263): hash aggregate — status histogram analog.",
)
def a2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("cnt"))


@REG.add(
    "a3_join_agg_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
    doc="A3 extension of J1 (py:266-273) at TPC-H-Q5 shape: 5-way star join + agg. "
    "DECIMAL sum => exact, order-insensitive, hash-stable across engines. "
    "Dims broadcast; only the lineitem⋈orders join shuffles.",
)
def a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    dims = (
        customer.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            customer.c_nationkey == nation.n_nationkey,
        )
    ).select("c_custkey", "n_name")
    # domain-narrow casts keep the product at decimal(18,8) — the widest
    # long-backed precision — instead of BigDecimal-boxed decimal(38,8);
    # values exact either way (same a7 rationale)
    rev = (
        F.col("l_extendedprice").cast("decimal(11,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(5,4)"))
    ).cast("decimal(18,8)")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@REG.add(
    "a4_group_stats",
    """
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events GROUP BY event_type
    """,
    doc="A4 (py:915-918): dict-accumulation carrier stats analog as hash agg.",
)
def a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("value").cast("decimal(18,4)")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(v).cast("double").alias("total_value"),
            (F.sum(v).cast("double") / F.count("*")).alias("avg_value"),
        )
    )


@REG.add(
    "a6_running_counters",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS total_sent,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS total_delivered
    FROM events GROUP BY user_id
    """,
    doc="A6/U2 (py:197-201,219-223): running counters as derived aggregates, never "
    "mutated-in-place (SURVEY §2.7 stance).",
)
def a6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "signup", 1)).alias("total_sent"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("total_delivered"),
        )
    )


# ---------------------------------------------------------------------------
# SRT/SMP: sorts, limits, sampling (SURVEY §2.6)
# ---------------------------------------------------------------------------


@REG.add(
    "srt1_topn_by_time",
    """
    SELECT event_id, epoch_ms(ts) AS ts_ms FROM events
    ORDER BY epoch_ms(ts) DESC, event_id DESC LIMIT 50
    """,
    doc="SRT1/SRT2 (py:120-122): ORDER BY time + LIMIT with unique tiebreaker. "
    "Spark executes as TakeOrderedAndProject — no full sort at scale.",
)
def srt1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # order by ms-epoch, not raw ts: sub-ms precision differs across
    # engines (ns in the oracle, µs in Spark) and would make the LIMIT
    # cutoff engine-dependent under same-ms ties
    return (
        ev.orderBy(epoch_ms(F.col("ts")).desc(), F.col("event_id").desc())
        .limit(50)
        .select("event_id", epoch_ms(F.col("ts")).alias("ts_ms"))
    )


@REG.add(
    "smp1_deterministic_sample",
    """
    SELECT event_id, user_id FROM events
    ORDER BY md5('42-' || CAST(event_id AS VARCHAR)), event_id LIMIT 500
    """,
    doc="SMP1 (py:497,771): exact-n uniform sample without replacement, seeded — "
    "rank by md5(seed||key) so Spark and the oracle draw the identical sample.",
)
def smp1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    rank = det_hash_hex("event_id", seed="42")
    return (
        ev.orderBy(rank.asc(), F.col("event_id").asc())
        .limit(500)
        .select("event_id", "user_id")
    )


@REG.add(
    "j8_salted_skew_join",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-resistant join (SURVEY §4 / 100 TB stance): the engine's "
    "salted_join — small side replicated per salt bucket, big side scattered "
    "by a deterministic row hash, join on (key, salt) — must be ROW-FOR-ROW "
    "equivalent to the plain equi-join; the oracle is that plain join, so the "
    "driver hash-checks semantic preservation.  For hot keys AQE's runtime "
    "skew split can't fix (both sides hot, or skewed agg keys), this spreads "
    "one straggler's work across salt_buckets tasks.",
)
def j8_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .skew import salted_join

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    joined = salted_join(orders, customer, key="o_custkey", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
    )


def _split_u() -> str:
    # the ONE definition of the split uniform's SQL twin, shared with
    # pipe_curation's oracle so pipeline and standalone splits can never
    # desynchronize
    from .message_domain import _u

    return _u("split", "CAST(doc_id AS VARCHAR)")


_SPLIT_U = _split_u()


@REG.add(
    "smp3_stratified_split",
    f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {_SPLIT_U} < 0.8 THEN 'train'
                    WHEN {_SPLIT_U} < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM assigned GROUP BY lang, split
    """,
    doc="Stratified train/val/test split (80/10/10) for dataset curation: "
    "membership is a pure hash of the stable doc_id (md5-derived uniform, the "
    "SMP1 family), so the assignment is reproducible on any cluster, needs no "
    "shuffle or global sort, and every stratum (lang) splits at the same "
    "rates.  Rolled up per (lang, split) for the correctness check; the "
    "assignment column itself is what a pipeline would write.",
)
def smp3_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    u = det_uniform("doc_id", seed="split")
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    )
    return (
        doc.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# U-series: upsert / snapshot semantics (SURVEY §2.7) — event-sourced, no
# in-place mutation (risk register §7 item 5).
# ---------------------------------------------------------------------------


@REG.add(
    "u1_insert_or_ignore",
    """
    WITH existing AS (
        SELECT c_custkey AS k, c_name AS name, 'existing' AS src
        FROM customer WHERE c_custkey <= 100
    ),
    incoming AS (
        SELECT s_suppkey AS k, s_name AS name, 'incoming' AS src FROM supplier
    )
    SELECT * FROM existing
    UNION ALL
    SELECT * FROM incoming i WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.k = i.k)
    """,
    doc="U1 (py:133-152): INSERT OR IGNORE = incoming ANTI JOIN existing, then append.",
)
def u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"), F.lit("existing").alias("src"))
    )
    incoming = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("name"), F.lit("incoming").alias("src")
    )
    fresh = incoming.join(existing.select("k"), "k", "left_anti")
    return existing.unionByName(fresh)


@REG.add(
    "u3_snapshot_last_event_wins",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS status,
           epoch_ms(ts) AS last_ts_ms
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="U3/U5 (py:211-216,610-614): point-UPDATE status transitions re-expressed as a "
    "last-event-wins snapshot over the event log (window row_number=1).",
)
def u3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (epoch_ms, event_id) ordering: cross-engine stable under sub-ms ties
    w = Window.partitionBy("user_id").orderBy(
        epoch_ms(F.col("ts")).desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("status"),
            epoch_ms(F.col("ts")).alias("last_ts_ms"),
        )
    )


@REG.add(
    "u4_heartbeat_rollup",
    """
    SELECT user_id,
           MIN(epoch_ms(ts)) AS first_sent_ms,
           MAX(epoch_ms(ts)) AS last_heartbeat_ms,
           COUNT(*) AS n_heartbeats
    FROM events WHERE event_type = 'signup' GROUP BY user_id
    """,
    doc="U4/ST2 (py:225-229, 540-568): heartbeat bookkeeping — first-sent = MIN(ts) "
    "(the §1.3 dedup invariant), last_heartbeat = MAX(ts).",
)
def u4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = epoch_ms(F.col("ts"))
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(
            F.min(ms).alias("first_sent_ms"),
            F.max(ms).alias("last_heartbeat_ms"),
            F.count("*").alias("n_heartbeats"),
        )
    )


# ---------------------------------------------------------------------------
# F-series: scalar expression parity (SURVEY §2.8)
# ---------------------------------------------------------------------------


@REG.add(
    "f_expressions",
    """
    SELECT event_id,
           lpad(CAST((epoch_ms(ts) // 1000 % 86400) // 3600 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST((epoch_ms(ts) // 1000 % 3600) // 60 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(epoch_ms(ts) // 1000 % 60 AS VARCHAR), 2, '0') AS hhmmss,
           CAST(CONCAT(CAST(212 + (user_id % 6) AS VARCHAR),
                       CAST(200 + (user_id % 800) AS VARCHAR),
                       CAST(1000 + (event_id % 9000) AS VARCHAR)) AS BIGINT) AS phone_concat,
           (212 + (user_id % 6)) * 10000000
             + (200 + (user_id % 800)) * 10000
             + (1000 + (event_id % 9000)) AS phone_arith,
           epoch_ms(ts) + 30 * 1000 AS hb_due_ms,
           SUBSTR(md5(CAST(event_id AS VARCHAR)), 1, 8) AS short_id
    FROM events
    """,
    doc="F3/F4/F5/F10 (py:551, 755, 393-397, 427): ms arithmetic, HH:mm:ss formatting, "
    "phone-number construction both by concat-cast and pure arithmetic, id truncation.",
)
def f_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    area = F.lit(212) + (F.col("user_id") % 6)
    exch = F.lit(200) + (F.col("user_id") % 800)
    num = F.lit(1000) + (F.col("event_id") % 9000)
    return _t(spark, sf_dir, "events").select(
        "event_id",
        fmt_hhmmss(F.col("ts")).alias("hhmmss"),
        F.concat(area.cast("string"), exch.cast("string"), num.cast("string"))
        .cast("bigint")
        .alias("phone_concat"),
        build_phone_number(area, exch, num).alias("phone_arith"),
        (epoch_ms(F.col("ts")) + 30 * 1000).alias("hb_due_ms"),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8).alias("short_id"),
    )


@REG.add(
    "f8_weighted_classify",
    """
    WITH classified AS (
        SELECT user_id,
               CASE WHEN u < 0.85 THEN 'normal'
                    WHEN u < 0.95 THEN 'delayed'
                    ELSE 'never' END AS delivery_type
        FROM (
            SELECT DISTINCT user_id,
                   (4096 * (strpos('0123456789abcdef', substr(md5('42-' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                    + 256 * (strpos('0123456789abcdef', substr(md5('42-' || CAST(user_id AS VARCHAR)), 2, 1)) - 1)
                    + 16  * (strpos('0123456789abcdef', substr(md5('42-' || CAST(user_id AS VARCHAR)), 3, 1)) - 1)
                    +       (strpos('0123456789abcdef', substr(md5('42-' || CAST(user_id AS VARCHAR)), 4, 1)) - 1)
                   ) / 65536.0 AS u
            FROM events
        )
    )
    SELECT delivery_type, COUNT(*) AS cnt FROM classified GROUP BY delivery_type
    """,
    doc="F8 (py:463-472): weighted categorical 0.85/0.10/0.05 with the uniform draw "
    "bound once per key — deterministic via md5 so the oracle draws identically.",
)
def f8(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = _t(spark, sf_dir, "events").select("user_id").distinct()
    u = det_uniform("user_id", seed="42")
    return (
        users.withColumn("delivery_type", weighted_classify(u))
        .groupBy("delivery_type")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Monitoring / extension analytics (SURVEY §2.9 ST9, §7.4-7.5 extensions)
# ---------------------------------------------------------------------------


@REG.add(
    "a7_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))
                    * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shape pricing summary: the canonical scan-heavy multi-aggregate — "
    "single pass over lineitem, partial+final hash agg, filter pushed to the scan. "
    "DECIMAL arithmetic keeps sums exact/order-insensitive for the oracle hash.",
)
def a7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp")
    )
    # right-size decimal precision to the data domain (price < 10^7,
    # rates < 10): narrow inputs keep the first product at decimal(18,8)
    # — the widest precision Spark's Decimal still backs with a 64-bit
    # long — instead of the BigDecimal-boxed decimal(38,8) that
    # blanket 18,4 casts produce.  Values are exact either way (same
    # scale, no overflow: sum precision gets +10 digits of headroom, room
    # for 10^10 max-price rows per group), so oracle parity is unchanged;
    # the narrow path aggregates ~20% faster on the scan-bound stage.
    qty = F.col("l_quantity").cast("decimal(11,4)")
    price = F.col("l_extendedprice").cast("decimal(11,4)")
    disc = F.col("l_discount").cast("decimal(5,4)")
    tax = F.col("l_tax").cast("decimal(5,4)")
    disc_price = (price * (1 - disc)).cast("decimal(18,8)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(disc_price * (1 + tax)).cast("double").alias("sum_charge"),
        # averages as exact-decimal sum / count in double: AVG(DECIMAL)
        # rounds its quotient at engine-specific scales and hash-mismatches
        (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@REG.add(
    "w3_event_gaps",
    """
    WITH gaps AS (
        SELECT event_type,
               epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                                      ORDER BY epoch_ms(ts), event_id) AS gap_ms
        FROM events
    )
    SELECT event_type,
           CAST(SUM(CAST(gap_ms AS DECIMAL(18,0))) AS BIGINT) AS total_gap_ms,
           COUNT(gap_ms) AS n_gaps
    FROM gaps GROUP BY event_type
    """,
    doc="Analytic window breadth: per-user inter-event gaps via LAG over an "
    "event-time window (the reference's heartbeat-interval bookkeeping P5/U4 "
    "generalized), rolled up per event type.",
)
def w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order by ms-epoch, not raw ts: the oracle's ts is ns-precision and
    # Spark's is µs — (epoch_ms, event_id) is identical in both engines
    w = Window.partitionBy("user_id").orderBy(epoch_ms(F.col("ts")), F.col("event_id"))
    ms = epoch_ms(F.col("ts"))
    gaps = _t(spark, sf_dir, "events").select(
        "event_type", (ms - F.lag(ms).over(w)).alias("gap_ms")
    )
    return gaps.groupBy("event_type").agg(
        F.sum(F.col("gap_ms").cast("decimal(18,0)")).cast("bigint").alias("total_gap_ms"),
        F.count("gap_ms").alias("n_gaps"),
    )


@REG.add(
    "a8_rollup_counts",
    """
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(user_id % 10 AS BIGINT))
    """,
    doc="Aggregation breadth beyond the reference: ROLLUP hierarchy "
    "(type, bucket) → (type) → () in one pass — Catalyst expands to a "
    "single Expand+hash-agg, no re-scan per level.",
)
def a8(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("bigint")
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


@REG.add(
    "a11_grouping_sets",
    """
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS user_bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS BIGINT)), ())
    """,
    doc="Aggregation breadth: GROUPING SETS with disjoint set shapes — "
    "per-type totals, per-bucket totals, and the grand total in ONE pass "
    "(Catalyst expands to a single Expand + hash aggregate, no re-scan per "
    "set), complementing a8's ROLLUP hierarchy and a10's pivot.",
)
def a11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("bigint")
    )
    return ev.groupingSets(
        [["event_type"], ["user_bucket"], []], "event_type", "user_bucket"
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


@REG.add(
    "a9_distinct_aggs",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT epoch_ms(ts) // 86400000) AS n_active_days,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Distinct aggregates (multiple per group): Catalyst's Expand-based "
    "multi-distinct rewrite — one input pass, no self-joins.",
)
def a9(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = (epoch_ms(F.col("ts")) / 86_400_000).cast("bigint")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.count_distinct(day).alias("n_active_days"),
            F.count("*").alias("n_events"),
        )
    )


@REG.add(
    "a10_pivot_counts",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
    FROM events GROUP BY user_id
    """,
    doc="Pivot: per-user event-type count matrix via groupBy().pivot() with "
    "explicit value list (one pass, no per-column scans; an unpinned pivot "
    "would need an extra distinct-values job).",
)
def a10(spark: SparkSession, sf_dir: str) -> DataFrame:
    kinds = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    out = pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("bigint").alias(f"n_{k}") for k in kinds]
    )
    return out


@REG.add(
    "s8_set_operations",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08'
    """,
    doc="Set operations: engaged users with no purchase in the first week via "
    "INTERSECT/EXCEPT (distinct set semantics — Catalyst plans both as "
    "aggregates + joins).",
)
def s8(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    early_purchasers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    ).select("user_id")
    return clickers.intersect(viewers).subtract(early_purchasers)


@REG.add(
    "w4_sessionization",
    """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
                    OR LAG(epoch_ms(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    sessions AS (
        SELECT user_id, ts_ms,
               -- CAST: DuckDB window SUM over integers yields HUGEINT (INT128),
               -- which has no Spark twin and hash-mismatches under the driver's
               -- typed normalization (round-1's only red row)
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts_ms) AS session_start_ms,
           MAX(ts_ms) - MIN(ts_ms) AS duration_ms
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min inactivity gap) via lag + running sum — the batch "
    "twin of Structured Streaming's session_window, built from the same window "
    "machinery as U3; one shuffle on user_id serves both window and final agg.",
)
def w4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (epoch_ms, event_id) ordering: cross-engine stable under sub-ms ties
    w = Window.partitionBy("user_id").orderBy(epoch_ms(F.col("ts")), F.col("event_id"))
    ms = epoch_ms(F.col("ts"))
    flagged = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        ms.alias("ts_ms"),
        F.when(
            (ms - F.lag(ms).over(w) > 1_800_000) | F.lag(ms).over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    # unique (ts_ms, event_id) ordering: a bare ts_ms order would make
    # session assignment nondeterministic under timestamp ties
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


@REG.add(
    "w1_hourly_event_counts",
    """
    SELECT epoch_ms(ts) // 3600000 * 3600000 AS hour_ms, event_type, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
    doc="ST9-analog monitoring rollup: tumbling 1h window counts (batch twin of the "
    "streaming window() aggregation).",
)
def w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            # arithmetic hour-truncation: timezone-independent, unlike
            # date_trunc which floors in the session zone
            (F.floor(epoch_ms(F.col("ts")) / 3600000).cast("long") * 3600000).alias("hour_ms"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
    )


@REG.add(
    "w2_latency_quantiles",
    """
    WITH s AS (
        SELECT user_id, MIN(epoch_ms(ts)) AS first_sent_ms
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    d AS (
        SELECT s.user_id, MIN(epoch_ms(e.ts)) AS delivered_ms
        FROM s JOIN events e ON e.user_id = s.user_id AND e.event_type = 'purchase'
                            AND epoch_ms(e.ts) >= s.first_sent_ms
        GROUP BY s.user_id
    )
    SELECT CAST(ROUND(quantile_cont(delivered_ms - first_sent_ms, 0.5), 2) AS DOUBLE) AS p50_ms,
           CAST(ROUND(quantile_cont(delivered_ms - first_sent_ms, 0.95), 2) AS DOUBLE) AS p95_ms,
           COUNT(*) AS n
    FROM s JOIN d ON s.user_id = d.user_id
    """,
    doc="§7.4 extension: delivery-latency percentiles over the J5 pairing — exact "
    "interpolated percentile (Spark `percentile` == DuckDB `quantile_cont`).",
)
def w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    paired = j5(spark, sf_dir).filter(F.col("delivered_ms").isNotNull())
    lat = F.col("latency_ms").cast("double")
    return paired.agg(
        F.round(F.percentile(lat, F.lit(0.5)), 2).alias("p50_ms"),
        F.round(F.percentile(lat, F.lit(0.95)), 2).alias("p95_ms"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# J6/J7/W5: as-of join, range join, native session windows — the custom
# time-join operators a stream-analytics engine needs that plain equi-join
# can't express (SURVEY §2.4's J5 family, generalized)
# ---------------------------------------------------------------------------


def merge_asof(
    left: DataFrame, right: DataFrame, key: str, ts: str, right_prefix: str = "asof_"
) -> DataFrame:
    """AS-OF enrich: each ``left`` row gains the most recent ``right`` row
    with ``right.ts <= left.ts`` for the same ``key`` (inclusive), or
    nulls when none precedes it.

    The scalable merge-asof composition — Spark has no native ASOF join:
    tag both sides, union, ONE shuffle on the key, sort within partition
    by (ts, side), and carry the right side forward with
    last_value(ignorenulls).  Cost equals a sort-merge join; no range
    explosion, no per-row subquery.

    Requirements: ``right`` unique per (key, ts) — pre-aggregate ties —
    and right payload columns non-null (the null-skipping carry would
    look past a legitimately-null payload to an older row).
    """
    lcols = [c for c in left.columns if c not in (key, ts)]
    rcols = [c for c in right.columns if c not in (key, ts)]
    l2 = left.select(
        key,
        ts,
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
        F.lit(1).alias("__side"),
    )
    r2 = right.select(
        key,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(ts).alias("__r_ts"),
        F.lit(0).alias("__side"),
    )
    # side=0 (right) sorts before side=1 (left) at equal ts → inclusive
    # "at-or-before" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    carried = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{right_prefix}{c}") for c in rcols]
    carried.append(F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_prefix}{ts}"))
    return (
        u.select(key, ts, *lcols, "__side", *carried)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


@REG.add(
    "j6_asof_join",
    """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_ms(ts) AS click_ms, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ms,
           c.click_ms, c.click_id,
           p.purchase_ms - c.click_ms AS ms_since_click
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.purchase_ms >= c.click_ms
    """,
    doc="AS-OF join (most recent click at-or-before each purchase, per user): "
    "Spark lacks a native ASOF operator, so it's built as the scalable "
    "merge-asof composition — tag both sides, ONE shuffle on the key, sort "
    "within partition, last_value(ignorenulls) window carries the right side "
    "forward.  No range explosion, no per-row subquery; at 100 TB this is a "
    "single sort-shuffle, the same cost as a sort-merge join.  Right side is "
    "pre-deduped per (key, ts) so ties are deterministic.  Oracle: DuckDB's "
    "native ASOF LEFT JOIN.",
)
def j6_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ms = epoch_ms(F.col("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", ms.alias("t_ms"), F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", ms.alias("t_ms"))
        .agg(F.max("event_id").alias("click_id"))
    )
    return merge_asof(purchases, clicks, key="user_id", ts="t_ms").select(
        "purchase_id",
        "user_id",
        F.col("t_ms").alias("purchase_ms"),
        F.col("asof_t_ms").alias("click_ms"),
        F.col("asof_click_id").alias("click_id"),
        (F.col("t_ms") - F.col("asof_t_ms")).alias("ms_since_click"),
    )


@REG.add(
    "j7_range_join",
    """
    WITH inc AS (
        SELECT MIN(epoch_ms(ts)) AS win_start_ms, COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error'
        GROUP BY epoch_ms(ts) // 60000
        ORDER BY n_errors DESC, win_start_ms LIMIT 20
    )
    SELECT i.win_start_ms, i.n_errors,
           COUNT(*) AS n_events_in_window,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM inc i JOIN events e
      ON epoch_ms(e.ts) >= i.win_start_ms AND epoch_ms(e.ts) < i.win_start_ms + 90000
    GROUP BY 1, 2
    """,
    doc="RANGE (interval) join: all events falling inside the top-20 error-burst "
    "windows [first_error, first_error + 90 s) — a pure non-equi time-range "
    "join.  The incident side is LIMIT-bounded and broadcast, so the plan is a "
    "BroadcastNestedLoopJoin probing 20 windows per event — linear in the fact "
    "side, no shuffle.  When BOTH sides are large, the scale path is bucketing "
    "each interval to its overlapping coarse time buckets and equi-joining on "
    "the bucket id (turns O(n·m) into a co-partitioned join); here the small "
    "side makes broadcast strictly better.",
)
def j7_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "value", epoch_ms(F.col("ts")).alias("e_ms")
    )
    inc = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        # positive ms epochs: truncating cast == DuckDB's // floor division
        .groupBy((epoch_ms(F.col("ts")) / 60000).cast("bigint").alias("minute"))
        .agg(F.min(epoch_ms(F.col("ts"))).alias("win_start_ms"), F.count("*").alias("n_errors"))
        .orderBy(F.col("n_errors").desc(), "win_start_ms")
        .limit(20)
        .select("win_start_ms", "n_errors")
    )
    joined = ev.join(
        F.broadcast(inc),
        (F.col("e_ms") >= F.col("win_start_ms")) & (F.col("e_ms") < F.col("win_start_ms") + 90000),
    )
    return joined.groupBy("win_start_ms", "n_errors").agg(
        F.count("*").alias("n_events_in_window"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


@REG.add(
    "w5_session_window",
    """
    WITH flagged AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
               CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL
                    OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 7200000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    sessions AS (
        SELECT user_id, ts_ms,
               -- session_id is only a grouping key here, but cast anyway:
               -- window SUM(int) is HUGEINT in DuckDB (see w4)
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts_ms) AS session_start_ms,
           MAX(ts_ms) + 7200000 AS session_end_ms,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="NATIVE session windows: Spark's built-in session_window(ts, gap) — the "
    "idiomatic twin of w4's hand-rolled lag+running-sum (same results, and the "
    "same operator Structured Streaming uses for streaming sessionization with "
    "state-store merging).  Event time is truncated to ms BEFORE windowing in "
    "both engines so merge decisions are precision-identical; an event exactly "
    "one gap after its predecessor MERGES (split only when diff > gap — "
    "session_window's touch-merges semantics, pinned by the boundary test in "
    "test_streaming_jobs).  Gap 2 h; session end = last event + gap.",
)
def w5_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.timestamp_millis(epoch_ms(F.col("ts"))).alias("ts_ms_t")
    )
    sw = F.session_window("ts_ms_t", "2 hours")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
        )
    )


@REG.add(
    "w6_retention_cohorts",
    """
    WITH ms AS (SELECT user_id, epoch_ms(ts) AS e FROM events),
    firsts AS (
        SELECT user_id, MIN(e) // 86400000 AS cohort_day FROM ms GROUP BY user_id
    )
    SELECT f.cohort_day * 86400000 AS cohort_day_ms,
           m.e // 86400000 - f.cohort_day AS day_offset,
           COUNT(DISTINCT m.user_id) AS n_active_users
    FROM ms m JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users bucketed by first-seen day, counted "
    "distinct per (cohort, day-offset) — the standard growth-analytics rollup. "
    "Two shuffles, both on user_id (first-seen agg, then the join is "
    "co-partitioned with it), plus the final cohort-cell agg; day truncation "
    "is pure epoch arithmetic (timezone-independent, floor-div parity per "
    "the a9 rule: Spark floor(x/y) == DuckDB x//y for non-negative epochs).",
)
def w6_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = _t(spark, sf_dir, "events").select("user_id", epoch_ms(F.col("ts")).alias("e"))
    day = lambda c: F.floor(c / 86_400_000).cast("long")  # noqa: E731
    firsts = ms.groupBy("user_id").agg(day(F.min("e")).alias("cohort_day"))
    return (
        ms.join(firsts, "user_id")
        .groupBy(
            (F.col("cohort_day") * 86_400_000).alias("cohort_day_ms"),
            (day(F.col("e")) - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


@REG.add(
    "w7_funnel",
    """
    WITH ms AS (SELECT user_id, event_type, epoch_ms(ts) AS e FROM events),
    v AS (SELECT user_id, MIN(e) AS first_view_ms FROM ms
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT m.user_id, MIN(m.e) AS first_click_ms
          FROM ms m JOIN v USING (user_id)
          WHERE m.event_type = 'click' AND m.e > v.first_view_ms
          GROUP BY m.user_id),
    p AS (SELECT m.user_id, MIN(m.e) AS first_purchase_ms
          FROM ms m JOIN c USING (user_id)
          WHERE m.event_type = 'purchase' AND m.e > c.first_click_ms
          GROUP BY m.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    doc="Ordered funnel (view -> click -> purchase, strictly increasing event "
    "time per user): per-stage first-timestamp joins keyed on user_id — every "
    "join and aggregate shares the user_id partitioning, so the funnel costs "
    "one logical shuffle reused across stages, never a per-user sort of the "
    "full event log.  Output is the per-stage completion count.",
)
def w7_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_ms(F.col("ts")).alias("e")
    )
    v = (
        ms.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("e").alias("first_view_ms"))
    )
    c = (
        ms.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("e") > F.col("first_view_ms"))
        .groupBy("user_id")
        .agg(F.min("e").alias("first_click_ms"))
    )
    p = (
        ms.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("e") > F.col("first_click_ms"))
        .groupBy("user_id")
        .agg(F.min("e").alias("first_purchase_ms"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


FUNNEL_WINDOW_MS = 3_600_000  # each step must follow the previous within 1h


@REG.add(
    "w8_funnel_windowed",
    f"""
    WITH ms AS (SELECT user_id, event_type, epoch_ms(ts) AS e FROM events),
    v AS (SELECT user_id, MIN(e) AS first_view_ms FROM ms
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT m.user_id, MIN(m.e) AS first_click_ms
          FROM ms m JOIN v USING (user_id)
          WHERE m.event_type = 'click' AND m.e > v.first_view_ms
                AND m.e <= v.first_view_ms + {FUNNEL_WINDOW_MS}
          GROUP BY m.user_id),
    p AS (SELECT m.user_id, MIN(m.e) AS first_purchase_ms
          FROM ms m JOIN c USING (user_id)
          WHERE m.event_type = 'purchase' AND m.e > c.first_click_ms
                AND m.e <= c.first_click_ms + {FUNNEL_WINDOW_MS}
          GROUP BY m.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_within_window,
           (SELECT COUNT(*) FROM p) AS n_purchased_within_window
    """,
    doc="Time-constrained funnel (view -> click -> purchase, each step within "
    "1h of the previous step's first completion): same single-logical-shuffle "
    "user_id-keyed join chain as w7, with a per-step deadline — the conversion "
    "window every product-analytics funnel actually uses.  Deadline is inclusive "
    "(<= first + W) and ms-exact in both engines.",
)
def w8_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_ms(F.col("ts")).alias("e")
    )
    v = (
        ms.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("e").alias("first_view_ms"))
    )
    c = (
        ms.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("e") > F.col("first_view_ms"))
            & (F.col("e") <= F.col("first_view_ms") + FUNNEL_WINDOW_MS)
        )
        .groupBy("user_id")
        .agg(F.min("e").alias("first_click_ms"))
    )
    p = (
        ms.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("e") > F.col("first_click_ms"))
            & (F.col("e") <= F.col("first_click_ms") + FUNNEL_WINDOW_MS)
        )
        .groupBy("user_id")
        .agg(F.min("e").alias("first_purchase_ms"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_within_window")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_within_window")))
    )


@REG.add(
    "w9_scd2_intervals",
    """
    SELECT user_id, event_id, event_type AS status,
           e AS valid_from_ms,
           LEAD(e) OVER (PARTITION BY user_id ORDER BY e, event_id) AS valid_to_ms,
           CAST(LEAD(e) OVER (PARTITION BY user_id ORDER BY e, event_id) IS NULL
                AS BIGINT) AS is_current
    FROM (SELECT user_id, event_id, event_type, epoch_ms(ts) AS e FROM events)
    """,
    doc="SCD Type-2 history build: each event opens a validity interval "
    "[valid_from_ms, valid_to_ms) closed by the user's next event (LEAD over "
    "the cross-engine-stable (epoch_ms, event_id) order) — the dimension-table "
    "versioning every warehouse derives from a change log.  NULL valid_to = "
    "current row, also surfaced as an is_current flag.  The window partitions "
    "by user_id, so the build is embarrassingly parallel; it is the "
    "interval-producing inverse of u3's last-event-wins snapshot (u3 == the "
    "is_current=1 slice).",
)
def w9_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", epoch_ms(F.col("ts")).alias("e")
    )
    w = Window.partitionBy("user_id").orderBy("e", "event_id")
    nxt = F.lead("e").over(w)
    return ms.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("status"),
        F.col("e").alias("valid_from_ms"),
        nxt.alias("valid_to_ms"),
        nxt.isNull().cast("long").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# F12: JSON property extraction (training pipelines carry JSON metadata
# columns; the reference's only JSON is config-plane — SURVEY §2.8 note)
# ---------------------------------------------------------------------------


@REG.add(
    "f12_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(ROUND(CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
                      / COUNT(*), 6) AS DOUBLE) AS k_avg
    FROM events GROUP BY event_type
    """,
    doc="F12 (extension): JSON path extraction from the events.props metadata "
    "column + grouped stats.  get_json_object stays in codegen (no Python); "
    "k_avg derived from the exact integer sum so both engines divide identical "
    "numerators (double-summation order never enters).",
)
def f12_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.sum("k").alias("k_sum"),
        F.round(F.sum("k").cast("double") / F.count("*"), 6).alias("k_avg"),
    )


# ---------------------------------------------------------------------------
# W10: rolling-window anomaly detection on daily event volumes
# ---------------------------------------------------------------------------


@REG.add(
    "w10_anomaly_zscore",
    """
    WITH daily AS (
        SELECT event_type, epoch_ms(ts) // 86400000 AS day_bucket,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type, day_bucket
    ),
    stats AS (
        SELECT event_type, day_bucket, cnt,
               AVG(cnt) OVER w AS mu,
               STDDEV_SAMP(cnt) OVER w AS sd
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_bucket
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day_bucket, cnt,
           CAST(ROUND((cnt - mu) / NULLIF(sd, 0), 6) AS DOUBLE) AS zscore,
           COALESCE(ABS(ROUND((cnt - mu) / NULLIF(sd, 0), 6)) > 2.0, FALSE) AS is_anomaly
    FROM stats
    """,
    doc="W10 (extension): trailing-7-day z-score anomaly flags on daily event "
    "volumes — the monitoring query a pipeline runs over ingest rates.  One "
    "keyed shuffle for the daily rollup (map-side combined), then a bounded "
    "ROWS-frame window per event_type: frame state is 7 rows regardless of "
    "history length, so the plan scales with days x types, not events.",
)
def w10_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .select("event_type", (epoch_ms(F.col("ts")) / 86_400_000).cast("long").alias("day_bucket"))
        .groupBy("event_type", "day_bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_bucket")
        .rowsBetween(-7, -1)
    )
    stats = daily.withColumn("mu", F.avg("cnt").over(w)).withColumn(
        "sd", F.stddev_samp("cnt").over(w)
    )
    # NULLIF guard: a frame of identical counts has sd = 0 (ANSI division
    # would throw); zscore is NULL there and is_anomaly coalesces to false
    z = F.round((F.col("cnt") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 6)
    return stats.select(
        "event_type",
        "day_bucket",
        "cnt",
        z.cast("double").alias("zscore"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# J9: full-outer reconciliation (completes the join-type surface: the
# data-quality check every warehouse runs between a header table and
# its detail aggregate)
# ---------------------------------------------------------------------------


@REG.add(
    "j9_full_outer_reconcile",
    """
    WITH li AS (
        SELECT l_orderkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS li_total
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderkey, o.o_totalprice, li.l_orderkey, li.li_total
        FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
    ),
    c AS (
        SELECT CASE WHEN l_orderkey IS NULL THEN 'no_lineitems'
                    WHEN o_orderkey IS NULL THEN 'no_order'
                    WHEN ABS(o_totalprice - CAST(li_total AS DOUBLE)) > 0.01
                         THEN 'mismatch'
                    ELSE 'consistent' END AS status,
               CASE WHEN o_orderkey IS NULL OR l_orderkey IS NULL THEN 0.0
                    ELSE ABS(o_totalprice - CAST(li_total AS DOUBLE)) END AS diff
        FROM j
    )
    SELECT status, COUNT(*) AS n_keys,
           CAST(SUM(CAST(ROUND(diff, 4) AS DECIMAL(18,4))) AS DOUBLE) AS total_abs_diff
    FROM c GROUP BY status
    """,
    doc="J9 (extension): header-vs-detail reconciliation via FULL OUTER join — "
    "orders without lineitems, lineitems without orders, and totals that "
    "disagree beyond a cent.  Detail side pre-aggregated (map-side combined) "
    "before the join so the full-outer is key-to-key, never row-to-row; money "
    "sums ride DECIMAL so both engines agree bit-for-bit regardless of "
    "aggregation order.",
)
def j9_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("li_total"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"], "full_outer")
    diff_expr = F.abs(F.col("o_totalprice") - F.col("li_total").cast("double"))
    status = (
        F.when(F.col("l_orderkey").isNull(), "no_lineitems")
        .when(F.col("o_orderkey").isNull(), "no_order")
        .when(diff_expr > 0.01, "mismatch")
        .otherwise("consistent")
    )
    diff = F.when(
        F.col("o_orderkey").isNull() | F.col("l_orderkey").isNull(), F.lit(0.0)
    ).otherwise(diff_expr)
    return (
        j.select(status.alias("status"), diff.alias("diff"))
        .groupBy("status")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(F.round(F.col("diff"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_abs_diff"),
        )
    )


def _gsplit_u() -> str:
    from .message_domain import _u

    return _u("gsplit", "source")


@REG.add(
    "smp4_group_split",
    f"""
    SELECT doc_id, source,
           CASE WHEN {_gsplit_u()} < 0.8 THEN 'train'
                WHEN {_gsplit_u()} < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Group-aware train/val/test split: the hash is taken over SOURCE, not "
    "doc_id, so every document from one origin lands in the same split — the "
    "leakage guard stratified/per-doc splits (smp3) cannot give when near-dups "
    "cluster within a source.  Pure per-row hash: no shuffle, no global sort, "
    "reproducible on any cluster.",
)
def smp4_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    u = det_uniform("source", seed="gsplit")
    split = F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    return doc.select("doc_id", "source", split.alias("split"))


@REG.add(
    "u6_merge_upsert",
    """
    WITH target AS (
        SELECT c_custkey AS k, c_acctbal AS bal FROM customer WHERE c_custkey <= 400
    ),
    changes AS (
        SELECT event_id % 500 AS k,
               CASE WHEN event_id % 11 = 0 THEN 'delete' ELSE 'upsert' END AS op,
               CAST(ROUND(value * 100, 2) AS DOUBLE) AS new_bal,
               epoch_ms(ts) AS change_ms
        FROM events WHERE event_id < 1000
    ),
    latest AS (
        SELECT k, op, new_bal FROM (
            SELECT k, op, new_bal,
                   ROW_NUMBER() OVER (PARTITION BY k
                                      ORDER BY change_ms DESC, op, new_bal) AS rn
            FROM changes
        ) WHERE rn = 1
    )
    SELECT COALESCE(t.k, c.k) AS k,
           CASE WHEN c.k IS NULL THEN 'unchanged'
                WHEN c.op = 'delete' THEN NULL
                ELSE 'upserted' END AS row_status,
           CASE WHEN c.k IS NULL THEN t.bal ELSE c.new_bal END AS bal
    FROM target t FULL OUTER JOIN latest c ON t.k = c.k
    WHERE c.op IS NULL OR c.op <> 'delete'
    """,
    doc="U6 (extension): full MERGE semantics — apply a change stream (upserts "
    "+ delete tombstones, last-change-wins per key) to a target snapshot, the "
    "Delta/Iceberg MERGE INTO re-expressed as change-dedup + one key-to-key "
    "full-outer join.  Matched+upsert -> update, unmatched+upsert -> insert, "
    "matched+delete -> drop, everything else passes through.  The change side "
    "collapses to <= |keys| rows BEFORE the join (window last-wins), so the "
    "join never sees the raw change volume.",
)
def u6_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("bal"))
    )
    ch = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 1000)
        .select(
            (F.col("event_id") % 500).alias("k"),
            F.when(F.col("event_id") % 11 == 0, "delete").otherwise("upsert").alias("op"),
            F.round(F.col("value") * 100, 2).cast("double").alias("new_bal"),
            epoch_ms(F.col("ts")).alias("change_ms"),
        )
    )
    w = Window.partitionBy("k").orderBy(
        F.col("change_ms").desc(), F.col("op"), F.col("new_bal")
    )
    latest = ch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop(
        "rn", "change_ms"
    )
    t = target.alias("t")
    c = latest.alias("c")
    j = t.join(c, F.col("t.k") == F.col("c.k"), "full_outer")
    merged = j.select(
        F.coalesce(F.col("t.k"), F.col("c.k")).alias("k"),
        F.when(F.col("c.k").isNull(), "unchanged")
        .when(F.col("c.op") == "delete", F.lit(None).cast("string"))
        .otherwise("upserted")
        .alias("row_status"),
        F.when(F.col("c.k").isNull(), F.col("t.bal")).otherwise(F.col("c.new_bal")).alias(
            "bal"
        ),
    ).where(
        F.col("c.op").isNull() | (F.col("c.op") != "delete")
    )
    return merged


@REG.add(
    "a12_exact_group_median",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(ROUND(AVG(value), 6) AS DOUBLE) AS median_value,
           CAST(MAX(n) AS BIGINT) AS n
    FROM ranked
    WHERE rk IN ((n + 1) / 2, (n + 2) / 2)
    GROUP BY event_type
    """,
    doc="A12 (extension): EXACT per-group median via rank selection — both "
    "engines evaluate (n+1)/2 and (n+2)/2 as FLOAT division, so the integer "
    "rank rk matches exactly one of them: the true middle for odd n, the "
    "UPPER median for even n (deterministic upper-median variant; a unique "
    "(value, event_id) order makes ties unambiguous).  No percentile_approx "
    "sketch, no cross-engine estimator drift.  One partition-keyed window "
    "pass; the rank runs per event_type, so the total order is per-group, "
    "not global.",
)
def a12_exact_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    mid = ranked.filter(
        (F.col("rk") == (F.col("n") + 1) / 2) | (F.col("rk") == (F.col("n") + 2) / 2)
    )
    return mid.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).cast("double").alias("median_value"),
        F.max("n").cast("long").alias("n"),
    )


MORTON_BITS = 16


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(MORTON_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


@REG.add(
    "f13_morton_code",
    f"""
    SELECT event_id,
           user_id % 65536 AS x,
           (epoch_ms(ts) // 86400000) % 65536 AS y,
           {_morton_sql("(user_id % 65536)", "((epoch_ms(ts) // 86400000) % 65536)")} AS morton
    FROM events
    """,
    doc=f"F13 (extension): Morton/Z-order code — {MORTON_BITS}-bit interleave of "
    "(user_id, day) into one sort key.  Writing data ordered by this code "
    "clusters BOTH dimensions into the same parquet row groups, so min/max "
    "stats prune scans for predicates on either column — the write-once "
    "layout lever for multi-predicate workloads (Delta/Iceberg Z-ORDER "
    "re-expressed as a pure column).  Bit ops only: stays in codegen, zero "
    "shuffle; bit-identical across engines so the oracle is exact.",
)
def f13_morton_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 65536).alias("x"),
        ((epoch_ms(F.col("ts")) / 86_400_000).cast("long") % 65536).alias("y"),
    )
    morton = None
    for i in range(MORTON_BITS):
        xb = F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        bits = xb.bitwiseOR(yb)
        morton = bits if morton is None else morton.bitwiseOR(bits)
    return ev.select("event_id", "x", "y", morton.alias("morton"))


WSAMPLE_N = 200  # sampled docs per run (token-budget stand-in)


def _wsample_u() -> str:
    from .message_domain import _u

    return _u("wsample", "CAST(doc_id AS VARCHAR)")


@REG.add(
    "smp5_weighted_sample",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                   AS n_tokens,
               {_wsample_u()} AS u
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, n_tokens,
               ROUND(pow(u, 1.0 / CAST(n_tokens AS DOUBLE)), 9) AS sample_key
        FROM t
    )
    SELECT doc_id, n_tokens, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT {WSAMPLE_N}
    """,
    doc=f"SMP5 (extension): weighted sampling WITHOUT replacement via the "
    f"Efraimidis-Spirakis exponential-race key — per doc, key = u^(1/w) with "
    "u a deterministic md5 uniform and w = token count, then global top-"
    f"{WSAMPLE_N} by key.  Equivalent to drawing docs one at a time with "
    "probability proportional to length until the budget fills (token-budget-"
    "aware corpus subsampling: longer docs proportionally likelier), but "
    "expressed as one embarrassingly-parallel scan + a distributed top-k "
    "(TakeOrderedAndProject: per-partition heaps, no global sort, no shuffle "
    "of the corpus).  The key is rounded to 9dp BEFORE ordering (both "
    "engines), the repo's standard guard against libm ULP drift flipping a "
    "boundary rank; doc_id breaks exact ties identically everywhere.",
)
def smp5_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.expressions import det_uniform

    doc = _t(spark, sf_dir, "documents")
    spaces = F.length(F.col("text")) - F.length(F.expr("replace(text, ' ', '')"))
    n_tokens = (spaces + 1).cast("long")
    u = det_uniform("doc_id", seed="wsample")
    key = F.round(F.pow(u, F.lit(1.0) / n_tokens.cast("double")), 9)
    return (
        doc.select("doc_id", n_tokens.alias("n_tokens"), key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(WSAMPLE_N)
    )
