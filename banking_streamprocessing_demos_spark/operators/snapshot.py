"""Event-sourced snapshot reconstruction for the message domain.

The reference mutates a SQLite ``messages`` row per status transition
(U3/U4/U5, phone_message_producer.py:211-229, 610-614).  Spark-first,
the table is *derived*: a pure aggregation over the append-only
``message_status`` stream, idempotent under at-least-once duplicates
(min/max absorb re-delivery) — SURVEY §2.7 / risk item 5.

`messages` is derivable from `message_status` by:
  groupBy(message_id): min(ts) as sent_time,
  max(ts) filter sent as last_heartbeat,
  min(ts) filter delivered as delivered_time       (FIXTURES.md §3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def messages_snapshot(events: DataFrame) -> DataFrame:
    """Reconstruct current message state from MESSAGE_EVENT_SCHEMA rows."""
    sent_ts = F.when(F.col("status") == "sent", F.col("timestamp"))
    delivered_ts = F.when(F.col("status") == "delivered", F.col("timestamp"))
    return events.groupBy("message_id").agg(
        F.first("phone_number").alias("phone_number"),
        F.first("carrier").alias("carrier"),
        F.min(sent_ts).alias("sent_time"),
        F.max(sent_ts).alias("last_heartbeat"),
        F.min(delivered_ts).alias("delivered_time"),
        F.count(F.when(F.col("status") == "sent", 1)).alias("n_sent_events"),
    ).select(
        "message_id",
        "phone_number",
        "carrier",
        F.when(F.col("delivered_time").isNotNull(), F.lit("delivered"))
        .otherwise(F.lit("sent"))
        .alias("status"),
        "sent_time",
        "delivered_time",
        "last_heartbeat",
        "n_sent_events",
    )


def carrier_active_counts(events: DataFrame) -> DataFrame:
    """J1/A3 in the message domain (py:266-272): active (undelivered)
    message count per carrier, from the snapshot."""
    snap = messages_snapshot(events)
    return snap.filter(F.col("status") != "delivered").groupBy("carrier").agg(
        F.count("*").alias("active_count")
    )


def timeout_alerts_batch(events: DataFrame, timeout_ms: int) -> DataFrame:
    """Batch twin of the streaming detector (ST1): alert rows for messages
    with no `delivered` within timeout of first `sent` (FIXTURES.md §4).
    Ground truth for the streaming invariant tests."""
    snap = messages_snapshot(events)
    alerted = F.col("delivered_time").isNull() | (
        F.col("delivered_time") - F.col("sent_time") > timeout_ms
    )
    return snap.filter(alerted).select(
        "message_id",
        "phone_number",
        "carrier",
        F.col("sent_time").alias("first_sent_time"),
        (F.col("sent_time") + timeout_ms).alias("alert_time"),
        F.col("delivered_time").isNotNull().alias("resolved_late"),
    )
