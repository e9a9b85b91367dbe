"""ST1 fallback plan (SURVEY §2.4 J5): the undelivered-message detector
as a watermarked stream-stream OUTER join instead of custom state.

Mechanics: first-sent events (deduplicated within the watermark) left-
outer-joined to deliveries under a time-range condition
``delivered.ts BETWEEN sent.ts AND sent.ts + timeout``.  Spark buffers
both sides in the state store and emits the unmatched (alert) rows only
once the watermark proves no match can arrive — so alerts surface one
watermark delay after the deadline, vs exactly at the deadline for the
stateful detector.  Late deliveries (past the timeout) fall outside the
join window by construction and surface only through the stateful
detector's `late_delivered` records.

This variant exists because it is all built-in operators — no Python in
the loop, every row stays JVM-side — making it the highest-throughput
plan when only the alert/delivered-within-timeout classification is
needed (~800k events/s on local[16] vs ~100k for the pandas-stateful
detector).  The stateful detector (detector.py) remains the primary plan:
it additionally emits latency records, late-delivery resolutions, and
exact-deadline alert times.

First-sent caveat: the sent side is deduplicated with
dropDuplicatesWithinWatermark, which keeps the first-ARRIVING row per
message_id — under in-watermark reordering (a heartbeat arriving before
the original sent) the join deadline anchors to that row's timestamp,
not the true minimum.  The pandas-stateful detector takes min() over
all arrivals and is authoritative; this variant trades exact deadline
anchoring for all-JVM throughput (a streaming min() aggregation before
a stream-stream join is unsupported by Spark, so the dedup is the only
bounded-state option).  With ordered per-key input (Kafka's per-key
ordering guarantee) the two agree exactly — the condition the batch
twin and tests replay.

Outer-row flush semantics (Spark 4.1, pinned by
tests/test_detector_join.py::test_outer_row_flush_semantics):

- Matched (inner) rows emit in the micro-batch where the later side
  arrives — no watermark involvement.
- Unmatched (alert) rows emit when the GLOBAL watermark passes
  ``first_sent + timeout``; the global watermark is the MINIMUM of the
  two sides' event-time watermarks, so an idle `delivered` side pins
  it and strands `sent`-side outer rows even while sent events keep
  flowing.  This — not batch scheduling — is why a one-sided tail
  appears "stuck".
- availableNow's trailing no-data batch DOES advance the watermark
  (computed from the last data batch) and DOES flush outer rows that
  became eligible; what stays buffered forever on stream stop is only
  the tail whose join window closes after the final global watermark.

In production the topic carries heartbeats AND deliveries, so both
sides' watermarks keep moving; in replay tests a trailing pusher event
per side serves the same role.  The stateful detector remains primary —
its timers need no second-side data to fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_undelivered_join(
    events: DataFrame,
    timeout_ms: int,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Alert/delivered classification via stream-stream left outer join.

    Returns rows (message_id, phone_number, carrier, first_sent_ms,
    delivered_ms, alerted) — one per message; ``alerted`` is true when
    no delivery arrived within ``timeout_ms`` of the first `sent`.
    """
    with_time = events.withColumn("event_time", F.timestamp_millis(F.col("timestamp")))

    sent = (
        with_time.filter(F.col("status") == "sent")
        .select("message_id", "phone_number", "carrier", "timestamp", "event_time")
    )
    delivered = with_time.filter(F.col("status") == "delivered").select(
        F.col("message_id").alias("d_message_id"),
        F.col("timestamp").alias("d_timestamp"),
        F.col("event_time").alias("d_event_time"),
    )

    if events.isStreaming:
        sent = sent.withWatermark("event_time", watermark_delay)
        delivered = delivered.withWatermark("d_event_time", watermark_delay)
        # at-least-once dedup on BOTH sides.  Constraint of this plan:
        # dropDuplicatesWithinWatermark only deduplicates inside the
        # watermark window, so heartbeat re-emissions spaced wider than
        # the watermark delay produce one left row each — this variant
        # needs heartbeats filtered upstream (or watermark >= heartbeat
        # span).  The stateful detector has no such constraint, which is
        # one reason it is the primary plan.
        sent = sent.dropDuplicatesWithinWatermark(["message_id"])
        delivered = delivered.dropDuplicatesWithinWatermark(["d_message_id"])
    else:
        sent = (
            sent.groupBy("message_id")
            .agg(
                F.min("timestamp").alias("timestamp"),
                F.first("phone_number").alias("phone_number"),
                F.first("carrier").alias("carrier"),
            )
            .withColumn("event_time", F.timestamp_millis(F.col("timestamp")))
        )
        # batch twin of the streaming-side dedup: at-least-once re-sends
        # of `delivered` must not produce duplicate join matches
        delivered = (
            delivered.groupBy("d_message_id")
            .agg(F.min("d_timestamp").alias("d_timestamp"))
            .withColumn("d_event_time", F.timestamp_millis(F.col("d_timestamp")))
        )

    joined = sent.join(
        delivered,
        (F.col("message_id") == F.col("d_message_id"))
        & (F.col("d_event_time") >= F.col("event_time"))
        & (
            F.col("d_event_time")
            <= F.col("event_time") + F.expr(f"INTERVAL {timeout_ms} MILLISECONDS")
        ),
        "left_outer",
    )
    return joined.select(
        "message_id",
        "phone_number",
        "carrier",
        F.col("timestamp").alias("first_sent_ms"),
        F.col("d_timestamp").alias("delivered_ms"),
        F.col("d_timestamp").isNull().alias("alerted"),
    )
