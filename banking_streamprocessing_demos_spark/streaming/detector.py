"""ST1 — the flagship stateful timeout detector.

Spec (reference README.md:31-35): "A stateful stream processor that
tracks message IDs and their delivery status, alerting when messages
remain undelivered after a configurable timeout."  Never implemented in
the reference; implemented here on ``applyInPandasWithState`` (public
API, Spark 3.4+) with event-time timers:

- key = message_id (the Kafka key, py:416,428-429)
- state = {first_sent_ms, phone_number, carrier, delivered_ms, alerted}
- on `sent`: first_sent_ms = min (heartbeat dedup, SURVEY §1.3 — sent
  events repeat every 30 s, py:540-568); register event-time timer at
  first_sent_ms + timeout
- on `delivered` (first): emit a `delivered` latency record
- on timer without delivery: emit an `alert` record (provisional)
- late `delivered` after alert: emit `late_delivered` — alerts are
  append-only alert/resolution pairs because emitted rows can't be
  retracted (ST5; SURVEY §7 risk item 1)
- duplicates are absorbed by keyed state (ST6 at-least-once, py:354-358)

State is removed one timeout period after resolution, bounding the
store; with RocksDB state store this scales to ~arbitrary key counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("message_id", StringType(), False),
        StructField("kind", StringType(), False),  # alert | delivered | late_delivered
        StructField("phone_number", LongType(), True),
        StructField("carrier", StringType(), True),
        StructField("first_sent_ms", LongType(), True),
        StructField("event_ms", LongType(), True),
        StructField("latency_ms", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_sent_ms", LongType(), True),
        StructField("phone_number", LongType(), True),
        StructField("carrier", StringType(), True),
        StructField("delivered_ms", LongType(), True),
        StructField("alerted", BooleanType(), True),
        StructField("resolved", BooleanType(), True),
    ]
)


_OUT_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


def _out_frame(rows: list[tuple]) -> pd.DataFrame:
    """Output frame from row TUPLES via ONE object-dtype 2-D block —
    measured 93 us vs 231 us for pd.DataFrame(list_of_dicts) and 582 us
    for a dict-of-lists constructor (round-13 profile: output-frame
    construction was 83% of the update fn's wall; a single ndarray
    block skips pandas' per-column sanitize/infer entirely).  Arrow
    serialization coerces the object columns to OUTPUT_SCHEMA exactly
    as it did the mixed dtypes the dict constructor produced."""
    arr = np.empty((len(rows), len(_OUT_COLS)), dtype=object)
    for i, r in enumerate(rows):
        arr[i] = r
    return pd.DataFrame(arr, columns=_OUT_COLS)


def make_detector_fn(timeout_ms: int, late_slack_ms: int | None = None):
    """Build the per-key state-update function.  ``late_slack_ms`` bounds
    how long post-alert state lingers to catch late deliveries (default:
    one extra timeout period)."""
    slack = late_slack_ms if late_slack_ms is not None else timeout_ms

    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (message_id,) = key
        out: list[tuple[Any, ...]] = []

        def set_timer(ts_ms: int) -> None:
            # a timer at/before the watermark would be rejected; clamp
            # forward so eviction still happens on the next advance
            state.setTimeoutTimestamp(max(ts_ms, state.getCurrentWatermarkMs() + 1))

        if state.exists:
            first_sent, phone, carrier, delivered, alerted, resolved = state.get
        else:
            first_sent = phone = carrier = delivered = None
            alerted = resolved = False

        if state.hasTimedOut:
            if delivered is None and not alerted:
                out.append(
                    (message_id, "alert", phone, carrier, first_sent,
                     (first_sent or 0) + timeout_ms, None)
                )
                alerted = True
                state.update((first_sent, phone, carrier, delivered, alerted, resolved))
                # linger to pair a late delivery with this alert
                set_timer((first_sent or 0) + timeout_ms + slack)
            else:
                # resolution window elapsed (or already resolved) → evict
                state.remove()
            if out:
                yield _out_frame(out)
            return

        # hot path: one invocation per key per batch — stay in numpy
        # (pandas label slicing here costs ~3x at 100k keys/s)
        new_delivered_events = []
        for pdf in pdfs:
            status = pdf["status"].to_numpy()
            ts = pdf["timestamp"].to_numpy()
            sent_mask = status == "sent"
            if sent_mask.any():
                m = int(ts[sent_mask].min())
                if first_sent is None or m < first_sent:
                    first_sent = m
                i = int(sent_mask.argmax())
                phone = int(pdf["phone_number"].iat[i])
                carrier = str(pdf["carrier"].iat[i])
            del_mask = status == "delivered"
            if del_mask.any():
                new_delivered_events.append(int(ts[del_mask].min()))
                if phone is None:
                    i = int(del_mask.argmax())
                    phone = int(pdf["phone_number"].iat[i])
                    carrier = str(pdf["carrier"].iat[i])

        deadline = (first_sent + timeout_ms) if first_sent is not None else None

        def emit_alert() -> None:
            out.append(
                (message_id, "alert", phone, carrier, first_sent, deadline, None)
            )

        if new_delivered_events and delivered is None:
            delivered = min(new_delivered_events)
            # classify in EVENT time so output is deterministic under any
            # replay batching: a delivery past the deadline was late even
            # if it arrived before the watermark crossed (ST5)
            if deadline is not None and delivered > deadline and not alerted:
                emit_alert()
                alerted = True
            latency = delivered - first_sent if first_sent is not None else None
            kind = "late_delivered" if alerted else "delivered"
            out.append(
                (message_id, kind, phone, carrier, first_sent, delivered, latency)
            )
            resolved = True

        # data-path watermark check: event-time timers only fire for keys
        # with NO data in a batch, and heartbeating keys always have data
        # (ST2) — so the deadline must also be enforced here
        if (
            not alerted
            and delivered is None
            and deadline is not None
            and state.getCurrentWatermarkMs() >= deadline
        ):
            emit_alert()
            alerted = True

        if not state.exists and first_sent is None and delivered is None:
            # batch carried no sent/delivered for a fresh key (unknown or
            # malformed status): creating state here would arm NO timer —
            # an immortal state-store entry.  Emit nothing, keep no state.
            return

        state.update((first_sent, phone, carrier, delivered, alerted, resolved))
        # the timeout timestamp does not survive an invocation — re-arm
        # the timer on every call that keeps state alive
        if resolved:
            # keep state briefly so duplicate `delivered`s stay silent
            anchor = delivered if delivered is not None else first_sent or 0
            set_timer(anchor + slack)
        elif alerted:
            # alert already fired; linger for a late delivery
            set_timer((first_sent or 0) + timeout_ms + slack)
        elif first_sent is not None:
            set_timer(first_sent + timeout_ms)

        if out:
            yield _out_frame(out)

    return update


def detect_undelivered(
    events: DataFrame,
    timeout_ms: int,
    watermark_delay: str = "30 seconds",
    late_slack_ms: int | None = None,
) -> DataFrame:
    """Wire the detector onto a STREAMING MESSAGE_EVENT_SCHEMA DataFrame.
    Adds ``event_time`` from the ms-epoch wire timestamp, watermarks it,
    groups by key, applies the stateful function.

    Streaming-only by Spark's contract: applyInPandasWithState raises in
    batch queries — the batch twin is
    ``operators.snapshot.timeout_alerts_batch`` (hash-checked against
    the same semantics)."""
    if not events.isStreaming:
        raise ValueError(
            "detect_undelivered requires a streaming DataFrame "
            "(applyInPandasWithState is unsupported in batch); use "
            "operators.snapshot.timeout_alerts_batch for the batch twin"
        )
    from .jobs import with_event_time

    with_time = with_event_time(events, watermark_delay)
    return (
        with_time.groupBy("message_id")
        .applyInPandasWithState(
            make_detector_fn(timeout_ms, late_slack_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
