"""ST1 on Spark 4's native stateful API: ``transformWithStateInPandas``.

Same contract as streaming/detector.py (the applyInPandasWithState
implementation): identical OUTPUT_SCHEMA, identical event-time
semantics — deliveries classified against the deadline in event time,
alerts exactly once per undelivered message, late deliveries emit
resolution records.  Tests assert the two implementations produce the
same output on the same replay.

Why both exist: applyInPandasWithState is the portable 3.4+ API;
transformWithStateInPandas is the forward path — typed value state,
explicit timer registration, TTL support, and it REQUIRES the RocksDB
state store provider, which is also the right provider for 100 TB key
cardinalities (state spills to disk instead of executor heap).

Environment note: the TWS python driver worker speaks its state-server
protocol over protobuf; in environments without the protobuf package
(such as this container) only the applyInPandasWithState detector can
execute — the equivalence test skips itself accordingly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .detector import OUTPUT_SCHEMA

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


class UndeliveredDetector(StatefulProcessor):
    """Per-key (message_id) lifecycle state machine with event-time
    timers (README.md:31-35 spec; SURVEY §2.9 ST1)."""

    def __init__(self, timeout_ms: int, late_slack_ms: int | None = None):
        self.timeout_ms = timeout_ms
        self.slack = late_slack_ms if late_slack_ms is not None else timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("lifecycle", STATE_SCHEMA)

    # -- helpers -----------------------------------------------------------

    def _get(self):
        if self.state.exists():
            return tuple(self.state.get())
        return (None, None, None, None, False, False)

    def _row(self, message_id, kind, phone, carrier, first_sent, event_ms, latency):
        return pd.DataFrame(
            [
                {
                    "message_id": message_id,
                    "kind": kind,
                    "phone_number": phone,
                    "carrier": carrier,
                    "first_sent_ms": first_sent,
                    "event_ms": event_ms,
                    "latency_ms": latency,
                }
            ],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )

    def _set_timer(self, ts_ms: int, watermark_ms: int) -> None:
        # clear stale timers (TWS timers persist until deleted) and arm
        # the new one strictly ahead of the watermark
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(max(ts_ms, watermark_ms + 1))

    # -- data path ---------------------------------------------------------

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (message_id,) = key
        had_state = self.state.exists()
        first_sent, phone, carrier, delivered, alerted, resolved = self._get()
        watermark = timerValues.getCurrentWatermarkInMs()

        new_delivered = []
        for pdf in rows:
            sent = pdf.loc[pdf["status"] == "sent"]
            if len(sent):
                m = int(sent["timestamp"].min())
                if first_sent is None or m < first_sent:
                    first_sent = m
                r = sent.iloc[0]
                phone, carrier = int(r["phone_number"]), str(r["carrier"])
            dl = pdf.loc[pdf["status"] == "delivered"]
            if len(dl):
                new_delivered.append(int(dl["timestamp"].min()))
                if phone is None:
                    r = dl.iloc[0]
                    phone, carrier = int(r["phone_number"]), str(r["carrier"])

        deadline = (first_sent + self.timeout_ms) if first_sent is not None else None

        if new_delivered and delivered is None:
            delivered = min(new_delivered)
            if deadline is not None and delivered > deadline and not alerted:
                yield self._row(message_id, "alert", phone, carrier, first_sent, deadline, None)
                alerted = True
            latency = delivered - first_sent if first_sent is not None else None
            kind = "late_delivered" if alerted else "delivered"
            yield self._row(message_id, kind, phone, carrier, first_sent, delivered, latency)
            resolved = True

        if not alerted and delivered is None and deadline is not None and watermark >= deadline:
            yield self._row(message_id, "alert", phone, carrier, first_sent, deadline, None)
            alerted = True

        if not had_state and first_sent is None and delivered is None:
            # no sent/delivered for a fresh key: creating state would arm
            # no timer → immortal entry (mirrors detector.py's guard)
            return

        self.state.update((first_sent, phone, carrier, delivered, alerted, resolved))
        if resolved:
            # explicit None check: `delivered or ...` would skip a
            # legitimate epoch-0 delivered timestamp
            anchor = delivered if delivered is not None else (first_sent or 0)
            self._set_timer(anchor + self.slack, watermark)
        elif alerted:
            self._set_timer((first_sent or 0) + self.timeout_ms + self.slack, watermark)
        elif first_sent is not None:
            self._set_timer(deadline, watermark)

    # -- timer path --------------------------------------------------------

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        (message_id,) = key
        first_sent, phone, carrier, delivered, alerted, resolved = self._get()
        watermark = timerValues.getCurrentWatermarkInMs()
        if delivered is None and not alerted and first_sent is not None:
            yield self._row(
                message_id, "alert", phone, carrier, first_sent, first_sent + self.timeout_ms, None
            )
            self.state.update((first_sent, phone, carrier, delivered, True, resolved))
            self._set_timer(first_sent + self.timeout_ms + self.slack, watermark)
        else:
            # resolution window elapsed → evict state and timers
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.state.clear()

    def close(self) -> None:
        pass


def detect_undelivered_tws(
    events: DataFrame,
    timeout_ms: int,
    watermark_delay: str = "30 seconds",
    late_slack_ms: int | None = None,
) -> DataFrame:
    """Wire the TWS detector onto a streaming MESSAGE_EVENT_SCHEMA
    DataFrame.  Requires the RocksDB state store provider
    (get_spark(rocksdb_state=True))."""
    with_time = events.withColumn("event_time", F.timestamp_millis(F.col("timestamp")))
    if with_time.isStreaming:
        with_time = with_time.withWatermark("event_time", watermark_delay)
    return with_time.groupBy("message_id").transformWithStateInPandas(
        UndeliveredDetector(timeout_ms, late_slack_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
