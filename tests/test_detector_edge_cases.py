"""Hand-crafted adversarial replays for the detector: out-of-order
events within the watermark, delivered-without-sent orphans, duplicate
deliveries arriving in later batches, and heartbeats continuing after
delivery (at-least-once reality, ST6)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from banking_streamprocessing_demos_spark.streaming.detector import detect_undelivered
from banking_streamprocessing_demos_spark.streaming.jobs import read_event_stream_from_files

T0 = 1_700_000_000_000
TIMEOUT = 60_000

SCHEMA = pa.schema(
    [
        ("message_id", pa.string()),
        ("status", pa.string()),
        ("phone_number", pa.int64()),
        ("carrier", pa.string()),
        ("timestamp", pa.int64()),
    ]
)


def _write_chunks(path: str, chunks: list[list[tuple]]) -> None:
    for i, rows in enumerate(chunks):
        pdf = pd.DataFrame(
            rows, columns=["message_id", "status", "phone_number", "carrier", "timestamp"]
        )
        f = os.path.join(path, f"c{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, schema=SCHEMA, preserve_index=False), f)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))


def _run(spark, path, ckpt, name):
    stream = read_event_stream_from_files(spark, path, max_files_per_trigger=1)
    det = detect_undelivered(stream, TIMEOUT, watermark_delay="5 seconds")
    q = (
        det.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).toPandas()


def test_out_of_order_sent_updates_first_sent(spark, tmp_path):
    """A heartbeat arrives before the true first `sent` (reordering
    within the watermark): latency must be measured from the EARLIEST
    sent timestamp, not arrival order (§1.3 heartbeat-dedup invariant)."""
    chunks = [
        [("m1", "sent", 1, "att", T0 + 30_000)],        # heartbeat arrives first
        [("m1", "sent", 1, "att", T0)],                 # true first sent, late arrival
        [("m1", "delivered", 1, "att", T0 + 45_000)],
        [("mx", "sent", 9, "att", T0 + 400_000)],       # watermark pusher
    ]
    _write_chunks(str(tmp_path), chunks)
    out = _run(spark, str(tmp_path), str(tmp_path / "ck"), "edge_ooo")
    d = out.loc[out["message_id"] == "m1"]
    assert list(d["kind"]) == ["delivered"]
    assert int(d["first_sent_ms"].iloc[0]) == T0
    assert int(d["latency_ms"].iloc[0]) == 45_000


def test_orphan_delivered_without_sent(spark, tmp_path):
    """A `delivered` whose `sent` was lost upstream must not crash and
    must emit a resolution with null first_sent/latency."""
    chunks = [
        [("orphan", "delivered", 2, "verizon", T0 + 10_000)],
        [("mx", "sent", 9, "att", T0 + 400_000)],
    ]
    _write_chunks(str(tmp_path), chunks)
    out = _run(spark, str(tmp_path), str(tmp_path / "ck"), "edge_orphan")
    d = out.loc[out["message_id"] == "orphan"]
    assert list(d["kind"]) == ["delivered"]
    assert pd.isna(d["first_sent_ms"].iloc[0]) and pd.isna(d["latency_ms"].iloc[0])


def test_duplicate_delivered_across_batches_emits_once(spark, tmp_path):
    chunks = [
        [("m2", "sent", 3, "t-mobile", T0)],
        [("m2", "delivered", 3, "t-mobile", T0 + 30_000)],
        [("m2", "delivered", 3, "t-mobile", T0 + 30_000)],  # redelivery
        [("m2", "sent", 3, "t-mobile", T0 + 30_000 - 1)],   # stale heartbeat after delivery
        [("mx", "sent", 9, "att", T0 + 400_000)],
    ]
    _write_chunks(str(tmp_path), chunks)
    out = _run(spark, str(tmp_path), str(tmp_path / "ck"), "edge_dup")
    d = out.loc[out["message_id"] == "m2"]
    assert list(d["kind"]) == ["delivered"], d
    assert len(d) == 1


def test_alert_then_duplicate_late_delivery(spark, tmp_path):
    """Alert fires; the late delivery arrives twice — exactly one
    late_delivered resolution."""
    chunks = [
        [("m3", "sent", 4, "att", T0)],
        [("mw", "sent", 9, "att", T0 + 120_000)],            # watermark passes deadline
        [("m3", "delivered", 4, "att", T0 + 200_000)],
        [("m3", "delivered", 4, "att", T0 + 200_000)],
        [("mw2", "sent", 9, "att", T0 + 500_000)],
    ]
    _write_chunks(str(tmp_path), chunks)
    out = _run(spark, str(tmp_path), str(tmp_path / "ck"), "edge_late_dup")
    d = out.loc[out["message_id"] == "m3"].sort_values("event_ms")
    assert list(d["kind"]) == ["alert", "late_delivered"], d
    assert int(d.loc[d["kind"] == "late_delivered", "latency_ms"].iloc[0]) == 200_000
