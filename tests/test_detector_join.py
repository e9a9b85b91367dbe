"""The stream-stream-join detector variant must classify every message
identically to the event-time ground truth on a heartbeat-free stream
(its documented operating constraint)."""

from __future__ import annotations

import pandas as pd

from banking_streamprocessing_demos_spark.config import GeneratorConfig
from banking_streamprocessing_demos_spark.sources.generator import (
    generate_events,
    generate_messages,
)
from banking_streamprocessing_demos_spark.streaming.detector_join import (
    detect_undelivered_join,
)
from banking_streamprocessing_demos_spark.streaming.jobs import read_event_stream_from_files
from tests.test_streaming_detector import _write_time_ordered_chunks

# heartbeat-free: interval beyond the horizon (the join plan's operating
# constraint); duplicates stay on to exercise both-side dedup
CFG = GeneratorConfig(
    n_phones=40,
    n_messages=60,
    seed="join1",
    stagger_ms=1000,
    normal_delivery_ms=30_000,
    delayed_delivery_ms=180_000,
    heartbeat_interval_ms=10_000_000,
    horizon_after_last_start_ms=400_000,
    duplicate_rate=0.05,
)
TIMEOUT_MS = 105_000


def test_join_variant_matches_ground_truth(spark, tmp_path_factory):
    events_dir = str(tmp_path_factory.mktemp("join_events"))
    ckpt = str(tmp_path_factory.mktemp("join_ckpt"))
    pdf = generate_events(spark, CFG).toPandas()
    # trailing watermark pusher: outer rows flush on data-driven
    # watermark advances (see detector_join docstring); production
    # streams have heartbeats doing this continuously
    pusher = pd.DataFrame(
        [
            {
                "message_id": "wm-pusher",
                "status": "sent",
                "phone_number": 1,
                "carrier": "att",
                "timestamp": int(pdf["timestamp"].max()) + 1_000_000,
            }
        ]
    )
    pdf = pd.concat([pdf, pusher], ignore_index=True)
    _write_time_ordered_chunks(pdf, events_dir)

    stream = read_event_stream_from_files(spark, events_dir, max_files_per_trigger=1)
    out = detect_undelivered_join(stream, TIMEOUT_MS, watermark_delay="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("join_det_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("join_det_out").toPandas()
    truth = generate_messages(spark, CFG).toPandas().set_index("message_id")

    got = got.loc[got["message_id"] != "wm-pusher"].set_index("message_id")
    assert not got.index.has_duplicates
    for mid, row in truth.iterrows():
        assert mid in got.index, f"{mid} missing from join output"
        expect_alert = row["delivery_type"] in ("delayed", "never")
        assert bool(got.loc[mid, "alerted"]) == expect_alert, mid
        if row["delivery_type"] == "normal":
            assert int(got.loc[mid, "delivered_ms"]) == int(row["delivered_time"])


def test_join_variant_batch_mode(spark):
    """Same plan runs as a batch DataFrame (unified semantics)."""
    events = generate_events(spark, CFG)
    out = detect_undelivered_join(events, TIMEOUT_MS).toPandas().set_index("message_id")
    truth = generate_messages(spark, CFG).toPandas().set_index("message_id")
    assert len(out) == len(truth)
    for mid, row in truth.iterrows():
        assert bool(out.loc[mid, "alerted"]) == (row["delivery_type"] in ("delayed", "never"))
