"""The transformWithStateInPandas detector must produce the SAME output
as the applyInPandasWithState implementation on the same ordered replay
(both deterministic in event time)."""

from __future__ import annotations

import pytest

# transformWithStateInPandas drives its state-server protocol over
# protobuf; without the protobuf package the TWS python driver worker
# cannot start.  The implementation is still the forward path for
# clusters (which ship protobuf with pyspark[connect]); the equivalence
# test runs wherever the dependency exists.
pytest.importorskip("google.protobuf", reason="transformWithStateInPandas requires protobuf")

from banking_streamprocessing_demos_spark.session import get_spark
from banking_streamprocessing_demos_spark.sources.generator import generate_events
from banking_streamprocessing_demos_spark.streaming.detector import detect_undelivered
from banking_streamprocessing_demos_spark.streaming.detector_tws import detect_undelivered_tws
from banking_streamprocessing_demos_spark.streaming.jobs import read_event_stream_from_files
from tests.test_streaming_detector import CFG, TIMEOUT_MS, _write_time_ordered_chunks


@pytest.fixture(scope="module")
def rocks_spark():
    # TWS requires the RocksDB state store provider.  getOrCreate would
    # reuse (and permanently mutate) the shared test session, so clone an
    # isolated session: newSession() shares the SparkContext but has its
    # own conf, keeping default-provider tests untouched
    base = get_spark("tws-tests", master="local[4]", shuffle_partitions=4)
    s = base.newSession()
    s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    yield s


def _run(spark, det_fn, events_dir, ckpt, name):
    stream = read_event_stream_from_files(spark, events_dir, max_files_per_trigger=1)
    detected = det_fn(stream, TIMEOUT_MS, watermark_delay="10 seconds")
    q = (
        detected.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive
    return spark.table(name).toPandas()


def test_tws_matches_apply_in_pandas(rocks_spark, tmp_path_factory):
    spark = rocks_spark
    events_dir = str(tmp_path_factory.mktemp("tws_events"))
    pdf = generate_events(spark, CFG).toPandas()
    _write_time_ordered_chunks(pdf, events_dir)

    out_apw = _run(
        spark, detect_undelivered, events_dir, str(tmp_path_factory.mktemp("ck1")), "apw_out"
    )
    out_tws = _run(
        spark, detect_undelivered_tws, events_dir, str(tmp_path_factory.mktemp("ck2")), "tws_out"
    )
    key = ["message_id", "kind"]
    a = out_apw.sort_values(key).reset_index(drop=True)
    t = out_tws.sort_values(key).reset_index(drop=True)
    assert len(a) == len(t), (len(a), len(t))
    for col in ["message_id", "kind", "phone_number", "carrier", "first_sent_ms", "event_ms"]:
        assert list(a[col]) == list(t[col]), col
