"""Fault tolerance (ST6/SURVEY §4): a detector query stopped mid-stream
and restarted from its checkpoint must produce exactly the same output
set as an uninterrupted run — no lost alerts, no duplicates.  This is
the engine's answer to the reference's SQLite-as-WAL recovery
(phone_message_producer.py:369-372)."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd

from banking_streamprocessing_demos_spark.sources.generator import generate_events
from banking_streamprocessing_demos_spark.streaming.detector import detect_undelivered
from banking_streamprocessing_demos_spark.streaming.jobs import read_event_stream_from_files
from tests.test_streaming_detector import CFG, TIMEOUT_MS, _write_time_ordered_chunks


def _start(spark, events_dir, ckpt, name, out_dir):
    stream = read_event_stream_from_files(spark, events_dir, max_files_per_trigger=1)
    detected = detect_undelivered(stream, TIMEOUT_MS, watermark_delay="10 seconds")
    return (
        detected.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .queryName(name)
        .start()
    )


def test_restart_from_checkpoint_no_dupes_no_loss(spark, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("full"))
    part_dir = str(tmp_path_factory.mktemp("part"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))

    pdf = generate_events(spark, CFG).toPandas()
    _write_time_ordered_chunks(pdf, full_dir)
    chunks = sorted(glob.glob(os.path.join(full_dir, "*.parquet")))
    assert len(chunks) > 4

    # phase 1: only the first few chunks exist (cut before most alert
    # deadlines pass, so output genuinely spans the restart)
    cut = 4
    for f in chunks[:cut]:
        shutil.copy2(f, part_dir)
    q1 = _start(spark, part_dir, ckpt, "recovery_q1", out_dir)
    q1.awaitTermination(300)
    assert not q1.isActive
    n_phase1 = len(spark.read.parquet(out_dir).collect())

    # phase 2: the rest of the stream arrives; RESTART from checkpoint
    for f in chunks[cut:]:
        shutil.copy2(f, part_dir)
    q2 = _start(spark, part_dir, ckpt, "recovery_q2", out_dir)
    q2.awaitTermination(300)
    assert not q2.isActive

    recovered = spark.read.parquet(out_dir).toPandas()
    assert len(recovered) > n_phase1, "phase 2 must emit additional results"

    # reference run: same data, no interruption
    ref_ckpt = str(tmp_path_factory.mktemp("ref_ckpt"))
    ref_out = str(tmp_path_factory.mktemp("ref_out"))
    q3 = _start(spark, full_dir, ref_ckpt, "recovery_ref", ref_out)
    q3.awaitTermination(300)
    reference = spark.read.parquet(ref_out).toPandas()

    key_cols = ["message_id", "kind", "event_ms"]
    rec = sorted(map(tuple, recovered[key_cols].itertuples(index=False)))
    ref = sorted(map(tuple, reference[key_cols].itertuples(index=False)))
    assert rec == ref
    # exactly-once: no (message_id, kind) appears twice
    assert not recovered.duplicated(subset=["message_id", "kind"]).any()
