"""Measured STREAMING state-size curve (round-4 VERDICT "Next round
#7"): batch has a 3-point wall-time curve; this gives streaming the
equivalent evidence — state-store rows vs key cardinality, showing the
shipped stateful jobs hold state bounded by the WATERMARK HORIZON /
IN-FLIGHT KEY set, never by stream length.

Two families, three cardinalities each:

- **dedup** (`streaming_doc_dedup` = dropDuplicatesWithinWatermark on
  the content hash): a rate source cycles over ``n_keys`` distinct
  documents at a fixed event rate under a 10 s horizon.  Claim: peak
  state rows ~= min(n_keys, rate x horizon) and stays FLAT between the
  mid-run and end-run samples while total rows processed keeps
  growing — state tracks the horizon's key set, not the stream.
- **detector** (`detect_undelivered`, the applyInPandasWithState
  flagship): the declarative rate generator at a fixed message rate,
  measured at three TIMEOUT horizons.  The detector holds one state
  entry per unresolved message, so the bound is message_rate x
  (timeout + watermark delay) — the horizon bound.  Claim: state ramps
  to ~that bound and then goes FLAT (end ~= post-ramp sample) while
  events keep flowing, and the plateau scales with the horizon, not
  with events processed or key cardinality.

Each config runs ~40 s on a noop sink; per-batch ``stateOperators``
numRowsTotal is sampled from query progress (the same metric the
EngineQueryListener captures).  Writes BENCH_stream_state.json and
prints one JSON line.

Usage: python tools/bench_stream_state.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.session import get_spark

MEASURE_S = 40
DEDUP_RATE = 20_000  # events/sec into the dedup
DEDUP_HORIZON_S = 10
DETECTOR_RATE = 100_000


def _run_and_sample(df, name: str, measure_s: int = MEASURE_S) -> dict:
    """Run ``df`` on a noop sink for ``measure_s`` seconds; sample total
    state rows per completed batch.  Returns peak/mid/end state rows and
    total input, so flatness (mid ~= end while input doubles) is visible
    in the artifact, not just asserted."""
    q = (
        df.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"bss-{name}-"))
        .start()
    )
    try:
        deadline = time.monotonic() + measure_s
        samples: list[tuple[int, int]] = []  # (cumulative input rows, state rows)
        seen = 0
        while time.monotonic() < deadline:
            time.sleep(2)
            if q.exception() is not None:
                raise q.exception()
            for p in q.recentProgress[seen:]:
                seen += 1
                if p["stateOperators"] and p["numInputRows"] > 0:
                    rows = sum(int(op["numRowsTotal"]) for op in p["stateOperators"])
                    samples.append((int(p["numInputRows"]), rows))
    finally:
        q.stop()
    if not samples:
        raise RuntimeError(f"{name}: no stateful progress captured")
    cum = 0
    cums = []
    for n, _ in samples:
        cum += n
        cums.append(cum)
    mid_i = len(samples) // 2
    return {
        "batches": len(samples),
        "total_input_rows": cums[-1],
        "input_rows_at_mid": cums[mid_i],
        "state_rows_mid": samples[mid_i][1],
        "state_rows_end": samples[-1][1],
        "state_rows_peak": max(r for _, r in samples),
    }


def dedup_state_curve(spark, n_keys: int) -> dict:
    from banking_streamprocessing_demos_spark.streaming.jobs import streaming_doc_dedup

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", DEDUP_RATE)
        .load()
    )
    docs = rate.select(
        F.col("value").alias("doc_id"),
        F.concat(F.lit("document body "), (F.col("value") % n_keys).cast("string")).alias(
            "text"
        ),
        F.col("timestamp").alias("ingest_ts"),
    )
    out = streaming_doc_dedup(docs, delay=f"{DEDUP_HORIZON_S} seconds")
    r = _run_and_sample(out, f"dedup-{n_keys}")
    r["n_keys"] = n_keys
    r["horizon_bound"] = min(n_keys, DEDUP_RATE * DEDUP_HORIZON_S)
    return r


def keep_best_state_curve(spark, n_keys: int) -> dict:
    """Round-7 twin: streaming_keep_best (windowed struct-MAX argmax per
    (window, signature) key).  State = in-flight windows x distinct
    signature keys — ONE row per key regardless of how many cluster
    members arrive, and eviction follows the watermark.  A rate source
    cycles n_keys distinct >=NGRAM_N-word documents under 10 s windows
    / 5 s delay, so the bound is ~2 windows x min(n_keys, window
    arrivals)."""
    from banking_streamprocessing_demos_spark.streaming.jobs import streaming_keep_best

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", DEDUP_RATE)
        .load()
    )
    docs = rate.select(
        F.col("value").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma "), (F.col("value") % n_keys).cast("string")
        ).alias("text"),
        F.col("timestamp").alias("ingest_ts"),
    )
    out = streaming_keep_best(docs, window="10 seconds", delay="5 seconds")
    r = _run_and_sample(out, f"keepbest-{n_keys}")
    r["n_keys"] = n_keys
    # ~(open + not-yet-evicted) windows x keys-per-window
    r["horizon_bound"] = 2 * min(n_keys, DEDUP_RATE * 10)
    return r


def detector_state_curve(spark, timeout_s: int) -> dict:
    from banking_streamprocessing_demos_spark.config import GeneratorConfig
    from banking_streamprocessing_demos_spark.sources.rate_stream import (
        message_rate_stream,
    )
    from banking_streamprocessing_demos_spark.streaming.detector import (
        detect_undelivered,
    )

    ticks_per_message = 100
    stream = message_rate_stream(
        spark,
        GeneratorConfig(seed="bss"),
        rows_per_second=DETECTOR_RATE,
        max_forks=10_000,
        ticks_per_message=ticks_per_message,
        delivery_delay_ticks=20,
    )
    det = detect_undelivered(
        stream, timeout_ms=timeout_s * 1000, watermark_delay="5 seconds"
    )
    # run to ~3x the horizon so the ramp completes and the plateau has
    # room to prove itself flat
    r = _run_and_sample(det, f"det-{timeout_s}s", measure_s=3 * (timeout_s + 5) + 10)
    r["timeout_s"] = timeout_s
    msg_rate = DETECTOR_RATE / ticks_per_message
    r["horizon_bound"] = int(msg_rate * (timeout_s + 5))
    return r


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "BENCH_stream_state.json"
    spark = get_spark("bench-stream-state")
    spark.sparkContext.setLogLevel("ERROR")

    if "--keep-best" in sys.argv:
        # run ONLY the round-7 keep_best family and merge it into the
        # existing artifact (the dedup/detector curves are
        # corpus-independent and stay valid across rounds).  Open and
        # validate the artifact BEFORE the ~2 min of measurement so a
        # missing/foreign file fails fast instead of discarding data.
        with open(out) as f:
            payload = json.load(f)
        if "metric" not in payload:
            raise SystemExit(f"{out} is not a stream-state artifact")
        kb = {}
        for n_keys in (1_000, 10_000, 100_000):
            kb[str(n_keys)] = r = keep_best_state_curve(spark, n_keys)
            print(f"# keep_best n_keys={n_keys}: {r}", file=sys.stderr)
        payload["keep_best"] = kb
        payload["keep_best_rate_eps"] = DEDUP_RATE
        with open(out, "w") as f:
            json.dump(payload, f, indent=2)
        print(json.dumps({"metric": payload["metric"], "out": out, "added": "keep_best"}))
        return

    dedup = {}
    for n_keys in (1_000, 10_000, 100_000):
        dedup[str(n_keys)] = r = dedup_state_curve(spark, n_keys)
        print(f"# dedup n_keys={n_keys}: {r}", file=sys.stderr)
    detector = {}
    for timeout_s in (10, 20, 40):
        detector[str(timeout_s)] = r = detector_state_curve(spark, timeout_s)
        print(f"# detector timeout={timeout_s}s: {r}", file=sys.stderr)

    payload = {
        "metric": "streaming_state_rows_curve",
        "dedup_rate_eps": DEDUP_RATE,
        "dedup_horizon_s": DEDUP_HORIZON_S,
        "detector_rate_eps": DETECTOR_RATE,
        "dedup": dedup,
        "detector": detector,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"metric": payload["metric"], "out": out}))


if __name__ == "__main__":
    main()
