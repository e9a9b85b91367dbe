"""Dedicated UNCONTENDED sustained-throughput measurement for the
state-path streaming detector (round-5 VERDICT #5).

The per-round bench.py probe runs right after ~40 benchmark queries in
the same driver session, so its sustained figure absorbs host
contention (r5 measured 97.6k ev/s contended vs the 150-180k the
uncontended SCALE.md protocol measures).  This tool measures the SAME
probe (bench.py::_streaming_throughput, state variant) in a session
that has run nothing else, with a longer steady window, and records
the result to BENCH_stream_uncontended.json — bench.py folds that
figure into its payload so the round artifact carries BOTH numbers.

Run it alone (no concurrent Spark work on the box):
    python tools/bench_detector_sustained.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # default output anchored to the REPO ROOT, not the CWD: bench.py
    # reads this file relative to its own directory, so a CWD-relative
    # default from another directory would silently leave bench folding
    # a stale committed figure into the round artifact
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_stream_uncontended.json",
    )
    out = sys.argv[1] if len(sys.argv) > 1 else default_out
    from bench import _streaming_throughput

    res = _streaming_throughput(measure_s=40, variant="state", wall_cap_s=90)
    payload = {
        "metric": "detector_sustained_uncontended",
        "protocol": "dedicated session, no concurrent queries, 40s steady window",
        **res,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
