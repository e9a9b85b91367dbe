"""Dedicated 3-point scale measurement for pipe_curate_end_to_end
(x1/x10/x30 replicated corpora) -> BENCH_curate_scale3.json.  The
round-7 artifact was produced by an ad-hoc session script; the DAG
gained sample materialization in round 8 (mix + shard; per-sample
output), so the curve is re-measured per round with this committed
tool.  Protocol: shared warmed session, 2 passes min per point,
collect() not count().

Run ALONE (contention protocol): python tools/bench_curate_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from banking_streamprocessing_demos_spark.session import get_spark


def main() -> None:
    points = {
        "x1": "/root/testdata/sf0.1",
        "x10": "scale_corpus/x10",
        "x30": "scale_corpus/x30",
    }
    from banking_streamprocessing_demos_spark.operators.curate import (
        pipe_curate_end_to_end,
    )

    spark = get_spark("bench-curate-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for tag, d in points.items():
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = len(pipe_curate_end_to_end(spark, d).collect())
            best = min(best, time.perf_counter() - t0)
        out[tag] = {"sec": round(best, 3), "rows": rows}
        print(f"# {tag}: {out[tag]}", file=sys.stderr)

    payload = {
        "metric": "curate_end_to_end_scale3",
        "points": out,
        "ratio_10_1": round(out["x10"]["sec"] / out["x1"]["sec"], 2),
        "ratio_30_10": round(out["x30"]["sec"] / out["x10"]["sec"], 2),
        "protocol": "dedicated session, x1/x10/x30 replicated from the round's "
        "sf0.1, 2 passes min per point; round-8 DAG includes sample "
        "materialization (rows = training samples, not docs)",
    }
    with open("BENCH_curate_scale3.json", "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
