"""Round-11 VERDICT #6 A/B: BLAS mapInArrow centroid assignment vs the
in-SQL variants at the x100 point.

The round-10 checksum-forced A/B proved the x100 assignment wall is the
N x n_cells x DIMS ARITHMETIC itself (in-row argmax 113.7 s, exact
rank_cells 125.4 s, JL-prescreened rank_cells 110.2 s — all
checksum-identical; plan shape has no headroom).  The one lever left is
cheaper arithmetic: numpy matmul (BLAS) inside the sanctioned Arrow
path.  This tool measures assign_cells_arrow against the same two
committed reference points, with the SAME forced consumer (a
sum-checksum over (vec_id, cell_id) — a bare count() lets Catalyst gut
the argmax and report a fantasy wall) and asserts all variants produce
the identical checksum.

Usage: python tools/bench_assign_arrow_ab.py [corpus_dir]
Writes BENCH_assign_arrow_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.session import get_spark


def _loadavg():
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "scale_corpus/fresh_x100"
    from banking_streamprocessing_demos_spark.operators.similarity import (
        _normed,
        assign_cells_arrow,
        assign_cells_inrow,
        auto_cells,
        auto_jl_shortlist,
        rank_cells,
    )

    spark = get_spark("bench-assign-arrow-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n = _normed(spark, corpus).localCheckpoint(eager=True)  # isolate scan cost
    n_vectors = n.count()
    n_cells = auto_cells(n_vectors)
    probes = 4

    def checksum(assigned) -> tuple[float, int]:
        """Forced consumer: SUM(vec_id * cell_id) over every row —
        nothing prunable, one scalar back to the driver."""
        t0 = time.perf_counter()
        row = assigned.agg(
            F.sum(F.col("vec_id") * F.col("cell_id")).alias("ck")
        ).collect()[0]
        return round(time.perf_counter() - t0, 1), int(row["ck"])

    variants = {
        # engine="sql" bypasses the round-11 arrow adoption gate so the
        # SQL shapes stay measurable after the switch
        "jl_prescreened_rank_cells": lambda: rank_cells(
            n, n_cells, keep=1,
            jl_shortlist=auto_jl_shortlist(n_cells, probes), engine="sql",
        ).select("vec_id", "cell_id"),
        "inrow_argmax": lambda: assign_cells_inrow(n, n_cells).select(
            "vec_id", "cell_id"
        ),
        "arrow_blas_matmul": lambda: assign_cells_arrow(n, n_cells).select(
            "vec_id", "cell_id"
        ),
    }
    results = {}
    for name, fn in variants.items():
        pre = _loadavg()
        wall, ck = checksum(fn())
        results[name] = {
            "wall_s": wall,
            "checksum": ck,
            "load_1m_pre": pre[0] if pre else None,
        }
        print(f"# {name}: {wall}s checksum={ck}", file=sys.stderr)

    cks = {r["checksum"] for r in results.values()}
    payload = {
        "metric": "assign_arrow_ab_x100",
        "corpus": corpus,
        "n_vectors": n_vectors,
        "n_cells": n_cells,
        "checksums_identical": len(cks) == 1,
        "prior_committed": {
            "inrow_argmax_s": 113.7,
            "exact_rank_cells_s": 125.4,
            "jl_prescreened_s": 110.2,
        },
        "results": results,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_assign_arrow_ab.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
