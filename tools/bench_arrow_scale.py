"""Round-11 re-measurement of the arrow-lifted ANN/dedup scale curves.

The rank_cells arrow adoption (SCALE.md round-11, BENCH_assign_arrow_ab)
routes every above-floor centroid ranking through one BLAS matmul per
Arrow batch.  The committed x1..x100 curves for the assignment-bound
families (BENCH_scale4.json: sim_knn_graph 99.8 s, dedup_semantic_ivf
105.0 s at x100) were measured on the JL-prescreened SQL path — this
tool re-runs exactly those families with the production sizing rules
active so the committed curve reflects the shipped engine.

Single pass per point (the x100 corpus doesn't fit a warm-cache
protocol in the round budget), loadavg recorded per point.

Run: python tools/bench_arrow_scale.py   → BENCH_arrow_scale.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from banking_streamprocessing_demos_spark.session import get_spark

PRIOR = {  # committed pre-adoption walls (BENCH_scale4.json, r9/r10)
    "sim_knn_graph": {"x1": 8.489, "x10": 18.628, "x30": 22.136, "x100": 99.762},
    "dedup_semantic_ivf": {"x1": 1.828, "x10": 8.977, "x30": 22.6, "x100": 105.017},
}

POINTS = [
    ("x1", "/root/testdata/sf0.1", 1),
    ("x10", "scale_corpus/x10", 10),
    ("x30", "scale_corpus/x30", 30),
    ("x100", "scale_corpus/x100", 100),
]


def _loadavg():
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def main() -> None:
    from tools.bench_scale import _knn_kwargs

    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    spark = get_spark("bench-arrow-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    families = ["sim_knn_graph", "dedup_semantic_ivf", "emb_hard_negatives"]
    results: dict[str, dict] = {}
    for name in families:
        fn = merged[name].fn
        row: dict = {}
        for label, path, _f in POINTS:
            kwargs = _knn_kwargs(spark, path)
            pre = _loadavg()
            t0 = time.perf_counter()
            rows = len(fn(spark, path, **kwargs).collect())
            wall = round(time.perf_counter() - t0, 3)
            row[label] = wall
            row[f"{label}_rows"] = rows
            row[f"{label}_load_1m"] = pre[0] if pre else None
            print(f"# {name} {label}: {wall}s ({rows} rows, load {pre})",
                  file=sys.stderr)
        row["ratio_100_30"] = round(row["x100"] / row["x30"], 2)  # linear = 3.33
        row["ratio_100_1"] = round(row["x100"] / row["x1"], 2)  # linear = 100
        if name in PRIOR:
            row["prior"] = PRIOR[name]
            row["x100_speedup_vs_prior"] = round(PRIOR[name]["x100"] / row["x100"], 2)
        results[name] = row

    # the SCOPED adoption's end-to-end case: keep=1 assignment dominates
    # sim_ann_ivf_binary (committed x100: 78.4 s total, 66.9 s
    # assignment) — measured at x100 with the production sizing
    from banking_streamprocessing_demos_spark.operators.pq import sim_ann_ivf_binary
    from banking_streamprocessing_demos_spark.operators.similarity import (
        auto_cells,
        auto_jl_shortlist,
    )

    x100 = "scale_corpus/x100"
    nv = spark.read.parquet(f"{x100}/embeddings.parquet").count()
    cells = auto_cells(nv)
    pre = _loadavg()
    t0 = time.perf_counter()
    rows = len(
        sim_ann_ivf_binary(
            spark, x100, n_cells=cells, jl_shortlist=auto_jl_shortlist(cells, 4)
        ).collect()
    )
    wall = round(time.perf_counter() - t0, 3)
    results["sim_ann_ivf_binary"] = {
        "x100": wall,
        "x100_rows": rows,
        "x100_load_1m": pre[0] if pre else None,
        "prior": {"x100": 78.397, "x100_assignment_only": 66.9},
        "x100_speedup_vs_prior": round(78.397 / wall, 2),
        "note": "keep=1 arrow-routed assignment (the scoped adoption)",
    }
    print(f"# sim_ann_ivf_binary x100: {wall}s ({rows} rows)", file=sys.stderr)

    payload = {
        "metric": "arrow_adoption_scale_recheck",
        "points": [p[0] for p in POINTS],
        "families": results,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_arrow_scale.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
