"""Dedicated-session datapoints for unexplained bench movers (round-11
VERDICT #1): each target query gets N fresh single-query sessions — a
brand-new Python process + JVM per session, nothing else timed in it —
so the wall cannot be polluted by same-session neighbors (the
sim_knn_graph treatment that exonerated the r9 rerun as box noise).

Per session: one warm-up pass (JVM + parquet footers + codegen) and one
steady-state pass; both recorded, the steady pass is the session wall.
Loadavg is sampled before and after every session so the artifact shows
what load each wall ran under (the round-10 lesson: a start-only gate
is blind to pile-up).

Usage:
    python tools/bench_dedicated_movers.py                 # orchestrate
    python tools/bench_dedicated_movers.py --single NAME   # one session

Orchestrator writes BENCH_movers_dedicated.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MOVERS = ["dedup_semantic_ivf", "dedup_keep_best", "pipe_bpe_encode"]
SESSIONS = 3


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def single(name: str) -> None:
    import __spark_entry__ as entry
    from banking_streamprocessing_demos_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark("bench-dedicated")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = len(qs[name](spark, SF_DIR).collect())
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"name": name, "warm_s": walls[0], "steady_s": walls[1], "rows": n}))


def orchestrate() -> None:
    out: dict[str, dict] = {}
    for name in MOVERS:
        sess = []
        for i in range(SESSIONS):
            pre = _loadavg()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", name],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            post = _loadavg()
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            rec = json.loads(line[-1]) if line else {"error": r.stderr[-500:]}
            rec["load_1m_pre"] = pre[0] if pre else None
            rec["load_1m_post"] = post[0] if post else None
            sess.append(rec)
            print(f"# {name} session {i}: {rec}", file=sys.stderr)
        steadies = [s["steady_s"] for s in sess if "steady_s" in s]
        out[name] = {
            "sessions": sess,
            "best_s": min(steadies) if steadies else None,
            "typical_s": round(sorted(steadies)[len(steadies) // 2], 3)
            if steadies
            else None,
        }
    payload = {
        "metric": "movers_dedicated_sessions",
        "sf_dir": SF_DIR,
        "sessions_per_query": SESSIONS,
        "results": out,
    }
    with open("BENCH_movers_dedicated.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        single(sys.argv[2])
    else:
        orchestrate()
