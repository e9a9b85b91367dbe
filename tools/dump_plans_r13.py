"""Round-13 optimization evidence: dump `.explain("formatted")` for the
queries touched this round into plans/r13/<query>_<tag>.txt.

Usage: python tools/dump_plans_r13.py <tag> [sf_dir] [query ...]

Run with tag=before at the pre-change tree and tag=after at the
post-change tree; the judge diffs the pairs against the claims in
OPTIMIZATION_r13.md.  Queries whose operators eagerly checkpoint
execute their upstream stages during plan construction (the
dump_plans.py caveat); their final plans still pin the shapes the
claims reference.

Round-12 ADVICE #4 fix: the import path and the output directory are
anchored to this file's location, not the current working directory.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from banking_streamprocessing_demos_spark.plans.explain import formatted_plan  # noqa: E402
from banking_streamprocessing_demos_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    # the PQ/OPQ expression-construction + arrow-rotation + sampled-
    # Lloyd-replay families (round-13 changes #1-#3)
    "emb_pq_codebook",
    "emb_pq_codebook_sampled",
    "sim_ann_pq",
    "sim_ann_pq_sampled",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_sampled",
    "sim_ann_opq",
    "sim_ann_opq_trained",
    "sim_ann_opq_trained_sampled",
    "sim_ann_lsh",
    "emb_random_project",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("plan-dump-r13", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        plan = formatted_plan(qs[name](spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
