"""Round-12 optimization evidence: dump `.explain("formatted")` for the
queries touched this round into plans/r12/<query>_<tag>.txt.

Usage: python tools/dump_plans_r12.py <tag> [sf_dir] [query ...]

Run with tag=before at the pre-change tree and tag=after at the
post-change tree; the judge diffs the pairs against the claims in
OPTIMIZATION_r12.md.  Queries whose operators eagerly checkpoint
execute their upstream stages during plan construction (the
dump_plans.py caveat); their final plans still pin the shapes the
claims reference.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from banking_streamprocessing_demos_spark.plans.explain import formatted_plan
from banking_streamprocessing_demos_spark.session import get_spark

DEFAULT_QUERIES = [
    # the PQ/OPQ/LSH/BQ/JL literal-tree families (round-12 change #1)
    "emb_pq_codebook",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_opq",
    "sim_ann_opq_trained",
    "sim_ann_binary",
    "sim_ann_ivf_binary",
    "sim_ann_lsh",
    "emb_random_project",
    "sim_ann_ivf",
    "sim_knn_graph",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("plan-dump-r12", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        plan = formatted_plan(qs[name](spark, sf_dir))
        path = f"plans/r12/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
