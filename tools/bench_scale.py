"""Measured scaling curve (round-2 VERDICT "Next round #2"): run the
dedup / ANN / pack / chunk families at sf0.1 AND at the 10x replicated
corpus (tools/gen_scale_corpus.py) and record both wall times per
query.  Near-linear ratios (<= ~12x for a 10x corpus on fixed local
hardware) confirm no hidden quadratic; a superlinear ratio is a scale
bug to fix, not a number to accept.

Method matches bench.py: shared warmed session, two passes per (query,
scale), min wall time, collect() not count() so Catalyst cannot prune
the real work.

sim_knn_graph runs with n_cells from the production ``auto_cells``
sizing rule at BOTH scales (constant cell size is the production IVF
invariant — growing the corpus under a FROZEN quantizer makes every
cell 10x bigger and the graph join quadratic by configuration, which
would measure the config error, not the engine).  Round 3 measured a
hand-scaled 16*factor stand-in; round 4 re-measures with auto_cells
active per the round-3 VERDICT #5.

Usage: python tools/bench_scale.py [base_dir] [x10_dir] [out_json]
writes BENCH_scale.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.session import get_spark


def _semantic_pair_counts(spark, sf_dir: str, lsh_bits: int | None = None) -> dict:
    """Candidate / true-pair volume behind a dedup_semantic_clusters
    point (round-5 VERDICT #3): the >linear 100/30 wall steps are
    defended by C(k,2) cross-replica TRUE-pair growth — record the
    counts in the artifact instead of prose.  One extra pass over the
    same in-join-scored collision join the operator runs."""
    from banking_streamprocessing_demos_spark.operators.dedup import COSINE_TAU
    from banking_streamprocessing_demos_spark.operators.similarity import (
        LSH_BITS,
        _dot,
        _normed,
        auto_lsh_tables,
        hashed_buckets,
    )

    bits = LSH_BITS if lsh_bits is None else lsh_bits
    hashed = hashed_buckets(
        _normed(spark, sf_dir), bits=bits, tables=auto_lsh_tables(bits)
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    scored = a.join(
        b,
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("va"),
        F.col("b.vec_id").alias("vb"),
        (_dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm")) >= COSINE_TAU)
        .cast("long")
        .alias("t"),
    )
    row = (
        scored.groupBy("va", "vb")
        .agg(F.max("t").alias("t"))
        .agg(F.count("*").alias("c"), F.sum("t").alias("p"))
        .first()
    )
    return {"n_candidates": int(row["c"]), "n_true_pairs": int(row["p"])}


def _ivf_pair_counts(
    spark, sf_dir: str, n_cells: int | None = None, probes: int | None = None
) -> dict:
    """Same diagnostics for the IVF dedup path: distinct cell-sharing
    candidate pairs and the cosine>=tau true pairs among them."""
    from banking_streamprocessing_demos_spark.operators.dedup import (
        COSINE_TAU,
        IVF_DEDUP_PROBES,
    )
    from banking_streamprocessing_demos_spark.operators.similarity import (
        IVF_CELLS,
        _dot,
        _normed,
        auto_jl_shortlist,
        rank_cells,
    )

    n = _normed(spark, sf_dir)
    cells = IVF_CELLS if n_cells is None else n_cells
    p = IVF_DEDUP_PROBES if probes is None else probes
    ranked = rank_cells(
        n, cells, keep=p,
        jl_shortlist=auto_jl_shortlist(cells, p),
    )
    assigned = ranked.select("vec_id", "cell_id").join(n, "vec_id")
    a, b = assigned.alias("a"), assigned.alias("b")
    scored = a.join(
        b,
        (F.col("a.cell_id") == F.col("b.cell_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("va"),
        F.col("b.vec_id").alias("vb"),
        (_dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm")) >= COSINE_TAU)
        .cast("long")
        .alias("t"),
    )
    row = (
        scored.groupBy("va", "vb")
        .agg(F.max("t").alias("t"))
        .agg(F.count("*").alias("c"), F.sum("t").alias("p"))
        .first()
    )
    return {"n_candidates": int(row["c"]), "n_true_pairs": int(row["p"])}


def _knn_candidate_count(spark, sf_dir: str, n_cells: int) -> dict:
    """Scored (query, neighbor) pair volume behind a sim_knn_graph
    point: each vector is scored against every member of its probed
    cells EXCEPT itself (the operator filters neighbor_id != query_id,
    and every vector's own rn==1 cell is among its probes), so the
    count is sum over (vector, probed cell) of cell size, minus N
    self-pairs.  Cheap — no vector arrays, just the ranking skeleton."""
    from banking_streamprocessing_demos_spark.operators.similarity import (
        IVF_PROBES,
        _normed,
        auto_jl_shortlist,
        rank_cells,
    )

    n = _normed(spark, sf_dir)
    ranked = rank_cells(
        n, n_cells, keep=IVF_PROBES,
        jl_shortlist=auto_jl_shortlist(n_cells, IVF_PROBES),
    )
    assigned = ranked.filter(F.col("rn") == 1)
    sizes = assigned.groupBy("cell_id").count()
    row = (
        ranked.select("vec_id", "cell_id")
        .join(sizes, "cell_id")
        .agg(F.sum("count").alias("c"))
        .first()
    )
    n_self = assigned.count()
    return {"n_candidates": int(row["c"]) - n_self}


# family -> (spark, sf_dir, kwargs) -> output-volume diagnostics
PAIR_DIAGNOSTICS = {
    "dedup_semantic_clusters": lambda spark, d, kw: _semantic_pair_counts(spark, d, **kw),
    "dedup_semantic_ivf": lambda spark, d, kw: _ivf_pair_counts(spark, d, **kw),
    "sim_knn_graph": lambda spark, d, kw: _knn_candidate_count(spark, d, **kw),
}


def _knn_kwargs(spark, sf_dir: str) -> dict:
    from banking_streamprocessing_demos_spark.operators.similarity import auto_cells

    n_vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    return {"n_cells": auto_cells(n_vectors)}


_LSH_CONFIGS: dict[str, dict] = {}  # sf_dir -> recorded banding config


def _semantic_kwargs(spark, sf_dir: str) -> dict:
    # production banding rule: bits ~ log2(N) keeps expected bucket size
    # constant — measuring a frozen 4-bit table at 10x the corpus would
    # measure the config error (every bucket 10x bigger, collision join
    # quadratic), not the engine (same argument as _knn_kwargs).  Tables
    # grow with bits under the capped recall rule; the per-point
    # expected recall is RECORDED in the artifact so the curve's
    # quality level is explicit (round-4 ADVICE).
    from banking_streamprocessing_demos_spark.operators.similarity import (
        auto_lsh_bits,
        auto_lsh_tables,
        lsh_expected_recall,
    )

    n_vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    bits = auto_lsh_bits(n_vectors)
    tables = auto_lsh_tables(bits)
    _LSH_CONFIGS[sf_dir] = {
        "n_vectors": n_vectors,
        "lsh_bits": bits,
        "lsh_tables": tables,
        "expected_recall_cos09": lsh_expected_recall(bits, tables),
    }
    print(f"# semantic lsh config @ {sf_dir}: {_LSH_CONFIGS[sf_dir]}", file=sys.stderr)
    return {"lsh_bits": bits}


# query name -> optional per-scale kwargs factory ((spark, sf_dir) -> kwargs)
FAMILIES: dict[str, dict] = {
    # dedup family
    "dedup_exact": {},
    "dedup_exact_normalized": {},
    "dedup_minhash_lsh": {},
    "dedup_simhash": {},
    "dedup_substring_spans": {},
    # text / chunk / pack family
    "text_stats_quality": {},
    "doc_chunk_overlap": {},
    "pack_sequences": {},
    # round-6 curation additions: inter-doc boilerplate removal (segment
    # df-count + skinny-key join + reassembly) and cluster-representative
    # selection (pair join + label propagation + keyed argmax window)
    "text_boilerplate_strip": {},
    "dedup_keep_best": {},
    # round-6 BPE family: the fit's corpus-scale work is one word-count
    # shuffle; the per-replica word suffixing makes the x10 vocab ~10x,
    # so the iterated vocab folds are genuinely exercised too
    "pipe_bpe_merges": {},
    "pipe_bpe_encode": {},
    # round-7: the composed end-to-end curation DAG (gate -> keep-best
    # dedup -> BPE fit/meter -> curriculum pack -> epoch plan) — the
    # sweep answers whether the COMPOSITION stays <= the sum of its
    # measured stages (re-execution would show up as superlinearity
    # the components don't have)
    "pipe_curate_end_to_end": {},
    # ANN family
    "sim_ann_ivf": {},
    "sim_ann_lsh": {},
    # round-6: PQ/ADC compressed-code search (times its own codebook
    # training; the constant-size codebook is the design point — no
    # corpus-proportional sizing rule exists for this family)
    "sim_ann_pq": {},
    "sim_ann_ivfpq": {},
    # round-7: OPQ random-rotation baseline — one extra in-row 64x64
    # fold at encode; wall should track flat PQ + a constant
    "sim_ann_opq": {},
    # round-8: trained OPQ (8 Givens aggregate+rotate stages + variance
    # allocation + Lloyd on the anisotropic fixture view) — wall should
    # track flat PQ plus a corpus-proportional constant per stage
    "sim_ann_opq_trained": {},
    # round-8: perceptual-hash image near-dup pairs — banded (28 16-bit
    # key tables), expected bucket size N/65536: the within-bucket join
    # must stay near-linear like the minhash banding it mirrors
    "mm_phash_dedup": {},
    # round-9: fixed-block chunk-hash upload dedup — position-aligned
    # equi-join against the held inventory; output (matching pairs)
    # grows with cross-replica byte-near copies like phash's
    "mm_chunk_dedup": {},
    # round-9: int8 scalar-quantization search — training-free, so the
    # whole wall is the compressed scan + fixed rerank (should track
    # sim_ann_matryoshka's slope)
    "sim_ann_sq8": {},
    # round-9: blocked fuzzy entity match — two hash-keyed block joins
    # + in-block levenshtein; output (verified links) grows linearly
    # with the replicated dirty side
    "er_blocked_match": {},
    "sim_knn_graph": {"scale_kwargs": _knn_kwargs},
    # semantic near-dup clustering (round-4 plan: cosine scored inside
    # the bucket join) — bits sized by the production auto_lsh_bits rule
    "dedup_semantic_clusters": {"scale_kwargs": _semantic_kwargs},
}


# families whose output rows ARE the superlinear quantity on the
# replicated corpus (cross-replica copies are true byte-near pairs):
# their curve rows carry a per-output-normalized ratio
ROWS_NORMALIZED = {"mm_phash_dedup", "mm_chunk_dedup"}


def _time_query(spark, fn, sf_dir, kwargs, passes=2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(passes):
        t0 = time.perf_counter()
        rows = len(fn(spark, sf_dir, **kwargs).collect())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), rows


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    x10 = sys.argv[2] if len(sys.argv) > 2 else "scale_corpus/x10"
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_scale.json"
    factor = 10  # label only; per-scale kwargs derive from the corpus itself

    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()  # sync check
    merged = merge_registries(*entrymod._REGISTRIES)

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    results = {}
    for name, spec in FAMILIES.items():
        fn = merged[name].fn
        kw_fn = spec.get("scale_kwargs")
        base_s, base_rows = _time_query(spark, fn, base, kw_fn(spark, base) if kw_fn else {})
        x10_s, x10_rows = _time_query(spark, fn, x10, kw_fn(spark, x10) if kw_fn else {})
        ratio = round(x10_s / base_s, 2) if base_s > 0 else None
        results[name] = {
            "base_sec": base_s,
            "x10_sec": x10_s,
            "ratio": ratio,
            "base_rows": base_rows,
            "x10_rows": x10_rows,
        }
        print(f"# {name}: {base_s}s -> {x10_s}s (x{ratio}, rows {base_rows}->{x10_rows})",
              file=sys.stderr)

    payload = {
        "metric": "scaling_curve_10x",
        "factor": factor,
        "base_dir": base,
        "x10_dir": x10,
        "linear_budget_ratio": 12.0,
        "families": results,
        "max_ratio": max(r["ratio"] for r in results.values()),
        "lsh_configs": _LSH_CONFIGS,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v["ratio"] for k, v in results.items()}))
    print(f"wrote {out}")


def three_point(out: str = "BENCH_scale3.json") -> None:
    """Optional third scale point (x30) for the most scale-critical
    families — three measured points expose curvature a two-point
    ratio can hide.  Run: python tools/bench_scale.py --three-point"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    spark = get_spark("bench-scale3")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    critical = {
        "dedup_minhash_lsh": None,
        "dedup_substring_spans": None,
        "pack_sequences": None,
        "doc_chunk_overlap": None,
        "dedup_exact": None,
        # round-6: the two composed pipeline operators (gate + prefix-sum
        # compositions) join the curve — the most expensive v4 queries
        # had wall-time evidence at sf0.1 only (round-5 VERDICT #6)
        "pipe_quality_gate": None,
        "pipe_curriculum_pack": None,
        # round-6: the repo's only iterative fixpoint (min-label
        # propagation) joins the curve — three points expose whether
        # propagation rounds x join cost curves up as clusters multiply
        "dedup_keep_best": None,
        # round-6: PQ/ADC compressed-code search joins the curve (fixed
        # codebook size; training scans + encode + ADC scan all linear)
        "sim_ann_pq": None,
        "sim_ann_ivfpq": None,
        # round-6: Matryoshka prefix search — zero build cost, so the
        # curve is the prefix scan + fixed rerank
        "sim_ann_matryoshka": None,
        # round-6: inter-doc boilerplate removal — segment df-count +
        # skinny-key join + reassembly, the curation hot path
        "text_boilerplate_strip": None,
        # worst 10x ratio in round 3 — three points expose whether the
        # sqrt(N)-growing coarse-assignment stage curves up (auto_cells
        # sizing active via _knn_kwargs)
        "sim_knn_graph": _knn_kwargs,
        # round-4 plan change (in-join cosine) + auto_lsh_bits sizing:
        # three points expose whether the growing true-pair volume (all
        # cross-replica copies are real cosine-1.0 duplicates) curves
        # the collision join or the label propagation up
        "dedup_semantic_clusters": _semantic_kwargs,
        # round-9 (round-8 VERDICT #3): the r8 families had x10-only
        # evidence — phash banding (output grows as cross-replica texts
        # ARE byte-near; rows-normalized below), chunk equi-join (same
        # output growth), and the trained-OPQ build (now 1 aggregate +
        # 1 rotation pass + sampled-or-full Lloyd)
        "mm_phash_dedup": None,
        "mm_chunk_dedup": None,
        "sim_ann_opq_trained": None,
    }
    points = [("x1", "/root/testdata/sf0.1", 1), ("x10", "scale_corpus/x10", 10),
              ("x30", "scale_corpus/x30", 30)]
    results: dict[str, dict] = {}
    for name, kw_fn in critical.items():
        fn = merged[name].fn
        row: dict[str, float] = {}
        for label, path, _f in points:
            sec, nrows = _time_query(spark, fn, path, kw_fn(spark, path) if kw_fn else {})
            row[label] = sec
            row[f"{label}_rows"] = nrows
            print(f"# {name} @{label}: {sec}s ({nrows} rows)", file=sys.stderr)
        row["ratio_10_1"] = round(row["x10"] / row["x1"], 2)
        row["ratio_30_10"] = round(row["x30"] / row["x10"], 2)
        # per-output normalization for the families whose OUTPUT is the
        # thing that grows superlinearly on the replicated corpus (every
        # cross-replica copy is a true byte-near pair): wall ratio /
        # output-rows ratio, the round-5 semantic-family defense
        if name in ROWS_NORMALIZED and row["x10_rows"] > 0:
            growth = row["x30_rows"] / row["x10_rows"]
            row["rows_growth_30_10"] = round(growth, 2)
            row["ratio_30_10_per_output"] = round(row["ratio_30_10"] / growth, 3)
        results[name] = row
    payload = {
        "metric": "scaling_curve_3pt",
        "points": [1, 10, 30],
        "families": results,
        "lsh_configs": _LSH_CONFIGS,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: (v["ratio_10_1"], v["ratio_30_10"]) for k, v in results.items()}))
    print(f"wrote {out}")


def four_point(out: str = "BENCH_scale4.json") -> None:
    """Fourth scale point (x100) for the two scale-critical ANN/dedup
    families: two full decades of measured growth answer "would this
    survive 100x?" with a number instead of a plan reading.  Single
    pass per point (the x100 corpus doesn't fit a warm-cache protocol
    in the round budget); sizing rules active at every point.
    Run: python tools/bench_scale.py --four-point"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    spark = get_spark("bench-scale4")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    critical = {
        "sim_knn_graph": _knn_kwargs,
        "dedup_semantic_clusters": _semantic_kwargs,
        # the IVF-path successor: candidate cost/vector constant under
        # auto_cells — measured side by side with the banding path
        "dedup_semantic_ivf": _knn_kwargs,
        # the cheap families ride along for two-decade breadth
        "dedup_exact": None,
        "dedup_minhash_lsh": None,
        "dedup_substring_spans": None,
        "pack_sequences": None,
        "doc_chunk_overlap": None,
        # round-6 curation/tokenizer operators complete the curve
        "text_boilerplate_strip": None,
        "dedup_keep_best": None,
        "pipe_bpe_merges": None,
        "pipe_bpe_encode": None,
        # round-6 PQ family: fixed codebook, so train/encode/ADC are all
        # linear scans — the x100 point checks the flat x1..x30 curve
        # (BENCH_scale3) holds for a second decade
        "sim_ann_pq": None,
        "sim_ann_ivfpq": None,
        # round-6: the truncation axis — one prefix-width corpus scan per
        # query batch + the fixed-width rerank, should track PQ's slope
        "sim_ann_matryoshka": None,
        # round-9 (round-8 VERDICT #3): second-decade points for the r8
        # families — banded phash pairs and chunk-hash upload dedup
        # (both rows-normalized: replicated copies are true pairs), and
        # the single-pass trained-OPQ build
        "mm_phash_dedup": None,
        "mm_chunk_dedup": None,
        "sim_ann_opq_trained": None,
    }
    points = [
        ("x1", "/root/testdata/sf0.1", 1),
        ("x10", "scale_corpus/x10", 10),
        ("x30", "scale_corpus/x30", 30),
        ("x100", "scale_corpus/x100", 100),
    ]
    results: dict[str, dict] = {}
    for name, kw_fn in critical.items():
        fn = merged[name].fn
        row: dict = {}
        diag_fn = PAIR_DIAGNOSTICS.get(name)
        for label, path, _f in points:
            kwargs = kw_fn(spark, path) if kw_fn else {}
            sec, nrows = _time_query(spark, fn, path, kwargs, passes=1)
            row[label] = sec
            row[f"{label}_rows"] = nrows
            print(f"# {name} @{label}: {sec}s ({nrows} rows)", file=sys.stderr)
            if diag_fn is not None:
                d = diag_fn(spark, path, kwargs)
                for k, v in d.items():
                    row[f"{label}_{k}"] = v
                print(f"#   {name} @{label} volume: {d}", file=sys.stderr)
        row["ratio_100_30"] = round(row["x100"] / row["x30"], 2)  # linear = 3.33
        row["ratio_100_1"] = round(row["x100"] / row["x1"], 2)  # linear = 100
        # per-unit-output normalization (round-5 VERDICT #3): the wall
        # ratio divided by the growth of the work the step actually
        # produced — true near-dup pairs for the dedup families, scored
        # candidate pairs for the knn graph.  <= 1.0 means the engine
        # got CHEAPER per unit of output across the step; the residual
        # above linear in the raw ratio is the output growth itself
        # (C(k,2) per replica group in the replicated corpus).
        vol_key = "n_true_pairs" if "x100_n_true_pairs" in row else (
            "n_candidates" if "x100_n_candidates" in row else (
                "rows" if name in ROWS_NORMALIZED else None
            )
        )
        if vol_key is not None and row[f"x30_{vol_key}"] > 0:
            vol_growth = row[f"x100_{vol_key}"] / row[f"x30_{vol_key}"]
            row["volume_growth_100_30"] = round(vol_growth, 2)
            row["ratio_100_30_per_output"] = round(row["ratio_100_30"] / vol_growth, 3)
        results[name] = row
    payload = {
        "metric": "scaling_curve_4pt",
        "points": [1, 10, 30, 100],
        "families": results,
        "lsh_configs": _LSH_CONFIGS,
        "note": "x{N}_n_candidates / x{N}_n_true_pairs record the pair volume "
        "behind each point; ratio_100_30_per_output = wall ratio / output "
        "growth (<=1.0 means cheaper per unit of output across the step)",
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: (v["ratio_100_30"], v["ratio_100_1"]) for k, v in results.items()}))
    print(f"wrote {out}")


def ivf_probe_sensitivity(
    sf_dir: str = "scale_corpus/x30", out: str = "BENCH_ivf_probes.json"
) -> None:
    """Probe-count sensitivity for the IVF dedup path at one scale
    point (round-5 VERDICT #7): IVF_DEDUP_PROBES is a constant 2 —
    measure what 1 / 2 / 3 probes buy.  Per probe count: wall time,
    candidate volume, and true-pair volume; recall proxy = true pairs
    found relative to the widest (probes=3) setting — a superset
    whenever all probe counts rescore the same JL shortlist (asserted
    below; more probed cells of one ranking can only add pairs).
    Run: python tools/bench_scale.py --ivf-probes [sf_dir]"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    fn = merged["dedup_semantic_ivf"].fn
    spark = get_spark("bench-ivf-probes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    kwargs = _knn_kwargs(spark, sf_dir)
    # The "probes=3 candidates are a superset" framing requires every
    # probe count to rescore the SAME JL shortlist: when the 4*probes
    # floor of auto_jl_shortlist binds (n_cells < 64*probes), different
    # probe counts rescore different shortlist prefixes and a cell
    # probed at probes=1 can be absent at probes=3 — recall_vs_p3 could
    # exceed 1.0.  Fail loudly rather than record a silently-wrong note.
    from banking_streamprocessing_demos_spark.operators.similarity import (
        auto_jl_shortlist,
    )

    shortlists = {p: auto_jl_shortlist(kwargs["n_cells"], p) for p in (1, 2, 3)}
    if len(set(shortlists.values())) != 1:
        raise SystemExit(
            f"probe sensitivity needs one shared JL shortlist across probe "
            f"counts; got {shortlists} at n_cells={kwargs['n_cells']} — run at "
            f"a larger scale point (n_cells >= 192 keeps the 1/16 fraction "
            f"above every 4*probes floor)"
        )
    results: dict[str, dict] = {}
    for probes in (1, 2, 3):
        sec, nrows = _time_query(
            spark, fn, sf_dir, {**kwargs, "probes": probes}, passes=1
        )
        d = _ivf_pair_counts(spark, sf_dir, probes=probes, **kwargs)
        results[f"probes_{probes}"] = {
            "sec": sec,
            "rows": nrows,
            **d,
        }
        print(f"# probes={probes}: {sec}s rows={nrows} {d}", file=sys.stderr)
    widest = results["probes_3"]["n_true_pairs"]
    for row in results.values():
        row["true_pair_recall_vs_p3"] = (
            round(row["n_true_pairs"] / widest, 4) if widest else None
        )
    payload = {
        "metric": "ivf_probe_sensitivity",
        "sf_dir": sf_dir,
        "n_cells": kwargs.get("n_cells"),
        "results": results,
        "note": "true_pair_recall_vs_p3 is relative to the probes=3 candidate "
        "superset, not absolute near-dup recall (the exact verifier pins that "
        "separately in tests)",
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v["sec"] for k, v in results.items()}))
    print(f"wrote {out}")


def ivfpq_probe_sensitivity(
    sf_dir: str = "scale_corpus/x30", out: str = "BENCH_ivfpq_probes.json"
) -> None:
    """Probe-count sensitivity for the IVF-PQ search path: with the
    16-cell coarse quantizer fixed, probes = 2/4/8 scan 12.5%/25%/50%
    of the code partitions — measure what each doubling buys in
    recall@5 against the exact brute-force baseline computed once on
    the same corpus.  IVFPQ_PROBES is a constant 4 (the driver-checked
    config); this records where it sits on the knee, the same evidence
    shape as BENCH_ivf_probes.json for the dedup path.
    Run: python tools/bench_scale.py --ivfpq-probes [sf_dir]"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    fn = merged["sim_ann_ivfpq"].fn
    exact_fn = merged["sim_topk_bruteforce"].fn
    spark = get_spark("bench-ivfpq-probes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    t0 = time.time()
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in exact_fn(spark, sf_dir).collect()
    }
    exact_sec = round(time.time() - t0, 3)
    print(f"# exact baseline: {exact_sec}s ({len(exact)} pairs)", file=sys.stderr)

    results: dict[str, dict] = {}
    for probes in (2, 4, 8):
        t0 = time.time()
        rows = fn(spark, sf_dir, probes=probes).collect()
        sec = round(time.time() - t0, 3)
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        recall = round(len(exact & got) / len(exact), 4) if exact else None
        results[f"probes_{probes}"] = {
            "sec": sec,
            "scan_fraction": round(probes / 16, 4),
            "recall_at_5": recall,
        }
        print(f"# probes={probes}: {sec}s recall@5={recall}", file=sys.stderr)
    # second knob at fixed probes=4: the ADC shortlist depth — when the
    # probes sweep is flat, THIS is where the missing recall lives
    # (residual-quantization error reorders the shortlist boundary)
    for rerank in (64, 128, 256):
        t0 = time.time()
        rows = fn(spark, sf_dir, rerank=rerank).collect()
        sec = round(time.time() - t0, 3)
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        recall = round(len(exact & got) / len(exact), 4) if exact else None
        results[f"rerank_{rerank}"] = {"sec": sec, "recall_at_5": recall}
        print(f"# rerank={rerank}: {sec}s recall@5={recall}", file=sys.stderr)
    # the same depth sweep on FLAT PQ for contrast: raw-vector
    # quantization noise saturates it low — the quantitative case for
    # residual encoding
    from banking_streamprocessing_demos_spark.operators.pq import (
        _adc_pq_scored,
        _shortlist_rerank,
        _unit,
    )

    unit = _unit(spark, sf_dir)
    scored = _adc_pq_scored(spark, sf_dir, unit)
    for rerank in (64, 128, 256):
        t0 = time.time()
        rows = _shortlist_rerank(scored, unit, shortlist_depth=rerank).collect()
        sec = round(time.time() - t0, 3)
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        recall = round(len(exact & got) / len(exact), 4) if exact else None
        results[f"flatpq_rerank_{rerank}"] = {"sec": sec, "recall_at_5": recall}
        print(f"# flatpq rerank={rerank}: {sec}s recall@5={recall}", file=sys.stderr)
    payload = {
        "metric": "ivfpq_probe_sensitivity",
        "sf_dir": sf_dir,
        "exact_baseline_sec": exact_sec,
        "results": results,
        "note": "recall@5 vs the exact brute-force top-5 on the same corpus; "
        "scan_fraction = probes/IVF_CELLS, the share of code partitions a "
        "query reads at cluster scale (probe = partition pruning); probes_* "
        "rows run at the shipped rerank default, rerank_* rows vary the ADC "
        "shortlist depth at probes=4, flatpq_rerank_* rows sweep the same "
        "depths on flat PQ (saturates low: the case for residual encoding); "
        "wall times are training-dominated — read the recall column",
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: (v["sec"], v["recall_at_5"]) for k, v in results.items()}))
    print(f"wrote {out}")


def ann_recall_scale(
    base: str = "/root/testdata/sf0.1",
    x10: str = "scale_corpus/fresh_x10",
    x30: str = "scale_corpus/fresh_x30",
    out: str = "BENCH_recall_scale.json",
    x100: str = "scale_corpus/fresh_x100",
) -> None:
    """ANN recall vs scale on the FRESH-VECTOR corpus (round-7 VERDICT
    #1 — the one unmeasured axis of the 100 TB claim): the replicated
    scale corpus is recall-degenerate (replica neighbors share the
    query's cell, recall 1.0 everywhere), so tools/gen_scale_corpus.py
    --fresh grows the embedding table with genuinely NEW vectors drawn
    from the source distribution (x10 is an exact prefix of x30;
    queries and quantizer seeds stay the replica-0 originals).  For
    each scale point: exact brute-force top-5 baseline, then recall@5
    + wall for the four compressed-search families.  sim_ann_ivf is
    measured BOTH at the frozen oracle config (16 cells — the config a
    naive scale-up would keep) and under the production auto_cells
    sizing rule, so the artifact shows what the rule buys.
    Run: python tools/bench_scale.py --recall"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries
    from banking_streamprocessing_demos_spark.operators.pq import (
        IVFPQ_RERANK,
        MRL_SHORTLIST,
        N_TRAIN,
        PQ_RERANK,
        _opq_fixture,
        ivfpq_index,
        opq_trained_index,
        pq_train,
        sim_ann_ivfpq,
        sim_ann_opq_trained,
        sim_ann_pq,
    )
    from banking_streamprocessing_demos_spark.operators.similarity import (
        IVF_CELLS,
        IVF_PROBES,
        auto_cells,
    )

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    exact_fn = merged["sim_topk_bruteforce"].fn
    spark = get_spark("bench-recall-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def measure(fn, sf_dir, exact, kwargs=None):
        t0 = time.time()
        rows = fn(spark, sf_dir, **(kwargs or {})).collect()
        sec = round(time.time() - t0, 3)
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        return {"sec": sec, "recall_at_5": round(len(exact & got) / len(exact), 4)}

    results: dict[str, dict] = {}
    points = [("x1", base), ("x10", x10), ("x30", x30)]
    if os.path.isdir(x100):  # third decade when the corpus exists
        points.append(("x100", x100))
    else:  # never let the artifact imply an unmeasured point
        print(f"# SKIPPING x100: {x100} not generated "
              "(tools/gen_scale_corpus.py --fresh ... 100)", file=sys.stderr)
    for tag, sf_dir in points:
        n_vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        cells = auto_cells(n_vectors)
        t0 = time.time()
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in exact_fn(spark, sf_dir).collect()
        }
        point: dict = {
            "n_vectors": n_vectors,
            "auto_cells": cells,
            "exact_baseline_sec": round(time.time() - t0, 3),
            "n_exact_pairs": len(exact),
        }
        point["sim_ann_ivf_frozen16"] = measure(
            merged["sim_ann_ivf"].fn, sf_dir, exact
        )
        point["sim_ann_ivf_auto"] = measure(
            merged["sim_ann_ivf"].fn, sf_dir, exact,
            {"n_cells": cells, "probes": IVF_PROBES},
        )
        point["sim_ann_pq"] = measure(merged["sim_ann_pq"].fn, sf_dir, exact)
        point["sim_ann_ivfpq"] = measure(merged["sim_ann_ivfpq"].fn, sf_dir, exact)
        point["sim_ann_matryoshka"] = measure(
            merged["sim_ann_matryoshka"].fn, sf_dir, exact
        )
        # the compressed-search sizing rule: funnel (shortlist) depth
        # scales with the per-query candidate pool — frozen 64/128-deep
        # funnels are what decays in the rows above; these rows show the
        # scaled funnel restoring recall at the same code size
        factor = max(1, n_vectors // 2000)
        point["funnel_factor"] = factor
        if factor > 1:
            # base depths come from the module constants so the
            # "base_depth x factor" rule in the payload note stays true
            # if the shipped funnels are ever retuned
            point["sim_ann_pq_scaled"] = measure(
                merged["sim_ann_pq"].fn, sf_dir, exact,
                {"rerank": PQ_RERANK * factor},
            )
            point["sim_ann_ivfpq_scaled"] = measure(
                merged["sim_ann_ivfpq"].fn, sf_dir, exact,
                {"rerank": IVFPQ_RERANK * factor},
            )
            point["sim_ann_matryoshka_scaled"] = measure(
                merged["sim_ann_matryoshka"].fn, sf_dir, exact,
                {"shortlist": MRL_SHORTLIST * factor},
            )
        # Sampled-vs-full training (round-8 VERDICT #2's evidence): the
        # FAISS-shape claim is (a) train wall ~flat in corpus size under
        # the bounded N_TRAIN sample while full-corpus training grows
        # linearly, and (b) recall parity between the two codebooks at
        # the SAME (scaled) funnel depth.  Walls timed separately from
        # the searches so the artifact attributes cost to the right
        # stage.
        t0 = time.time()
        cb_full = pq_train(spark, sf_dir)
        full_train_s = round(time.time() - t0, 3)
        t0 = time.time()
        cb_samp = pq_train(spark, sf_dir, train_sample=N_TRAIN)
        samp_train_s = round(time.time() - t0, 3)
        rr = PQ_RERANK * factor
        point["pq_train"] = {
            "full_train_s": full_train_s,
            "sampled_train_s": samp_train_s,
            "n_train": N_TRAIN,
            "full_search": measure(sim_ann_pq, sf_dir, exact, {"cb": cb_full, "rerank": rr}),
            "sampled_search": measure(sim_ann_pq, sf_dir, exact, {"cb": cb_samp, "rerank": rr}),
        }
        t0 = time.time()
        idx_samp = ivfpq_index(spark, sf_dir, train_sample=N_TRAIN)
        point["ivfpq_sampled"] = {
            "sampled_build_s": round(time.time() - t0, 3),
            "search": measure(
                sim_ann_ivfpq, sf_dir, exact,
                {"index": idx_samp, "rerank": IVFPQ_RERANK * factor},
            ),
        }
        # Trained-OPQ sampled build (round-10: the last sampled twin's
        # scale evidence).  Its recall baseline is the exact top-5 on
        # the ANISOTROPIC FIXTURE view (the corpus the operator is
        # defined over), not the raw embeddings — comparing against the
        # raw-corpus baseline would measure the fixture transform, not
        # the index.
        fix = _opq_fixture(spark, sf_dir).localCheckpoint(eager=True)
        fq = fix.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
        )
        fc = fix.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("nu"))
        fdot = F.aggregate(
            F.zip_with("qu", "nu", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        w5 = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        fix_exact = {
            (r["query_id"], r["neighbor_id"])
            for r in fc.join(F.broadcast(fq), F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cos", F.round(fdot, 6))
            .withColumn("rk", F.row_number().over(w5))
            .filter(F.col("rk") <= 5)
            .collect()
        }
        t0 = time.time()
        oidx_samp = opq_trained_index(spark, sf_dir, train_sample=N_TRAIN)
        samp_build_s = round(time.time() - t0, 3)
        t0 = time.time()
        oidx_full = opq_trained_index(spark, sf_dir)
        full_build_s = round(time.time() - t0, 3)
        point["opq_trained_sampled"] = {
            "sampled_build_s": samp_build_s,
            "full_build_s": full_build_s,
            "n_train": N_TRAIN,
            "search_sampled": measure(
                sim_ann_opq_trained, sf_dir, fix_exact,
                {"index": oidx_samp, "rerank": PQ_RERANK * factor},
            ),
            "search_full": measure(
                sim_ann_opq_trained, sf_dir, fix_exact,
                {"index": oidx_full, "rerank": PQ_RERANK * factor},
            ),
        }
        results[tag] = point
        print(f"# {tag}: {point}", file=sys.stderr)

    payload = {
        "metric": "ann_recall_vs_scale_fresh_vectors",
        "dirs": {tag: d for tag, d in points},
        "frozen_config": {"ivf_cells": IVF_CELLS, "ivf_probes": IVF_PROBES},
        "points": results,
        "note": "recall@5 over the N_QUERIES=5 replica-0 query vectors (25 "
        "pairs; the convention every sensitivity artifact uses) against the "
        "exact brute-force top-5 on the same corpus; fresh-vector corpus = "
        "new seeded per-label-Gaussian unit vectors, x10 an exact prefix of "
        "x30.  sim_ann_ivf_frozen16 keeps the oracle's 16-cell quantizer at "
        "every scale (what naive scale-up does); sim_ann_ivf_auto applies "
        "auto_cells ~ N/128.  PQ/IVF-PQ/MRL base rows run their shipped "
        "constant configs (codebook size is scale-free by design; "
        "shortlist depths PQ_RERANK=64 / IVFPQ_RERANK=128 / "
        "MRL_SHORTLIST=128 — the frozen-funnel decay is the measured "
        "point); *_scaled rows apply the funnel sizing rule depth ~ "
        "base_depth x (N / N_base), the PQ family's analog of "
        "auto_cells.  pq_train rows compare full-corpus vs N_TRAIN "
        "seeded-sample training walls and recall at the SAME scaled "
        "funnel (the Lloyd passes are the bounded part; the sample "
        "SELECTION is still one skinny linear rank pass).  "
        "ivfpq_sampled's build wall includes the corpus-wide residual "
        "materialization (the encode needs it regardless) — only its "
        "Lloyd stage is sample-bounded.  opq_trained_sampled rows "
        "(round-10) compare the sampled vs full trained-OPQ BUILD walls "
        "(fixture + single-pass Givens + allocation + Lloyd; the "
        "rotation/permutation application is corpus-wide in both) and "
        "search recall@5 against the exact top-5 on the ANISOTROPIC "
        "FIXTURE view — the corpus that operator is defined over.",
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({t: {k: v.get("recall_at_5") for k, v in p.items() if isinstance(v, dict)} for t, p in results.items()}))
    print(f"wrote {out}")


def r9_point(out: str = "BENCH_scale_r9.json") -> None:
    """Three scale points (x1/x10/x30) for the round-9 batch families:
    the training-free SQ8 search (wall should be the compressed scan +
    fixed rerank, tracking matryoshka's slope) and the blocked ER match
    (two hash block joins + in-block levenshtein; output links grow
    with the replicated dirty side, so the row carries a per-output
    ratio).  Run: python tools/bench_scale.py --r9-point"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    spark = get_spark("bench-scale-r9")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    critical = [
        "sim_ann_sq8",
        "er_blocked_match",
        "er_match_quality",
        # hard-negative mining shares the knn graph's candidate bound
        # (probes x cell size under auto_cells) — measured with the
        # same production sizing rule active at every point
        "emb_hard_negatives",
    ]
    points = [("x1", "/root/testdata/sf0.1", 1), ("x10", "scale_corpus/x10", 10),
              ("x30", "scale_corpus/x30", 30)]
    results: dict[str, dict] = {}
    for name in critical:
        fn = merged[name].fn
        row: dict = {}
        for label, path, _f in points:
            kwargs = _knn_kwargs(spark, path) if name == "emb_hard_negatives" else {}
            sec, nrows = _time_query(spark, fn, path, kwargs)
            row[label] = sec
            row[f"{label}_rows"] = nrows
            print(f"# {name} @{label}: {sec}s ({nrows} rows)", file=sys.stderr)
        row["ratio_10_1"] = round(row["x10"] / row["x1"], 2)
        row["ratio_30_10"] = round(row["x30"] / row["x10"], 2)
        if name == "er_blocked_match" and row["x10_rows"] > 0:
            growth = row["x30_rows"] / row["x10_rows"]
            row["rows_growth_30_10"] = round(growth, 2)
            row["ratio_30_10_per_output"] = round(row["ratio_30_10"] / growth, 3)
        results[name] = row
    payload = {
        "metric": "scaling_curve_r9_3pt",
        "points": [1, 10, 30],
        "families": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: (v["ratio_10_1"], v["ratio_30_10"]) for k, v in results.items()}))
    print(f"wrote {out}")


def r10_point(out: str = "BENCH_scale_r10.json") -> None:
    """Three scale points (x1/x10/x30) for the round-10 batch families:
    CCNet perplexity buckets (rides the bigram-LM fit + one skinny
    per-lang ranking exchange), DSIR weights (two FIXED-size feature
    models + broadcast rejoin — the paper's CommonCrawl-scale
    property), and the hybrid BM25+ANN fusion (two bounded source
    rankings + a 40-row union).  priv_dp_release and the streaming
    twins are excluded by the standing conventions: the DP release's
    input table (customer) is not part of the scale corpus and its
    cost is output-linear by construction (one grouped count over the
    bounded class space + an in-row CASE); streaming ops are not
    re-timed here.  Run: python tools/bench_scale.py --r10-point"""
    import __spark_entry__ as entrymod
    from banking_streamprocessing_demos_spark.operators import merge_registries

    entrymod.queries()
    merged = merge_registries(*entrymod._REGISTRIES)
    spark = get_spark("bench-scale-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    critical = [
        "pipe_perplexity_buckets",
        "pipe_dsir_weights",
        "rank_fusion_hybrid",
    ]
    points = [("x1", "/root/testdata/sf0.1", 1), ("x10", "scale_corpus/x10", 10),
              ("x30", "scale_corpus/x30", 30)]
    if os.path.isdir("scale_corpus/x100"):  # third decade when generated
        points.append(("x100", "scale_corpus/x100", 100))
    results: dict[str, dict] = {}
    for name in critical:
        fn = merged[name].fn
        row: dict = {}
        for label, path, _f in points:
            sec, nrows = _time_query(spark, fn, path, {})
            row[label] = sec
            row[f"{label}_rows"] = nrows
            print(f"# {name} @{label}: {sec}s ({nrows} rows)", file=sys.stderr)
        row["ratio_10_1"] = round(row["x10"] / row["x1"], 2)
        row["ratio_30_10"] = round(row["x30"] / row["x10"], 2)
        if "x100" in row:
            row["ratio_100_30"] = round(row["x100"] / row["x30"], 2)  # linear = 3.33
        if name == "pipe_perplexity_buckets" and row["x10_rows"] > 0:
            growth = row["x30_rows"] / row["x10_rows"]
            row["rows_growth_30_10"] = round(growth, 2)
            row["ratio_30_10_per_output"] = round(row["ratio_30_10"] / growth, 3)
            if "x100" in row:
                g100 = row["x100_rows"] / row["x30_rows"]
                row["ratio_100_30_per_output"] = round(row["ratio_100_30"] / g100, 3)
        results[name] = row
    payload = {
        "metric": "scaling_curve_r10",
        "points": [f for _l, _p, f in points],
        "families": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: (v["ratio_10_1"], v["ratio_30_10"]) for k, v in results.items()}))
    print(f"wrote {out}")


if __name__ == "__main__":
    if "--recall" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        ann_recall_scale(*args)
    elif "--ivfpq-probes" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        ivfpq_probe_sensitivity(*args)
    elif "--ivf-probes" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        ivf_probe_sensitivity(*args)
    elif "--four-point" in sys.argv:
        four_point()
    elif "--three-point" in sys.argv:
        three_point()
    elif "--r9-point" in sys.argv:
        r9_point()
    elif "--r10-point" in sys.argv:
        r10_point()
    else:
        main()
