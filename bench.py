"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set = the scale-sensitive plans: the 5-way star join, the
timeout detector, snapshot reconstruction, counters, and (when
registered) the LLM-pipeline dedup/similarity ops.  Each query runs
once after a shared-session warm-up; timing includes plan + execution
(collect), which is what a user of the engine experiences.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from banking_streamprocessing_demos_spark.session import get_spark

HEADLINE = [
    "a3_join_agg_revenue",
    "a7_pricing_summary",
    "j1_join_filter_groupby",
    "j2_scalar_correlated_subquery",
    "j5_timeout_pairing",
    "j6_asof_join",
    "j7_range_join",
    "j8_salted_skew_join",
    "w5_session_window",
    "u3_snapshot_last_event_wins",
    "a6_running_counters",
    "w1_hourly_event_counts",
    # LLM-pipeline ops
    "dedup_minhash_lsh",
    "dedup_exact",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "emb_quantize_int8",
    "text_stats_quality",
    "text_tfidf_topk",
    "pipe_curation",
    "mm_feature_extract",
    # message-domain state machine (generator-backed)
    "gen_messages_snapshot",
]

# Second series (round 3+): the round-2/3 extension ops accrue their own
# round-over-round comparability WITHOUT touching the frozen r1↔r2↔r3
# headline set above (round-2 VERDICT "Next round #8").  The driver's
# headline metric/value stays the frozen series; v2 is reported
# alongside.
HEADLINE_V2 = [
    # sketches
    "sketch_hll_distinct",
    "sketch_cms_heavy_hitters",
    "sketch_bloom_prefilter",
    # round-2 LLM-pipeline extensions
    "pack_sequences",
    "dedup_substring_spans",
    "contamination_check",
    "dedup_semantic_clusters",
    "text_repetition",
    "text_pii_scrub",
    "text_bigram_lm_score",
    "pipe_domain_mix",
    "pipe_quality_prune",
    "pipe_shard_assign",
    # event analytics
    "w6_retention_cohorts",
    "w7_funnel",
    "w8_funnel_windowed",
    "w9_scd2_intervals",
    "w10_anomaly_zscore",
    # round-3 additions
    "doc_chunk_overlap",
    "dedup_exact_normalized",
    "f12_json_props",
    "sim_knn_graph",
    "emb_random_project",
    "emb_label_centroids",
    "j9_full_outer_reconcile",
    "text_containment",
    "text_vocab_topk",
    "smp4_group_split",
]

# Third series (round 4+): round-4 batch additions plus scale-sensitive
# ops no earlier series covered — own round-over-round track, single
# pass, without perturbing the frozen v1/v2 comparability.  (The
# streaming_* registry queries are exercised by the dedicated streaming
# probes and the driver's correctness runs, not re-timed here.)
HEADLINE_V3 = [
    "pipe_quality_gate",
    "pipe_epoch_plan",
    "smp5_weighted_sample",
    "u6_merge_upsert",
    "a12_exact_group_median",
    "f13_morton_code",
    "sim_ann_lsh",
    "dedup_ngram_jaccard",
    "w4_sessionization",
]

# Fourth series (round 5+): round-5 batch additions — own
# round-over-round track.  (The new streaming_* registry entries are
# exercised by the streaming probes + driver correctness runs.)
HEADLINE_V4 = [
    "pipe_curriculum_pack",
    "dedup_semantic_ivf",
]

# Fifth series (round 6+): round-6 batch additions — own
# round-over-round track.
HEADLINE_V5 = [
    "text_boilerplate_strip",
    "dedup_keep_best",
    "pipe_bpe_merges",
    "pipe_bpe_encode",
    # PQ search times its own codebook training (emb_pq_codebook is its
    # prefix stage), so one entry covers the whole family
    "sim_ann_pq",
    # the composed residual IVF-PQ index (coarse probe + residual codes)
    "sim_ann_ivfpq",
    # the third compression axis: Matryoshka prefix prescreen + rerank
    "sim_ann_matryoshka",
]

# Sixth series (round 7+): round-7 batch additions — own
# round-over-round track.  (streaming_keep_best is exercised by the
# driver correctness run; streaming ops are not re-timed here.)
HEADLINE_V6 = [
    # the composed curation DAG: gate + keep-best dedup + BPE fit/meter
    # + curriculum pack + epoch plan as ONE job with checkpointed stage
    # boundaries — its wall should track ~the sum of its stages.
    # ROUND-8 NOTE: the DAG gained sample materialization (mix + shard),
    # so v6 totals are not comparable r7<->r8 for this entry.
    "pipe_curate_end_to_end",
    # OPQ-style rotated PQ (random-rotation baseline, recall-neutral on
    # this isotropic corpus by construction — pinned in test_pq.py)
    "sim_ann_opq",
]

# Seventh series (round 8+): round-8 batch additions — own
# round-over-round track.  (streaming_mrl_assign is exercised by the
# driver correctness runs; streaming ops are not re-timed here.)
HEADLINE_V7 = [
    # perceptual-hash image near-dup pairs (banded, losslessness-proved)
    "mm_phash_dedup",
    # trained OPQ: Givens decorrelation + eigenvalue allocation on the
    # anisotropic fixture view (8 aggregate+rotate stages + Lloyd)
    "sim_ann_opq_trained",
    # perceptual clusters (components over the phash pair graph) and
    # fixed-block chunk dedup (position-aligned chunk-hash equi-join)
    "mm_phash_clusters",
    "mm_chunk_dedup",
]

# Eighth series (round 9+): round-9 batch additions — own
# round-over-round track.  (streaming_phash_dedup / streaming_er_match
# are exercised by the driver correctness runs; streaming ops are not
# re-timed here.)
HEADLINE_V8 = [
    # end-to-end PQ search with the bounded-sample-trained codebook
    # (the train stage is constant in corpus size; encode/search scan
    # as in sim_ann_pq) — the FAISS-convention scale shape
    "sim_ann_pq_sampled",
    # SentencePiece-style batched merge learning (driver round-trips
    # K/batch instead of K)
    "pipe_bpe_merges_batched",
    # int8 scalar-quantization search (training-free compression tier)
    "sim_ann_sq8",
    # 1-bit binary-quantization search (the coarsest compression tier:
    # packed sign codes + asymmetric prescreen + deep exact rerank)
    "sim_ann_binary",
    # lexical retrieval: BM25 ranking + reciprocal-rank fusion (the
    # keyword half of a hybrid RAG stack; global top-N rides
    # TakeOrderedAndProject, never a corpus-wide sort window)
    "text_bm25_search",
    "rank_fusion_rrf",
    # MMR diversity re-rank (bounded driver-side greedy; wall is the
    # distributed pool + pair computation)
    "rank_mmr_diversify",
    # per-language tokenizer fertility audit (times its own BPE fit)
    "pipe_tokenizer_fertility",
    # k-anonymity release-decision table (three nested window counts)
    "priv_k_anonymity",
    # temperature (alpha) sampling: corpus-derived mixture weights
    "pipe_temperature_mix",
    # l-diversity homogeneity audit (one grouped count-distinct)
    "priv_l_diversity",
    # IVF-pruned binary search (coarse cells x sign codes)
    "sim_ann_ivf_binary",
    # entity resolution: blocked fuzzy match + quality report
    "er_blocked_match",
    "er_match_quality",
]

# Ninth series (round 10+): round-10 batch additions — own
# round-over-round track.
HEADLINE_V9 = [
    # the two remaining sampled-training twins: bounded seeded-sample
    # training composed with the IVF x PQ index and the trained-OPQ
    # rotation pipeline (each times its own train + search end-to-end)
    "sim_ann_ivfpq_sampled",
    "sim_ann_opq_trained_sampled",
    # hybrid rank fusion: BM25 + the IVF-ANN ranking through the
    # identical 1/(k+rank) union
    "rank_fusion_hybrid",
    # CCNet perplexity terciles (rides the bigram-LM fit) and DSIR
    # hashed-ngram importance weights (two fixed-size feature models)
    # + the composed Gumbel-top-K resampling stage
    "pipe_perplexity_buckets",
    "pipe_dsir_weights",
    "pipe_dsir_resample",
    # epsilon-DP count release (one grouped count + in-row CASE)
    "priv_dp_release",
]

HEADLINE_V10 = [
    # round-11 batch additions (streaming_ppl_gate is exercised by the
    # driver correctness runs; streaming ops are not re-timed here):
    # CCNet sampled-threshold buckets (shuffle-free assignment over the
    # same LM fit as the exact form) and the Gopher rule battery (pure
    # per-row expressions — the scan-speed floor for the quality family)
    "pipe_perplexity_buckets_sampled",
    "pipe_gopher_rules",
    # the hash-gated BLAS ranking path (32 cells, arrow-routed)
    "sim_ann_ivf_arrow",
    # per-source frequency cap (skinny ranking exchange)
    "pipe_source_cap",
    # the composed governance release (grouped count + two windows)
    "priv_release_end_to_end",
    # repetition thresholds over text_repetition (in-row, zero shuffles)
    "pipe_gopher_repetition",
]


def _loadavg() -> list[float]:
    """1/5/15-minute load averages — the box-contention evidence the
    round-7 VERDICT asked the payload to carry (three rounds running,
    bench regressions turned out to be box noise that could only be
    acquitted with side artifacts and commit archaeology)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


# how many committed BENCH_full_local.json revisions the rerun baseline
# draws from: comparing only against the immediately-prior wall lets a
# contended prior RATCHET the defense (round-9 VERDICT hole (b) —
# sim_ann_opq at 18.2 s was 1.19x its contended r8 prior but 2.3x its
# quiet r7 wall and never re-ran).  Min over the last K committed
# payloads anchors the trigger to the best recent quiet evidence.
PRIOR_DEPTH = 3


def _committed_payloads(here: str, depth: int = PRIOR_DEPTH) -> list[tuple[str, dict]]:
    """The last ``depth`` COMMITTED revisions of BENCH_full_local.json,
    newest first, as (commit_sha, payload) — read from git, never the
    working file: main() overwrites the working file at the end of
    every run, so a second bench invocation in the same session would
    otherwise compare against its own just-written (possibly contended)
    walls and quietly neuter the >1.5x-of-prior defense (round-8
    ADVICE / round-9 VERDICT hole (a))."""
    try:
        log = subprocess.run(
            ["git", "-C", here, "log", "-n", str(depth), "--format=%H",
             "--", "BENCH_full_local.json"],
            capture_output=True, text=True, timeout=30,
        )
        shas = log.stdout.split() if log.returncode == 0 else []
    except (OSError, subprocess.SubprocessError):
        shas = []
    out = []
    for sha in shas:
        try:
            blob = subprocess.run(
                ["git", "-C", here, "show", f"{sha}:BENCH_full_local.json"],
                capture_output=True, text=True, timeout=30,
            )
            if blob.returncode == 0:
                out.append((sha, json.loads(blob.stdout)))
        except (OSError, ValueError, subprocess.SubprocessError):
            continue
    return out


def _prior_timings() -> tuple[dict[str, float], dict]:
    """Per-query BEST walls over the last PRIOR_DEPTH committed full
    payloads — the baseline for the in-session auto-re-run of
    suspicious movers — plus a provenance record (which commits the
    baseline came from) carried into the payload so a reader can verify
    the rerun trigger was anchored to committed history, not to the
    file this run is about to overwrite.  Disk fallback only when git
    is unavailable (e.g. an exported tree)."""
    here = os.path.dirname(os.path.abspath(__file__))
    payloads = _committed_payloads(here)
    provenance: dict = {
        "source": "git:BENCH_full_local.json",
        "commits": [sha[:12] for sha, _ in payloads],
        "depth": PRIOR_DEPTH,
    }
    if not payloads:
        try:
            with open(os.path.join(here, "BENCH_full_local.json")) as f:
                payloads = [("working-tree-fallback", json.load(f))]
            provenance = {"source": "working-tree-fallback", "commits": []}
        except (OSError, ValueError):
            return {}, {"source": "none", "commits": []}
    out: dict[str, float] = {}

    def _min_in(name: str, sec) -> None:
        if isinstance(sec, (int, float)) and (name not in out or sec < out[name]):
            out[name] = float(sec)

    for _sha, prior in payloads:
        for key, val in prior.items():
            if key.startswith("queries") and isinstance(val, dict):
                for name, sec in val.items():
                    _min_in(name, sec)
        # pq_stage_split train/search phases get the same protection as
        # the query series (round-8 VERDICT #1: the OPQ train regression
        # shipped unexplained because the split phases were outside the
        # defense)
        split = prior.get("pq_stage_split")
        if isinstance(split, dict):
            for fam, phases in split.items():
                if isinstance(phases, dict):
                    for ph, sec in phases.items():
                        _min_in(f"pq_split:{fam}:{ph}", sec)
    return out, provenance


def _make_runner(spark, qs, sf_dir, prior, reruns):
    """The shared (time-one, run-series) pair over a given session —
    factored out (round 12) so the DEDICATED v1 process and the main
    v2+ session run the identical protocol: two passes min-of-samples,
    collect-never-count, and the >1.5x-of-prior auto-rerun defense with
    per-rerun load samples."""

    def _time_one(name: str, tag: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        # collect, never count(): count() lets Catalyst prune every
        # aggregate/projection and would time a gutted plan
        n = len(df.collect())
        dt = time.perf_counter() - t0
        print(f"# {tag} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        return dt

    def run_series(series_names: list[str], passes: int = 2) -> dict[str, float]:
        timings: dict[str, float] = {}
        for pass_i in range(passes):
            for name in series_names:
                dt = _time_one(name, f"pass{pass_i}")
                if name not in timings or dt < timings[name]:
                    timings[name] = round(dt, 3)
        # self-defense against box contention (round-7 VERDICT #2): any
        # query measuring >1.5x its committed prior (and >0.5 s over it
        # — sub-second wiggles are session noise, not contention) gets
        # ONE same-session re-run; both samples land in the payload so
        # a regression-vs-noise read needs no side artifacts.  The
        # reported series value keeps min-of-samples semantics.
        for name, first in list(timings.items()):
            p = prior.get(name)
            if p and first > 1.5 * p and first - p > 0.5:
                again = _time_one(name, "rerun")
                reruns[name] = {
                    "first_s": first,
                    "rerun_s": round(again, 3),
                    "prior_s": round(p, 3),
                    # load at rerun time (round-10 VERDICT #1: the
                    # start-only quiet gate is blind to mid-session
                    # pile-up — record what load this rerun ran under)
                    "load_1m_at_rerun": (_loadavg() or [0.0])[0],
                }
                timings[name] = min(first, round(again, 3))
        return timings

    return run_series


def v1_main() -> None:
    """--v1-only: run JUST the frozen v1 headline series in this (fresh)
    process and print one JSON line.  Round-12 (VERDICT r11 "Next
    round" #5 / What's wrong #2): the committed same-day 16.92 s vs
    26.12 s spread was largely SELF-load — the v2+ series piling work
    into the session the v1 walls share.  Stamping v1 from its own
    process removes that coupling; the parent bench invokes this first
    and merges the result."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    load = {"start": _loadavg()}
    spark = get_spark("bench-v1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    prior, _prov = _prior_timings()
    reruns: dict[str, dict[str, float]] = {}
    run_series = _make_runner(spark, qs, sf_dir, prior, reruns)
    timings = run_series(names)
    load["end"] = _loadavg()
    print(json.dumps({"queries": timings, "reruns": reruns, "load": load}))
    sys.stdout.flush()


def _run_v1_dedicated() -> dict | None:
    """Spawn the --v1-only child and parse its JSON line.  Returns None
    on any failure so main() falls back to the in-process series (the
    pre-round-12 behavior)."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--v1-only"],
            stdout=subprocess.PIPE,
            timeout=1800,
        )
        for line in reversed(proc.stdout.decode().strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as e:  # noqa: BLE001 — any child failure falls back
        print(f"# v1 dedicated session failed ({e}); in-process fallback",
              file=sys.stderr)
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    names_v2 = [n for n in HEADLINE_V2 if n in qs]
    names_v3 = [n for n in HEADLINE_V3 if n in qs]
    names_v4 = [n for n in HEADLINE_V4 if n in qs]
    names_v5 = [n for n in HEADLINE_V5 if n in qs]
    names_v6 = [n for n in HEADLINE_V6 if n in qs]
    names_v7 = [n for n in HEADLINE_V7 if n in qs]
    names_v8 = [n for n in HEADLINE_V8 if n in qs]
    names_v9 = [n for n in HEADLINE_V9 if n in qs]
    names_v10 = [n for n in HEADLINE_V10 if n in qs]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM + parquet footer caches, not the queries themselves
    spark.range(1000).selectExpr("sum(id)").collect()

    # two passes, min per query: pass 1 warms parquet footers/page cache
    # and codegen; pass 2 is the steady-state number a resident engine
    # would deliver
    prior, prior_provenance = _prior_timings()
    reruns: dict[str, dict[str, float]] = {}
    load_evidence: dict[str, list[float]] = {"start": _loadavg()}
    # Load-ceiling stamp gate (round-9 VERDICT hole (c)): a run that
    # STARTS on a box already loaded past cpus/4 may complete and print
    # its payload (the driver still gets a line), but it must not
    # overwrite the committed-readable quiet artifact — contended walls
    # ratcheting into BENCH_full_local.json is exactly how the r8/r9
    # final gates lost evidentiary value.
    ncpus = os.cpu_count() or 32
    quiet_ceiling = max(2.0, ncpus / 4)
    start_1m = load_evidence["start"][0] if load_evidence["start"] else 0.0
    quiet_gate = {
        "ceiling_1m": round(quiet_ceiling, 2),
        "start_1m": start_1m,
        "quiet": start_1m <= quiet_ceiling,
    }

    run_series = _make_runner(spark, qs, sf_dir, prior, reruns)

    # The driver's wall budget can kill this process at any point; the
    # round-3 run died mid-streaming-probe and every already-computed
    # batch timing was lost because the JSON line only printed at the
    # very end.  Now: emit the full payload (progressively enriched)
    # after EVERY phase — the driver keeps the last parseable line, and
    # a kill at any point still leaves the frozen headline series on
    # stdout.
    def _compact(payload: dict) -> dict:
        # ROUND-13 FIX (r12 VERDICT "What's wrong" #1 / "Next round" #2):
        # the old form dropped the per-query seconds whenever the line
        # outgrew 1900 chars — which it always did once the v10 series
        # and the pq split landed — so the driver's PERF per-query table
        # and scaling ratios were degenerate ({"n_queries": 23}).  The
        # per-query map is the ONE field the driver's ground-truth
        # comparison needs; shed everything else first and drop it only
        # as an impossible last resort.
        c = {
            "metric": payload["metric"],
            "value": payload["value"],
            "unit": payload["unit"],
            "sf": payload["sf"],
            "queries": payload["queries"],
            "headline_v2_total": payload.get("headline_v2_total"),
            "headline_v3_total": payload.get("headline_v3_total"),
            "headline_v4_total": payload.get("headline_v4_total"),
            "headline_v5_total": payload.get("headline_v5_total"),
            "headline_v6_total": payload.get("headline_v6_total"),
            "headline_v7_total": payload.get("headline_v7_total"),
            "headline_v8_total": payload.get("headline_v8_total"),
            "headline_v9_total": payload.get("headline_v9_total"),
            "headline_v10_total": payload.get("headline_v10_total"),
            "pq_stage_split": payload.get("pq_stage_split"),
            "streaming": payload.get("streaming"),
            "streaming_join_variant": payload.get("streaming_join_variant"),
            "streaming_uncontended": payload.get("streaming_uncontended"),
            "full_payload_file": payload.get("full_payload_file", "BENCH_full_local.json"),
            # contention evidence, compressed: 1-min loadavg at start /
            # after the v1 series / at end, plus which queries tripped
            # the >1.5x-of-prior auto-re-run (full samples in the file)
            "load_1m": {
                k: (v[0] if v else None)
                for k, v in payload.get("load_evidence", {}).items()
            },
            "n_reruns": len(payload.get("reruns", {})),
            "quiet_gate": payload.get("quiet_gate"),
            "rerun_baseline": payload.get("rerun_baseline"),
            "v1_mode": payload.get("v1_mode"),
        }

        def wide() -> bool:
            return len(json.dumps(c)) > 1900

        # 1. pq_stage_split: {fam: {train_s, encode_search_s}} -> {fam:
        #    [train, search]} (full-fidelity values live in the payload
        #    file; the split stays readable at a third of the chars)
        if wide() and isinstance(c.get("pq_stage_split"), dict):
            c["pq_stage_split"] = {
                fam: ([ph.get("train_s"), ph.get("encode_search_s")]
                      if isinstance(ph, dict) else ph)
                for fam, ph in c["pq_stage_split"].items()
            }
        # 2. side evidence the full payload file keeps verbatim
        for key in ("rerun_baseline", "streaming_uncontended", "quiet_gate",
                    "load_1m", "v1_mode", "pq_stage_split"):
            if not wide():
                break
            c.pop(key, None)
        # 3. streaming probes down to the two headline rates
        for key in ("streaming", "streaming_join_variant"):
            if wide() and isinstance(c.get(key), dict):
                c[key] = {
                    k: v for k, v in c[key].items()
                    if k in ("events_per_sec", "best_batch_events_per_sec")
                }
        # 4. last resort before losing names: per-query seconds to 2dp
        if wide():
            c["queries"] = {
                k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in c["queries"].items()
            }
        if wide():  # 23 names at 2dp is ~700 chars; this cannot trigger
            c["queries"] = {"n_queries": len(payload["queries"])}
        return c

    def emit(payload: dict) -> None:
        line = json.dumps(payload)
        print(line)
        # the driver parses the LAST JSON line of a ~2 KB output tail; a
        # payload line wider than the tail window would truncate its own
        # head, so follow any wide line with a parseable compact twin
        if len(line) > 1900:
            print(json.dumps(_compact(payload)))
        sys.stdout.flush()

    # Round-12 (VERDICT r11 #5): the headline v1 series runs in its own
    # FRESH process before anything else touches this session, so the
    # stamped walls can never inherit self-load from the v2+ series.
    # The dedicated child applies the identical protocol (fresh JVM,
    # warm-up, 2-pass min, auto-rerun defense); on any child failure
    # the in-process path below keeps the bench alive.
    v1_mode = "dedicated"
    ded = (
        None
        if os.environ.get("SPARK_GRAFT_V1_INPROC")
        else _run_v1_dedicated()
    )
    if ded:
        timings = ded["queries"]
        reruns.update(ded.get("reruns", {}))
        load_evidence["v1_dedicated_start"] = ded.get("load", {}).get("start")
        load_evidence["v1_dedicated_end"] = ded.get("load", {}).get("end")
    else:
        v1_mode = "in_process"
        timings = run_series(names)
    load_evidence["after_v1"] = _loadavg()
    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # mutated in place by later series; every emit() re-serializes
        "load_evidence": load_evidence,
        "reruns": reruns,
        "rerun_baseline": prior_provenance,
        "quiet_gate": quiet_gate,
        "v1_mode": v1_mode,
    }
    emit(result)

    # v2/v3 series: single pass (warm JVM/session already) —
    # comparability round-over-round matters less than fitting the
    # driver budget.
    timings_v2 = run_series(names_v2, passes=1)
    result["headline_v2_total"] = round(sum(timings_v2.values()), 3)
    result["queries_v2"] = timings_v2
    emit(result)

    timings_v3 = run_series(names_v3, passes=1)
    result["headline_v3_total"] = round(sum(timings_v3.values()), 3)
    result["queries_v3"] = timings_v3
    emit(result)

    timings_v4 = run_series(names_v4, passes=1)
    result["headline_v4_total"] = round(sum(timings_v4.values()), 3)
    result["queries_v4"] = timings_v4
    emit(result)

    timings_v5 = run_series(names_v5, passes=1)
    result["headline_v5_total"] = round(sum(timings_v5.values()), 3)
    result["queries_v5"] = timings_v5
    emit(result)

    timings_v6 = run_series(names_v6, passes=1)
    result["headline_v6_total"] = round(sum(timings_v6.values()), 3)
    result["queries_v6"] = timings_v6
    emit(result)

    timings_v7 = run_series(names_v7, passes=1)
    result["headline_v7_total"] = round(sum(timings_v7.values()), 3)
    result["queries_v7"] = timings_v7
    emit(result)

    timings_v8 = run_series(names_v8, passes=1)
    result["headline_v8_total"] = round(sum(timings_v8.values()), 3)
    result["queries_v8"] = timings_v8
    emit(result)

    timings_v9 = run_series(names_v9, passes=1)
    result["headline_v9_total"] = round(sum(timings_v9.values()), 3)
    result["queries_v9"] = timings_v9
    emit(result)

    timings_v10 = run_series(names_v10, passes=1)
    result["headline_v10_total"] = round(sum(timings_v10.values()), 3)
    result["queries_v10"] = timings_v10
    emit(result)

    # PQ-family stage split (round-6 VERDICT #4): the v5 walls above are
    # ~90% FIXED codebook training; emit train/build vs encode+search
    # separately so a reader can't attribute the training wall to the
    # search path (search-time claims in README/SCALE cite these rows).
    # split + import live OUTSIDE the try: if the import itself raised
    # inside, the except handler's split["error"] would NameError and
    # abort the remaining streaming sections (round-7 ADVICE).
    from banking_streamprocessing_demos_spark.operators import pq as pqmod

    split: dict[str, dict[str, float]] = {}

    def _timed_phase(fam: str, phase: str, fn):
        """Time one split phase under the SAME >1.5x-of-prior auto-rerun
        defense run_series applies to the query series (round-8 VERDICT
        #1: the OPQ train regression shipped unexplained because these
        phases were outside the defense).  Returns (wall_s, fn result —
        the rerun's result when a rerun happened, both are equivalent)."""
        key = f"pq_split:{fam}:{phase}"
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        p = prior.get(key)
        if p and dt > 1.5 * p and dt - p > 0.5:
            t0 = time.perf_counter()
            out = fn()
            again = time.perf_counter() - t0
            reruns[key] = {
                "first_s": round(dt, 3),
                "rerun_s": round(again, 3),
                "prior_s": round(p, 3),
                "load_1m_at_rerun": (_loadavg() or [0.0])[0],
            }
            dt = min(dt, again)
        return round(dt, 3), out

    try:
        tr, cb = _timed_phase("sim_ann_pq", "train_s",
                              lambda: pqmod.pq_train(spark, sf_dir))
        ts, n = _timed_phase("sim_ann_pq", "encode_search_s",
                             lambda: len(pqmod.sim_ann_pq(spark, sf_dir, cb=cb).collect()))
        split["sim_ann_pq"] = {"train_s": tr, "encode_search_s": ts}
        # publish incrementally: an ivfpq failure below must not discard
        # the flat-PQ split already measured
        result["pq_stage_split"] = split
        print(f"# pq split sim_ann_pq: train {tr}s, search ({n} rows)", file=sys.stderr)
        tb, idx = _timed_phase("sim_ann_ivfpq", "train_s",
                               lambda: pqmod.ivfpq_index(spark, sf_dir))
        ts, n = _timed_phase("sim_ann_ivfpq", "encode_search_s",
                             lambda: len(pqmod.sim_ann_ivfpq(spark, sf_dir, index=idx).collect()))
        split["sim_ann_ivfpq"] = {"train_s": tb, "encode_search_s": ts}
        print(f"# pq split sim_ann_ivfpq: build {tb}s, search ({n} rows)", file=sys.stderr)
        result["pq_stage_split"] = split
        to, oidx = _timed_phase("sim_ann_opq", "train_s",
                                lambda: pqmod.opq_index(spark, sf_dir))
        ts, n = _timed_phase("sim_ann_opq", "encode_search_s",
                             lambda: len(pqmod.sim_ann_opq(spark, sf_dir, index=oidx).collect()))
        split["sim_ann_opq"] = {"train_s": to, "encode_search_s": ts}
        result["pq_stage_split"] = split
        print(f"# pq split sim_ann_opq: build {to}s, search ({n} rows)", file=sys.stderr)
        # the round-10 sampled twins time their own builds inside the v9
        # series; split them here too so a heavy v9 total can't be
        # misread as search cost (the round-6 attribution rule)
        tb, sidx = _timed_phase("sim_ann_ivfpq_sampled", "train_s",
                                lambda: pqmod.ivfpq_index(spark, sf_dir,
                                                          train_sample=pqmod.N_TRAIN))
        ts, n = _timed_phase("sim_ann_ivfpq_sampled", "encode_search_s",
                             lambda: len(pqmod.sim_ann_ivfpq(spark, sf_dir, index=sidx).collect()))
        split["sim_ann_ivfpq_sampled"] = {"train_s": tb, "encode_search_s": ts}
        result["pq_stage_split"] = split
        print(f"# pq split sim_ann_ivfpq_sampled: build {tb}s, search ({n} rows)",
              file=sys.stderr)
        tb, tidx = _timed_phase("sim_ann_opq_trained_sampled", "train_s",
                                lambda: pqmod.opq_trained_index(spark, sf_dir,
                                                                train_sample=pqmod.N_TRAIN))
        ts, n = _timed_phase(
            "sim_ann_opq_trained_sampled", "encode_search_s",
            lambda: len(pqmod.sim_ann_opq_trained(spark, sf_dir, index=tidx).collect()))
        split["sim_ann_opq_trained_sampled"] = {"train_s": tb, "encode_search_s": ts}
        result["pq_stage_split"] = split
        print(f"# pq split sim_ann_opq_trained_sampled: build {tb}s, search ({n} rows)",
              file=sys.stderr)
    except Exception as exc:  # never lose earlier numbers to the split probe
        split["error"] = str(exc)[:200]
        result["pq_stage_split"] = split
    emit(result)

    for key, kwargs in (
        ("streaming", {}),
        ("streaming_join_variant", {"variant": "join", "rows_per_second": 500_000}),
    ):
        try:
            result[key] = _streaming_throughput(**kwargs)
        except Exception as exc:  # a failed probe must not lose batch numbers
            result[key] = {"error": str(exc)[:200]}
        emit(result)

    # Fold in the round's DEDICATED uncontended detector measurement
    # (tools/bench_detector_sustained.py, run alone before bench) so the
    # round artifact carries both the contended in-bench figure and the
    # uncontended protocol figure side by side (round-5 VERDICT #5: the
    # in-bench sustained number absorbs contention from the ~40 queries
    # that just ran in this same session).
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_stream_uncontended.json")) as f:
            unc = json.load(f)
        result["streaming_uncontended"] = {
            "events_per_sec": unc.get("events_per_sec"),
            "best_batch_events_per_sec": unc.get("best_batch_events_per_sec"),
            "source": "BENCH_stream_uncontended.json (dedicated session)",
        }
        emit(result)
    except FileNotFoundError:
        pass

    # The driver keeps only a ~2 KB tail of combined stdout+stderr and
    # parses the last JSON line it can find.  Rounds 3 and 4 both lost
    # the payload: r3 to a kill before the end-only print, r4 to (a)
    # teardown noise printed AFTER the last emit and (b) the full
    # payload line itself outgrowing the tail window (2.1-4 KB), which
    # truncates the JSON's HEAD.  Three defenses: silence all logging
    # and drain async task-abort lines; persist the full payload to a
    # committed-readable file; then emit a COMPACT final line (v1
    # queries + v2/v3 totals + streaming) hard-capped under the tail
    # window so the last line always parses.
    load_evidence["end"] = _loadavg()
    get_spark("bench").sparkContext.setLogLevel("OFF")
    here = os.path.dirname(os.path.abspath(__file__))
    # Stamp gate: a non-quiet run writes BENCH_full_contended.json and
    # leaves the committed quiet artifact alone (when committed history
    # exists to protect — with no prior, any evidence beats none).
    # The stdout payload is emitted either way, flagged by quiet_gate.
    artifact = "BENCH_full_local.json"
    if not quiet_gate["quiet"] and _committed_payloads(here, depth=1):
        artifact = "BENCH_full_contended.json"
        print(f"# quiet gate FAILED (load_1m {quiet_gate['start_1m']} > "
              f"{quiet_gate['ceiling_1m']}): writing {artifact}, preserving "
              "the committed BENCH_full_local.json", file=sys.stderr)
    result["full_payload_file"] = artifact
    with open(os.path.join(here, artifact), "w") as f:
        json.dump(result, f, indent=1)
    time.sleep(3)
    sys.stderr.flush()
    print(json.dumps(_compact(result)))
    sys.stdout.flush()


def _streaming_throughput(
    measure_s: int = 25,
    variant: str = "state",
    rows_per_second: int = 100_000,
    wall_cap_s: int = 60,
) -> dict:
    """Throughput through the detector: rate source → detector plan.
    variant='state' is the primary applyInPandasWithState path;
    variant='join' is the all-JVM stream-stream outer-join plan (no
    Python in the loop → higher ceiling, classification-only output).
    Reports BOTH sustained rate (rows/busy over completed data batches
    after one warm-up batch) and the best single-batch rate (stable
    under host contention)."""
    import tempfile
    import time

    from banking_streamprocessing_demos_spark.config import GeneratorConfig
    from banking_streamprocessing_demos_spark.sources.rate_stream import message_rate_stream
    from banking_streamprocessing_demos_spark.streaming.detector import detect_undelivered
    from banking_streamprocessing_demos_spark.streaming.detector_join import (
        detect_undelivered_join,
    )

    spark = get_spark(f"bench-streaming-{variant}")
    stream = message_rate_stream(
        spark,
        GeneratorConfig(seed="bench"),
        rows_per_second=rows_per_second,
        max_forks=10_000,
        ticks_per_message=100,
        delivery_delay_ticks=20,
    )
    if variant == "join":
        det = detect_undelivered_join(stream, timeout_ms=60_000, watermark_delay="5 seconds")
    else:
        det = detect_undelivered(stream, timeout_ms=60_000, watermark_delay="5 seconds")
    q = (
        det.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench-stream-ckpt-"))
        .start()
    )
    # poll until enough DATA batches completed (warm-up + ≥2 measured),
    # but never past wall_cap_s total: the driver's round budget killed
    # the uncapped 90-125 s probes in round 3 before bench output landed
    deadline = time.monotonic() + wall_cap_s
    time.sleep(min(measure_s, wall_cap_s))
    while time.monotonic() < deadline:
        if q.exception() is not None:
            raise q.exception()  # surface a failed plan, don't report 0 ev/s
        done = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
        if done >= 3:
            break
        time.sleep(5)
    progress = list(q.recentProgress)
    # stop() aborts in-flight noop-write tasks, which log ERROR lines
    # asynchronously; silence them so they can't land after the bench
    # payload in the combined output stream
    spark.sparkContext.setLogLevel("OFF")
    q.stop()
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    # skip the first data batch (python-worker + state-store warm-up);
    # report the best per-batch rate — stable even when contention leaves
    # few completed batches in the window
    steady = data_batches[1:] or data_batches
    rows = sum(p["numInputRows"] for p in steady)
    busy = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000
    rates = [
        p["numInputRows"] / (p["durationMs"]["triggerExecution"] / 1000)
        for p in steady
        if p["durationMs"]["triggerExecution"] > 0
    ]
    sustained = int(rows / busy) if busy > 0 else 0
    best = int(max(rates)) if rates else 0
    print(
        f"# streaming[{variant}]: {rows} rows / {busy:.1f}s busy -> "
        f"sustained {sustained}, best batch {best} ev/s",
        file=sys.stderr,
    )
    out: dict = {}
    if not data_batches:
        # 0 ev/s with no exception = the probe STARVED (no data batch
        # completed inside wall_cap_s — an end-of-session load artifact,
        # seen round-12 at load_1m 15.5), not a broken plan; say so in
        # the payload instead of letting 0 read as a regression
        out["note"] = (
            f"no data batch completed within wall_cap_s={wall_cap_s} "
            f"(load_1m {(_loadavg() or [0.0])[0]}); starved probe, "
            "not a failed plan — see the dedicated uncontended artifact"
        )
    out.update({
        "events_per_sec": sustained,
        "best_batch_events_per_sec": best,
        "input_rows": rows,
        "busy_sec": round(busy, 1),
    })
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--v1-only":
        v1_main()
    else:
        main()
