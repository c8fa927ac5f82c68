#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default mode — what the per-round driver runs:
    python bench.py
  Runs the headline queries from ``biokg_spark.queries.REGISTRY`` plus the
  flagship end-to-end KG pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
  /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
  prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "turns_per_sec": ...}

Scaling mode — evidence for BASELINE.json's ≥0.8 N→4N criterion
(no real cluster in this sandbox, so two parallelism levels stand in
for two cluster sizes; identical deterministic input at both):
    python bench.py --scaling
  Runs the full KG pipeline as a subprocess at local[8] and local[32]
  over the SAME pre-materialized transcript table and prints throughput
  (turns/sec) at both plus scaling efficiency = (thr@32 / thr@8) / 4.

All diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline queries: one per operator family (SURVEY.md §2 + training-data
# ops). The KG pipeline run is added separately as the flagship.
HEADLINE = [
    "agg_pricing_summary",
    "join_broadcast_enrich",
    "semi_join_universe",
    "anti_join_exclusion",
    "window_topk_per_group",
    "hierarchy_expand",
    "partitioned_fanout_species",
    "stanza_assembly",
    "hypertable_rollup",
    "asof_join_events",
    "range_join_intervals",
    "events_funnel",
    "kg_mention_scan",
    "kg_mention_scan_join",
    "kg_cooccurrence_links",
    "kg_negative_sampling",
    "kg_edge_provenance",
    "kg_metapath_inference",
    "kg_pagerank",
    "kg_hits",
    "kg_kcore",
    "kg_graph_profile",
    "kg_snapshot_diff",
    "kg_proximity_links",
    "transcript_sessionize",
    "transcript_sft_pairs",
    "transcript_tool_transitions",
    "kg_pmi_links",
    "kg_entity_vocab",
    "kg_triangle_counts",
    "kg_node_similarity",
    "kg_property_fanout",
    "kg_schema_audit",
    "ddi_cascade_effects",
    "dedup_exact",
    "corpus_decontaminate",
    "kg_skipgram_pairs",
    "kg_entity_tfidf",
    "corpus_chunk_windows",
    "kg_random_walks",
    "kg_node2vec_walks",
    "kg_communities_lpa",
    "kg_neighbor_sample",
    "kg_ego_network",
    "dedup_chunk_exact",
    "dedup_minhash_lsh",
    "transcript_near_dup",
    "dedup_simhash",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "text_quality",
    "text_repetition",
    "corpus_filter",
    "text_tokenize_bpe",
    "corpus_bpe_train",
    "text_pii_scrub",
    "corpus_line_dedup",
    "corpus_mixture_epochs",
    "corpus_source_profile",
    "corpus_slice_overlap",
    "corpus_delta_dedup",
    "corpus_leakage_safe_split",
    "corpus_budget_select",
    "corpus_bm25_search",
    "text_unigram_logprob",
    "embed_cosine_topk",
    "embed_ann_lsh",
    "embed_ann_hnsw",
    "embed_kmeans",
    "kg_personalized_pagerank",
    "corpus_quality_classifier",
    "transcript_dpo_pairs",
    "corpus_dsir_scores",
    "kg_bfs_distances",
    "corpus_semantic_dedup",
    "corpus_hard_negatives",
    "kg_harmonic_centrality",
    "kg_skew_profile",
    "dedup_span_intervals",
    "dedup_span_excise",
    "events_burst_detection",
    "corpus_bpe_encode",
    "kg_betweenness",
    "kg_weighted_distances",
    "corpus_hybrid_rrf",
    "dedup_blocking_metrics",
    "events_sliding_rollup",
    "events_decay_score",
    "embed_ann_recall",
    "events_retention_cohorts",
    "corpus_quality_percentiles",
    "kg_modularity",
    "events_scd2_versions",
    "events_hll_distinct",
    "corpus_cm_frequencies",
    "kg_transe_embeddings",
    "kg_transe_eval",
    "corpus_table_profile",
    "transcript_topic_segments",
    "events_value_histogram",
    "corpus_lang_confusion",
    "events_type_trend",
    "kg_conversation_graphs",
    "corpus_stratified_sample",
    "dedup_keep_best",
    "events_zorder_locality",
    "kg_rule_confidence",
    "kg_sparsify_topk",
    "transcript_turn_loops",
    "dedup_containment",
    "dedup_source_matrix",
    "kg_predicate_profile",
    "events_top_paths",
    "kg_ktruss",
    "corpus_rater_agreement",
    "corpus_simpson_diversity",
    "kg_distmult_embeddings",
]

# Synthetic-transcript sizing per scale factor for the flagship pipeline
# run (BASELINE.json input_hint shape; ~8.5 turns/conversation avg).
_SF_CONVS = {"0.001": 400, "0.01": 4_000, "0.1": 40_000, "1": 400_000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_spark(cpus: int, app: str = "biokg-bench"):
    from biokg_spark.session import get_spark

    return get_spark(app_name=app, master=f"local[{cpus}]", shuffle_partitions=cpus)


def run_df(df) -> None:
    """Force full execution without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


# ---------------------------------------------------------------------------
# flagship: end-to-end KG pipeline over synthetic transcripts
# ---------------------------------------------------------------------------


def materialize_transcripts(
    spark, path: str, n_conversations: int, words_per_turn: int = 12
) -> int:
    """Write the deterministic transcript table once; return turn count."""
    from biokg_spark.datagen.transcripts import transcripts

    tx = transcripts(
        spark,
        n_conversations=n_conversations,
        words_per_turn=words_per_turn,
        partitions=64,
    )
    tx.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def run_pipeline(spark, tx_path: str, workdir: str) -> dict:
    """One full parse→map→link→emit run; returns stage row counts."""
    from biokg_spark.datagen.transcripts import entity_lexicon, id_mapping, ontology
    from biokg_spark.pipeline.kg import KGPipeline

    pipe = KGPipeline(
        spark,
        workdir,
        lexicon=entity_lexicon(spark),
        id_mapping=id_mapping(spark),
        ontology=ontology(spark),
        buckets=spark.sparkContext.defaultParallelism,
    )
    pipe.run(spark.read.parquet(tx_path), run_key=tx_path)
    # per-stage rows + wall time come from the checkpoint manifests — no
    # extra count() jobs
    return pipe.metrics()


def _singlenode_crosscheck(bench_turns_per_sec: float) -> dict | None:
    """Compare this run's e2e turns/s against the newest SINGLENODE_r*.json
    (same engine code, same pipeline). A ratio far from 1 in EITHER
    direction flags a host-stall window, not a code change — the probes
    in both artifacts say which window was degraded. (Round 3 shipped a
    5x-apart pair with no way to tell; this line is the fix.)"""
    import glob

    files = sorted(
        glob.glob(os.path.join(REPO, "SINGLENODE_r*.json")), key=os.path.getmtime
    )
    if not files:
        return None
    with open(files[-1]) as f:
        sn = json.load(f)
    sn_tps = sn.get("spark_pipeline_local32_incl_checkpoints", {}).get(
        "turns_per_sec"
    )
    if not sn_tps:
        return None
    return {
        "artifact": os.path.basename(files[-1]),
        "singlenode_spark_turns_per_sec": sn_tps,
        "bench_turns_per_sec": bench_turns_per_sec,
        "ratio": round(bench_turns_per_sec / sn_tps, 3),
        "singlenode_calibration": sn.get("calibration"),
        "note": "comparable only at sf>=0.1 (fixed per-job overhead "
                "dominates turns/s at smaller sf); there, ratio far from 1 "
                "=> host-stall window (see calibration slowdowns in both "
                "artifacts), not a code delta",
    }


def bench_default() -> None:
    from biokg_spark.plans.hostprobe import host_calibration
    from biokg_spark.queries import REGISTRY

    sf = _sf_of(SF_DIR)
    spark = make_spark(CPUS)
    log(f"bench: sf_dir={SF_DIR} cpus={CPUS}")

    timings: dict[str, float] = {}
    # warm up the JVM + parquet footers on a trivial scan
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()

    # host-speed probes BEFORE and AFTER the measured section: constant
    # work, so `slowdown` ~1.0 marks a healthy window and ~2-5 marks the
    # stall windows this host exhibits (BASELINE.md). Without these a
    # reader cannot tell a 5x host stall from a 5x regression.
    cal_start = host_calibration(spark, multicore=min(CPUS, 8))
    log(f"  calibration(start): {cal_start}")

    # Min-of-k per query, not a single shot: the sandbox host stalls the
    # VM ~20-30 s at random (BASELINE.md protocol notes), and in round 2
    # a single-rep protocol made eight sub-2 s queries look 1.3-2.2×
    # slower with UNCHANGED code. Only the minimum converges on the
    # machine's true rate, so round-over-round deltas become signal.
    reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "2"))
    for name in HEADLINE:
        fn, _sql = REGISTRY[name]
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            run_df(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        log(f"  {name}: {timings[name]}s (min of {reps})")

    # flagship end-to-end pipeline: best-of-k fresh-checkpoint runs (the
    # sandbox host stalls the VM at random intervals; min-of-k converges
    # on the true rate — see BASELINE.md protocol notes). k>=3 per the
    # round-3 verdict: with k=2 a stall spanning both reps published a
    # 5x-slow e2e number for healthy code.
    e2e_reps = int(os.environ.get("SPARK_GRAFT_E2E_REPS", "3"))
    e2e_walls: list[float] = []
    tmp = tempfile.mkdtemp(prefix="biokg_bench_")
    try:
        n_convs = _SF_CONVS.get(sf, 4_000)
        tx_path = os.path.join(tmp, "transcripts")
        n_turns = materialize_transcripts(spark, tx_path, n_convs)
        best = None
        for rep in range(e2e_reps):
            t0 = time.perf_counter()
            stages = run_pipeline(spark, tx_path, os.path.join(tmp, f"ckpt{rep}"))
            dt = time.perf_counter() - t0
            log(f"  kg_pipeline_e2e rep{rep}: {dt:.3f}s")
            e2e_walls.append(round(dt, 3))
            if best is None or dt < best[0]:
                best = (dt, stages)
            shutil.rmtree(os.path.join(tmp, f"ckpt{rep}"), ignore_errors=True)
        dt, stages = best
        timings["kg_pipeline_e2e"] = round(dt, 3)
        turns_per_sec = round(n_turns / dt, 1)
        log(f"  kg_pipeline_e2e: {dt:.3f}s ({n_turns} turns, {turns_per_sec} turns/s)")
        for sname, m in stages.items():
            log(f"    stage {sname}: {m['wall_sec']}s rows={m['rows']}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    cal_end = host_calibration(spark, multicore=min(CPUS, 8))
    log(f"  calibration(end): {cal_end}")
    crosscheck = _singlenode_crosscheck(turns_per_sec)
    if crosscheck:
        log(f"  singlenode crosscheck: {crosscheck}")

    total = round(sum(timings.values()), 3)
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # 1-decimal in the compact stdout line (full 3-decimal timings in
        # BENCH_LOCAL.json, committed): at ~70 headline queries the line
        # must stay inside the driver's 2 KiB stdout tail
        "queries": {k: round(v, 1) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns_per_sec": turns_per_sec,
        "cpus": CPUS,
        "full_report": "BENCH_LOCAL.json",
    }
    full = dict(
        compact,
        queries=timings,  # full 3-decimal precision in the file report
        e2e_rep_walls=e2e_walls,
        calibration={"start": cal_start, "end": cal_end},
        singlenode_crosscheck=crosscheck,
    )
    # The driver keeps only the last ~2 KiB of stdout and parses the final
    # line; round 4's line carried the calibration blocks inline, overflowed
    # that tail, and the artifact recorded "parsed": null with the first
    # ~15 query timings unrecoverable. The full report (calibration, rep
    # walls, crosscheck) now goes to BENCH_LOCAL.json at the repo root and
    # the printed line stays compact.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1)
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never overflow the 2 KiB tail
        # first shed optional metadata keys (all duplicated in the file
        # report) before sacrificing any per-query timing
        for key in ("full_report", "cpus"):
            compact.pop(key, None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact["queries"] = {
            k: v for k, v in sorted(
                timings.items(), key=lambda kv: -kv[1]
            )[:30]
        }
        compact["queries_truncated_see_full_report"] = True
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


# ---------------------------------------------------------------------------
# scaling mode: same job, two parallelism levels
# ---------------------------------------------------------------------------


def pipeline_worker(
    cpus: int, tx_path: str, workdir: str, reps: int = 1, coordinate: bool = False
) -> None:
    """Subprocess body: run the pipeline ``reps`` times at local[cpus] in ONE
    JVM (fresh checkpoint dir per rep — no resume shortcuts) and report the
    best rep. Steady-state measurement: a long-lived cluster job runs with
    a warm JIT and warm Python workers; and the sandbox host stalls the VM
    for ~20-30 s at random intervals (observed: one arbitrary stage per run
    absorbs the hit, ~0% steal reported), so min-of-k is the only estimator
    that converges on the machine's true rate.

    ``coordinate=True`` (the --interleaved scaling protocol): instead of
    looping freely, block on stdin for a ``GO`` line before each rep and
    print ``REPDONE {json}`` after it; ``EXIT`` ends the loop and emits the
    final JSON. The parent alternates GO between the two leg processes so
    consecutive (lo, hi) reps sample the SAME host window — the drift that
    broke the sequential protocol (same code+input: 173.6 s and 131.6 s at
    local[8] forty minutes apart) cancels out of the ratio. Both JVMs stay
    alive (warm JIT) but the idle one is blocked on a read, using no CPU."""
    from biokg_spark.plans.hostprobe import cpu_probe, host_calibration

    spark = make_spark(cpus, app=f"biokg-scale-{cpus}")
    n_turns = spark.read.parquet(tx_path).count()  # warm input footers
    # multicore probe at the leg's own width: the single-core probes
    # missed a window where 8-core delivery was ~1.5x degraded while
    # 1-core reads were healthy (hypervisor burst throttling)
    cal = host_calibration(spark, multicore=cpus)
    best = None
    rep_walls = []
    rep_probes = []
    rep = 0
    while True:
        if coordinate:
            line = sys.stdin.readline()
            if not line or line.strip() == "EXIT":
                break
        elif rep >= reps:
            break
        t0 = time.perf_counter()
        stages = run_pipeline(spark, tx_path, f"{workdir}_r{rep}")
        dt = time.perf_counter() - t0
        log(f"    rep{rep}: {dt:.1f}s")
        rep_walls.append(round(dt, 1))
        # one cheap single-core probe per rep: stamps each wall with the
        # host window it ran in (0.35 s, negligible vs the 100-400 s rep)
        rep_probes.append(cpu_probe(reps=1)["slowdown"])
        if best is None or dt < best[0]:
            best = (dt, stages)
        shutil.rmtree(f"{workdir}_r{rep}", ignore_errors=True)
        if coordinate:
            print(
                "REPDONE "
                + json.dumps({"rep": rep, "wall_sec": round(dt, 3)}),
                flush=True,
            )
        rep += 1
    dt, stages = best
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "reps": rep,
                "rep_walls": rep_walls,
                "rep_cpu_slowdowns": rep_probes,
                "wall_sec": round(dt, 3),
                "turns_per_sec": round(n_turns / dt, 1),
                "calibration": cal,
                "stages": stages,
            }
        ),
        flush=True,
    )
    spark.stop()


def _interleaved_legs(
    levels: tuple[int, int], tx_path: str, tmp: str, repeats: int
) -> tuple[dict[int, dict], list[dict]]:
    """Run both pinned leg processes with ALTERNATING warm reps
    (lo, hi, lo, hi, ...) via the GO/REPDONE stdin protocol.

    Sequential legs sample different host windows and this host's
    delivered multi-core throughput drifts ~1.5x on ~10-minute timescales;
    fully concurrent legs share L3/memory bandwidth and contaminate the
    ratio with hardware interference. Interleaving is the middle path:
    each leg runs ALONE on its pinned cores (no cross-leg contention),
    but consecutive reps of the two legs are adjacent in time, so the
    min-of-k of each leg samples the same set of windows. Per-cycle
    paired ratios land in the artifact as the drift evidence."""
    core_base = 0
    procs: dict[int, subprocess.Popen] = {}
    errfiles: dict[int, object] = {}
    for cpus in levels:
        pin = (
            ["taskset", "-c", f"{core_base}-{core_base + cpus - 1}"]
            if shutil.which("taskset")
            else []
        )
        core_base += cpus
        cmd = pin + [
            sys.executable,
            os.path.abspath(__file__),
            "--pipeline-run",
            "--coordinate",
            "--cpus",
            str(cpus),
            "--input",
            tx_path,
            "--workdir",
            os.path.join(tmp, f"ckpt_{cpus}"),
        ]
        errfiles[cpus] = open(os.path.join(tmp, f"leg_{cpus}.stderr"), "w")
        procs[cpus] = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=errfiles[cpus],
            text=True,
            bufsize=1,
        )

    def one_rep(cpus: int) -> float:
        p = procs[cpus]
        p.stdin.write("GO\n")
        p.stdin.flush()
        while True:
            line = p.stdout.readline()
            if not line:
                raise RuntimeError(
                    f"leg local[{cpus}] died mid-rep (see leg_{cpus}.stderr)"
                )
            if line.startswith("REPDONE "):
                return json.loads(line[len("REPDONE "):])["wall_sec"]

    cycles: list[dict] = []
    lo, hi = levels
    for cycle in range(repeats):
        walls = {c: one_rep(c) for c in levels}
        eff = (walls[lo] / walls[hi]) / (hi / lo)
        cycles.append(
            {"cycle": cycle, "walls": {str(c): walls[c] for c in levels},
             "paired_efficiency": round(eff, 3)}
        )
        log(f"  cycle{cycle}: local[{lo}]={walls[lo]}s local[{hi}]={walls[hi]}s "
            f"paired_eff={eff:.3f}")

    results: dict[int, dict] = {}
    for cpus, p in procs.items():
        p.stdin.write("EXIT\n")
        p.stdin.flush()
        stdout, _ = p.communicate()
        errfiles[cpus].close()
        if p.returncode != 0:
            raise RuntimeError(f"pipeline subprocess local[{cpus}] failed")
        results[cpus] = json.loads(stdout.strip().splitlines()[-1])
        log(f"  local[{cpus}] min-of-{results[cpus]['reps']} (interleaved): "
            f"{results[cpus]['wall_sec']}s "
            f"({results[cpus]['turns_per_sec']} turns/s) "
            f"reps={results[cpus].get('rep_walls')}")
    return results, cycles


def bench_scaling(
    n_conversations: int,
    levels: tuple[int, int] = (2, 8),
    concurrent: bool = False,
    interleaved: bool = False,
) -> None:
    """Same pipeline, same input, two parallelism levels (N and 4N cores).

    The input is sized so per-stage compute dominates fixed per-job
    overheads (scheduler, codegen, Python-worker start) — the sandbox
    stand-in for "two cluster sizes" per BASELINE.json. Heavier turns
    (words_per_turn=40) model real transcript text.

    Default pair is local[2] → local[8]: a raw-CPU calibration on this VM
    (multiprocessing busy-loop, BENCH notes in BASELINE.md) shows 2→8
    processes scale at ~0.95 efficiency but 8→32 caps at ~0.71 — the box
    advertises 32 logical CPUs yet delivers only ~20 cores of parallel
    throughput (hypervisor overcommit). 8→32 therefore cannot evidence
    SOFTWARE scaling; 2→8 stays inside the hardware's linear range.
    Override with --levels for the wide pair.
    """
    tmp = tempfile.mkdtemp(prefix="biokg_scale_")
    try:
        spark = make_spark(max(levels), app="biokg-scale-gen")
        tx_path = os.path.join(tmp, "transcripts")
        n_turns = materialize_transcripts(
            spark, tx_path, n_conversations, words_per_turn=40
        )
        spark.stop()
        log(f"scaling: {n_conversations} conversations, {n_turns} turns at {tx_path}")

        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
        cycles: list[dict] | None = None
        if interleaved:
            results, cycles = _interleaved_legs(levels, tx_path, tmp, repeats)
            _emit_scaling_report(levels, results, n_turns,
                                 mode="interleaved-pinned", cycles=cycles)
            return
        results = {}
        # Sequential legs sample DIFFERENT host windows, and this host's
        # delivered multi-core throughput drifts ~1.5x on ~10-minute
        # timescales (round-4 A/B: same code+input measured 173.6 s and
        # 131.6 s at local[8] forty minutes apart, single-core probes
        # healthy throughout). --concurrent runs both legs at once on
        # DISJOINT pinned core sets (e.g. 0-1 and 2-9), so both legs see
        # the identical window by construction and the ratio measures the
        # SOFTWARE. Total load (N + 4N cores) stays under the ~20 cores
        # this box actually delivers.
        procs: dict[int, subprocess.Popen] = {}
        core_base = 0
        for cpus in levels:
            # Pin the whole JVM to exactly `cpus` CPUs: without it, a
            # local[2] JVM still sizes GC/IO thread pools off the
            # machine's 32 CPUs and silently borrows them (measured: the
            # mention scan runs 19% faster unpinned at local[2]) — a
            # cluster of 2-core slices has no such bonus, so the unpinned
            # stand-in inflates the small leg and understates scaling.
            # Concurrent mode pins the legs to DISJOINT ranges.
            pin = (
                ["taskset", "-c", f"{core_base}-{core_base + cpus - 1}"]
                if shutil.which("taskset")
                else []
            )
            if concurrent:
                core_base += cpus
            cmd = pin + [
                sys.executable,
                os.path.abspath(__file__),
                "--pipeline-run",
                "--cpus",
                str(cpus),
                "--reps",
                str(repeats),
                "--input",
                tx_path,
                "--workdir",
                os.path.join(tmp, f"ckpt_{cpus}"),
            ]
            if concurrent:
                procs[cpus] = subprocess.Popen(
                    cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
                )
                continue
            out = subprocess.run(cmd, capture_output=True, text=True)
            if out.returncode != 0:
                log(out.stderr[-4000:])
                raise RuntimeError(f"pipeline subprocess local[{cpus}] failed")
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
            log(f"  local[{cpus}] best-of-{repeats}: {results[cpus]['wall_sec']}s "
                f"({results[cpus]['turns_per_sec']} turns/s) "
                f"reps={results[cpus].get('rep_walls')}")

        for cpus, p in procs.items():
            stdout, stderr = p.communicate()
            if p.returncode != 0:
                log(stderr[-4000:])
                raise RuntimeError(f"pipeline subprocess local[{cpus}] failed")
            results[cpus] = json.loads(stdout.strip().splitlines()[-1])
            log(f"  local[{cpus}] best-of-{repeats} (concurrent): "
                f"{results[cpus]['wall_sec']}s "
                f"({results[cpus]['turns_per_sec']} turns/s) "
                f"reps={results[cpus].get('rep_walls')}")

        _emit_scaling_report(
            levels, results, n_turns,
            mode="concurrent-disjoint-cores" if concurrent else "sequential",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _emit_scaling_report(
    levels: tuple[int, int],
    results: dict[int, dict],
    n_turns: int,
    mode: str,
    cycles: list[dict] | None = None,
) -> None:
    lo, hi = levels
    eff = (results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]) / (hi / lo)
    report = {
        "metric": "kg_pipeline_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"efficiency local[{lo}]->local[{hi}]",
        "mode": mode,
        "n_turns": n_turns,
        "levels": {str(c): results[c] for c in levels},
        "criterion": ">=0.8 (BASELINE.json north_rule)",
        "pass": eff >= 0.8,
    }
    if cycles is not None:
        report["cycles"] = cycles
    print(json.dumps(report))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--concurrent", action="store_true",
                    help="run both scaling legs at once on disjoint pinned "
                         "cores (same host window by construction)")
    ap.add_argument("--interleaved", action="store_true",
                    help="alternate warm reps between the two pinned legs "
                         "(each runs ALONE, adjacent in time: window drift "
                         "cancels without cross-leg interference)")
    ap.add_argument("--coordinate", action="store_true", help="internal")
    ap.add_argument("--levels", type=str, default="2,8",
                    help="comma-separated core counts N,4N for --scaling")
    ap.add_argument("--conversations", type=int, default=100_000)
    ap.add_argument("--pipeline-run", action="store_true", help="internal")
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--input", type=str)
    ap.add_argument("--workdir", type=str)
    args = ap.parse_args()

    if args.pipeline_run:
        pipeline_worker(
            args.cpus, args.input, args.workdir,
            reps=args.reps, coordinate=args.coordinate,
        )
    elif args.scaling:
        lo, hi = (int(x) for x in args.levels.split(","))
        bench_scaling(
            args.conversations, levels=(lo, hi), concurrent=args.concurrent,
            interleaved=args.interleaved,
        )
    else:
        bench_default()


if __name__ == "__main__":
    main()
