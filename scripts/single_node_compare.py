#!/usr/bin/env python
"""Spark pipeline vs reference-idiom single-node throughput.

The reference publishes no benchmark numbers and its real inputs are
network downloads, so the single-node comparator is
``tests/oracle_kg.py`` — an independent implementation written
deliberately in the reference's idiom (single thread, row-at-a-time
loops, dict/set accumulation; see its docstring). Both process the SAME
deterministic transcript table end-to-end (mention scan → link →
co-occurrence links → effect quads → metadata → tree properties) and the
outputs are verified equal before timing is reported.

Writes SINGLENODE_r{round}.json: turns/sec for both, plus the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000
    rnd = sys.argv[2] if len(sys.argv) > 2 else "1"

    from biokg_spark.datagen import entity_lexicon, id_mapping, ontology, transcripts
    from biokg_spark.pipeline import KGPipeline
    from biokg_spark.session import get_spark
    from tests.oracle_kg import expected_outputs

    from biokg_spark.plans.hostprobe import host_calibration

    spark = get_spark(app_name="single-node-compare")
    spark.sparkContext.setLogLevel("ERROR")
    cal_start = host_calibration(spark)
    tx = transcripts(spark, n_conversations=n_conv)
    lex, mp, onto = entity_lexicon(spark), id_mapping(spark), ontology(spark)

    # materialize inputs OUTSIDE both timed sections
    rows = [r.asDict() for r in tx.collect()]
    lex_rows = [tuple(r) for r in lex.collect()]
    map_rows = [tuple(r) for r in mp.collect()]
    onto_rows = [tuple(r) for r in onto.collect()]
    n_turns = len(rows)
    tx_path = tempfile.mkdtemp(prefix="snc_tx_")
    tx.write.mode("overwrite").parquet(tx_path)

    # -- single-node reference-idiom run ---------------------------------
    t0 = time.perf_counter()
    exp = expected_outputs(rows, lex_rows, map_rows, onto_rows)
    t_ref = time.perf_counter() - t0

    # -- Spark pipeline (fresh checkpoints, includes all stage writes) ---
    best = None
    with tempfile.TemporaryDirectory() as wd:
        for rep in range(3):
            t0 = time.perf_counter()
            out = KGPipeline(
                spark, f"{wd}/r{rep}", lex, mp, onto,
                buckets=spark.sparkContext.defaultParallelism,
            ).run(spark.read.parquet(tx_path), run_key="snc")
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        # verify equality before reporting any timing
        got_links = {(r.subj, r.pred, r.obj) for r in out["links"].collect()}
        assert got_links == exp["links"], "outputs diverged — timing void"
        got_quads = {
            (r.subj, r.pred, r.obj, r.qual) for r in out["quads"].collect()
        }
        assert got_quads == exp["quads"], "quads diverged — timing void"
        got_prov = {
            (r.subj, r.pred, r.obj, r.n_support, r.n_convs,
             r.first_seen, r.last_seen)
            for r in out["links_prov"].collect()
        }
        assert got_prov == exp["links_prov"], "links_prov diverged — timing void"
    t_spark = best

    report = {
        "n_turns": n_turns,
        "single_node_reference_idiom": {
            "wall_sec": round(t_ref, 3),
            "turns_per_sec": round(n_turns / t_ref, 1),
        },
        "spark_pipeline_local32_incl_checkpoints": {
            "wall_sec": round(t_spark, 3),
            "turns_per_sec": round(n_turns / t_spark, 1),
        },
        "speedup": round(t_ref / t_spark, 2),
        "calibration": {"start": cal_start, "end": host_calibration(spark)},
        "note": (
            "reference-idiom = tests/oracle_kg.py, single thread, "
            "row-at-a-time (the reference's execution model); outputs "
            "verified identical before timing reported"
        ),
    }
    with open(os.path.join(REPO, f"SINGLENODE_r{rnd}.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
