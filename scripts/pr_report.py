#!/usr/bin/env python
"""Triple-set precision/recall report vs the reference-faithful oracle.

The north rule requires emitted (subj, pred, obj) triples to match the
reference's at P/R ≥ 0.95. The reference itself cannot run here (its
inputs are network downloads), so the ground truth is
``tests/oracle_kg.py`` — an independent row-at-a-time Python
implementation written in the reference's idiom (dict/set accumulation,
ordered regex cascade, same conflict rules). This script runs the full
Spark pipeline and the oracle on the same deterministic input and writes
``PR_r{round}.json`` with set precision/recall per output family.

Usage: python scripts/pr_report.py [n_conversations] [round]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    rnd = sys.argv[2] if len(sys.argv) > 2 else "1"

    from biokg_spark.datagen import entity_lexicon, id_mapping, ontology, transcripts
    from biokg_spark.pipeline import KGPipeline
    from biokg_spark.session import get_spark
    from tests.oracle_kg import expected_outputs, precision_recall

    spark = get_spark(app_name="pr-report", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tx = transcripts(spark, n_conversations=n_conv).cache()
    lex, mp, onto = entity_lexicon(spark), id_mapping(spark), ontology(spark)

    with tempfile.TemporaryDirectory() as wd:
        pipe = KGPipeline(spark, wd, lex, mp, onto, buckets=8)
        out = pipe.run(tx, run_key="pr")
        got = {
            "ppi_by_species": {
                (r.subj, r.pred, r.obj, r.species_bucket)
                for r in pipe.ppi_species_buckets(out["links"]).collect()
            },
            "links": {(r.subj, r.pred, r.obj) for r in out["links"].collect()},
            "links_prov": {
                (r.subj, r.pred, r.obj, r.n_support, r.n_convs,
                 r.first_seen, r.last_seen)
                for r in out["links_prov"].collect()
            },
            "quads": {(r.subj, r.pred, r.obj, r.qual) for r in out["quads"].collect()},
            "action_quads": {
                (r.subj, r.pred, r.obj, r.action, r.refs)
                for r in out["action_quads"].collect()
            },
            "expr_quads": {
                (r.subj, r.pred, r.obj, r.level)
                for r in out["expr_quads"].collect()
            },
            "phos_quads": {
                (r.subj, r.pred, r.obj, r.site, r.kin_organism, r.sub_organism)
                for r in out["phos_quads"].collect()
            },
            "metadata": {
                (r.subj, r.pred, r.obj) for r in out["metadata"].collect()
            },
            "properties": {
                (r.subj, r.pred, r.obj) for r in out["properties"].collect()
            },
        }

    exp = expected_outputs(
        [r.asDict() for r in tx.collect()],
        [tuple(r) for r in lex.collect()],
        [tuple(r) for r in mp.collect()],
        [tuple(r) for r in onto.collect()],
    )
    report = {"n_conversations": n_conv, "criterion": "P/R >= 0.95", "families": {}}
    worst = 1.0
    for fam, got_set in got.items():
        p, r = precision_recall(got_set, exp[fam])
        report["families"][fam] = {
            "precision": round(p, 6),
            "recall": round(r, 6),
            "n_spark": len(got_set),
            "n_oracle": len(exp[fam]),
        }
        worst = min(worst, p, r)
    report["min_pr"] = round(worst, 6)
    report["pass"] = worst >= 0.95
    path = os.path.join(REPO, f"PR_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
