#!/usr/bin/env python
"""Cluster entrypoint for the KG-construction pipeline.

Ship and run (north rule: ``spark-submit --py-files``):

    python scripts/package_pyfiles.py              # -> dist/biokg_spark.zip
    spark-submit \
        --py-files dist/biokg_spark.zip \
        jobs/kg_pipeline_job.py \
        --input  <transcripts table path/URI> \
        --workdir <checkpoint root> \
        [--lexicon <path>] [--id-mapping <path>] [--ontology <path>] \
        [--buckets 512] [--synth-conversations N]

No ``--master`` is set here — the cluster manager decides (session.py
leaves master unset when ``SPARK_GRAFT_MASTER``/local fallback is not
wanted; under spark-submit the submit-time config wins). The job is
idempotent: re-submitting with the same input fingerprint resumes from
the last valid checkpoint stage and re-emits metrics.

Input contract (BASELINE.json input_hint): transcripts table with
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). Dimension tables default to the deterministic synthetic
dims when paths are not given (sandbox mode).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts table (parquet/Iceberg path)")
    ap.add_argument("--workdir", required=True, help="checkpoint root")
    ap.add_argument("--lexicon", help="entity lexicon table path")
    ap.add_argument("--id-mapping", dest="id_mapping", help="id mapping table path")
    ap.add_argument("--ontology", help="ontology table path")
    ap.add_argument("--buckets", type=int, default=None,
                    help="hash(conv_id) bucket count (default: cluster parallelism)")
    ap.add_argument("--synth-conversations", type=int, default=None,
                    help="generate a deterministic synthetic input instead of --input")
    ap.add_argument("--run-key", default="default")
    args = ap.parse_args()

    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    from biokg_spark.datagen import transcripts as synth_transcripts
    from biokg_spark.datagen import entity_lexicon, id_mapping, ontology
    from biokg_spark.pipeline import KGPipeline
    from biokg_spark.session import get_spark

    # under spark-submit the submit-time conf carries the master — honor
    # it untouched; bare `python jobs/...` (sandbox) falls back to the
    # engine's local session factory
    if SparkConf().get("spark.master", None):
        spark = SparkSession.builder.appName("biokg-kg-pipeline").getOrCreate()
    else:
        spark = get_spark(app_name="biokg-kg-pipeline")

    if args.synth_conversations:
        tx = synth_transcripts(spark, n_conversations=args.synth_conversations)
    elif args.input:
        tx = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synth-conversations is required")

    lex = (
        spark.read.parquet(args.lexicon) if args.lexicon else entity_lexicon(spark)
    )
    idm = (
        spark.read.parquet(args.id_mapping)
        if args.id_mapping
        else id_mapping(spark)
    )
    onto = spark.read.parquet(args.ontology) if args.ontology else ontology(spark)

    buckets = args.buckets or spark.sparkContext.defaultParallelism
    pipe = KGPipeline(
        spark, args.workdir, lexicon=lex, id_mapping=idm, ontology=onto,
        buckets=buckets,
    )
    pipe.run(tx, run_key=args.run_key)
    json.dump({"stages": pipe.metrics()}, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
