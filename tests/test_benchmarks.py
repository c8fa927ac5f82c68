import pytest
from pyspark.sql import functions as F

from biokg_spark.pipeline.benchmarks import (
    approved_dpi,
    ddi_by_effect,
    derive_benchmarks,
    expression_direction,
    undirected_benchmark,
)

QUADS = [
    # subj, pred, obj, qual, status, refs
    ("DB1", "DPI_EFFECT", "P1", "INCREASES", "CURATED", ["c0#1"]),
    ("DB1", "DPI_EFFECT", "P2", "DECREASES", "CURATED", ["c0#2"]),
    ("DB2", "DPI_EFFECT", "P1", "AFFECTS", "CURATED", ["c1#0"]),
    ("DB2", "DPI_EFFECT", "P1", "INCREASES", "CURATED", ["c1#3"]),
]
LINKS = [
    ("A", "PPI", "B"),
    ("A", "PPI", "C"),
    ("DB1", "DDI", "DB2"),
    ("DB1", "DPI", "P1"),
]


@pytest.fixture()
def quads(spark):
    return spark.createDataFrame(
        QUADS, "subj string, pred string, obj string, qual string, status string, refs array<string>"
    )


@pytest.fixture()
def links(spark):
    return spark.createDataFrame(LINKS, "subj string, pred string, obj string")


def test_ddi_by_effect(spark, quads):
    got = {(r.subj, r.obj) for r in ddi_by_effect(quads, "INCREASES").collect()}
    assert got == {("DB1", "P1"), ("DB2", "P1")}


def test_approved_dpi(spark, quads):
    approved = spark.createDataFrame([("DB2",)], "drug_id string")
    got = {(r.subj, r.obj) for r in approved_dpi(quads, approved).collect()}
    assert got == {("DB2", "P1")}


def test_expression_direction(spark, quads):
    got = {(r.subj, r.pred, r.obj) for r in expression_direction(quads).collect()}
    assert got == {
        ("DB1", "INCREASES_EXPRESSION", "P1"),
        ("DB1", "DECREASES_EXPRESSION", "P2"),
        ("DB2", "INCREASES_EXPRESSION", "P1"),
    }


def test_expression_direction_conflict_raises(spark):
    bad = spark.createDataFrame(
        [
            ("DB1", "DPI_EFFECT", "P1", "INCREASES", "CURATED", ["r1"]),
            ("DB1", "DPI_EFFECT", "P1", "DECREASES", "CURATED", ["r2"]),
        ],
        "subj string, pred string, obj string, qual string, status string, refs array<string>",
    )
    with pytest.raises(ValueError, match="conflicting"):
        expression_direction(bad)


def test_undirected_and_derive_all(spark, links, quads):
    ppi = undirected_benchmark(links, "PPI")
    assert {(r.subj, r.obj) for r in ppi.collect()} == {("A", "B"), ("A", "C")}
    approved = spark.createDataFrame([("DB1",), ("DB2",)], "drug_id string")
    out = derive_benchmarks(links, quads, approved)
    assert set(out) == {
        "ddi_increases", "dpi_approved", "expression_direction",
        "ppi_benchmark", "ddi_benchmark",
    }
    assert out["ddi_benchmark"].count() == 1


def test_pipeline_benchmarks_and_core_export(spark, tmp_path):
    """Full lifecycle parity: run -> derive benchmarks -> export core
    (reference: run_all.py:6-14 four-stage sequence)."""
    from pyspark.sql import functions as F

    from biokg_spark.datagen import entity_lexicon, id_mapping, ontology, transcripts
    from biokg_spark.pipeline import KGPipeline

    pipe = KGPipeline(
        spark, str(tmp_path / "wd"), entity_lexicon(spark),
        id_mapping(spark), ontology(spark),
    )
    out = pipe.run(transcripts(spark, n_conversations=60), run_key="t")
    approved = entity_lexicon(spark).where(
        "entity_type = 'DRUG' AND priority = 0"
    ).select(F.col("entity_id").alias("drug_id"))
    bench = pipe.derive_benchmarks_stage(out, approved, run_key="t")
    assert set(bench) == {
        "ddi_increases", "dpi_approved", "expression_direction",
        "ppi_benchmark", "ddi_benchmark",
    }
    assert bench["ppi_benchmark"].count() > 0
    # benchmarks are checkpointed: rerun skips
    bench2 = pipe.derive_benchmarks_stage(out, approved, run_key="t")
    assert all(
        pipe.metrics()["bench_" + n]["skipped"] for n in bench2
    )
    # core export round-trips through TSV
    pipe.export_core(out, str(tmp_path / "core"))
    links_back = spark.read.csv(
        str(tmp_path / "core" / "links"), sep="\t",
        schema="subj string, pred string, obj string",
    )
    assert links_back.count() == out["links"].count() + out["metadata"].count()
    quads_back = spark.read.csv(
        str(tmp_path / "core" / "quads"), sep="\t",
        schema="subj string, pred string, obj string, qual string, status string, refs string",
    )
    assert quads_back.where("refs LIKE '%#%'").count() == quads_back.count()
