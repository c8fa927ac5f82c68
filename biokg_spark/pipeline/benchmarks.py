"""Derived benchmark edge sets — the reference's stage 3 (SURVEY.md §3.4).

``build_benchmarks.py`` derives five ML benchmark files from the compiled
graph: DDI subsets whose side-effect qualifier contains mineral/efficacy
terms (reference: build_benchmarks.py:40-66), FDA-approved DPI via
semi-join (:73-91), drug→protein expression-direction edges with
conflict exclusion (:94-106), and a human-human phosphorylation set
(:112-151). Here the same derivations run over the pipeline's output
tables — each is a filter/semi-join/dedup over the emitted families,
exactly the reference's posture of "benchmarks are queries over stage-2
outputs".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biokg_spark.operators.edges import canonical_undirected

# reference build_benchmarks.py:48-49
MINERAL_EFFECTS = ("calcemia", "glycemia", "kalemia", "atremia")
EFFICACY_EFFECTS = ("efficacy",)


def ddi_by_effect(quads: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """DDI subset whose side-effect qualifier contains one of ``terms``,
    re-canonicalized with the GREATER id first — the reference's quirk
    (build_benchmarks.py:58-61: ``(d1, effect, d2) if d1 > d2 else (d2,
    effect, d1)``)."""
    cond = F.col("qual").contains(terms[0])
    for t in terms[1:]:
        cond = cond | F.col("qual").contains(t)
    hit = quads.where(cond)
    return hit.select(
        F.greatest("subj", "obj").alias("subj"),
        F.col("qual").alias("pred"),
        F.least("subj", "obj").alias("obj"),
    ).dropDuplicates()


def approved_dpi(links: DataFrame, approved_drugs: DataFrame) -> DataFrame:
    """DPI links restricted to the approved-drug universe via broadcast
    semi-join (reference: build_benchmarks.py:79-91 keeps FDA ``approved``
    drugs and emits (drug, 'DPI', protein))."""
    return (
        links.where(F.col("pred") == "DPI")
        .join(
            F.broadcast(approved_drugs.select(F.col("drug_id").alias("subj"))),
            "subj",
            "left_semi",
        )
        .select("subj", "pred", "obj")
        .dropDuplicates()
    )


def expression_direction(
    action_quads: DataFrame, approved_drugs: DataFrame
) -> DataFrame:
    """inc_expr/dec_expr drug→protein edges with conflict exclusion: a
    (drug, protein) pair carrying BOTH directions is dropped entirely,
    then the result is restricted to approved drugs (reference:
    build_benchmarks.py:94-106 set-intersection exclusion)."""
    directional = action_quads.where(
        F.col("action").isin("increases_expression", "decreases_expression")
    ).select("subj", "obj", "action").dropDuplicates()
    per_pair = directional.groupBy("subj", "obj").agg(
        F.collect_set("action").alias("dirs")
    )
    consistent = per_pair.where(F.size("dirs") == 1).select(
        "subj",
        F.when(
            F.element_at("dirs", 1) == "increases_expression", "inc_expr"
        ).otherwise("dec_expr").alias("pred"),
        "obj",
    )
    return consistent.join(
        F.broadcast(approved_drugs.select(F.col("drug_id").alias("subj"))),
        "subj",
        "left_semi",
    )


def phosphorylation_benchmark(phos_quads: DataFrame) -> DataFrame:
    """Human-human kinase→substrate set (reference:
    build_benchmarks.py:112-151 keeps pairs where both accessions are
    HUMAN and emits (kin, 'phosphorylates', sub, site))."""
    return (
        phos_quads.where(
            (F.col("kin_organism") == "human") & (F.col("sub_organism") == "human")
        )
        .select("subj", F.lit("phosphorylates").alias("pred"), "obj", "site")
        .dropDuplicates()
    )


def undirected_benchmark(links: DataFrame, pred: str) -> DataFrame:
    """Canonical undirected edge set for one predicate (reference:
    build_benchmarks.py:58-60 re-canonicalizes before emitting)."""
    return canonical_undirected(
        links.where(F.col("pred") == pred).select("subj", "obj")
    ).select("subj", F.lit(pred).alias("pred"), "obj")


def derive_benchmarks(
    outputs: dict[str, DataFrame], approved_drugs: DataFrame
) -> dict[str, DataFrame]:
    """All benchmark extractions, mirroring build_benchmarks.main
    (reference: build_benchmarks.py:154-162)."""
    return {
        "ddi_minerals": ddi_by_effect(outputs["quads"], MINERAL_EFFECTS),
        "ddi_efficacy": ddi_by_effect(outputs["quads"], EFFICACY_EFFECTS),
        "dpi_fda": approved_dpi(outputs["links"], approved_drugs),
        "dep_fda_exp": expression_direction(outputs["action_quads"], approved_drugs),
        "phosphorylation": phosphorylation_benchmark(outputs["phos_quads"]),
        "ppi_benchmark": undirected_benchmark(outputs["links"], "PPI"),
    }
