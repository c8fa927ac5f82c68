"""Output profiling summaries — the reference's summarizers re-expressed.

``summarize_preprocessed.py:17-52`` prints per-file group-by-type counts
and ``summarize_benchmarks.py:6-26`` prints nb_ents / nb_rels /
nb_triplets / nb_pairs per benchmark file. Same numbers here as DataFrame
aggregates over the emitted tables — one job per family, all map-side
partial aggregation (A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize_edges(df: DataFrame) -> dict:
    """Benchmark-style cardinalities for one edge table
    (reference: summarize_benchmarks.py:6-26).

    nb_ents is a distinct count over the UNION of endpoints — a proper
    distributed aggregate, never a collected set (a single collect_set of
    all entities would funnel the whole vocabulary through one buffer)."""
    row = df.select(
        F.count(F.lit(1)).alias("nb_triplets"),
        F.countDistinct("pred").alias("nb_rels"),
        F.countDistinct(F.struct("subj", "obj")).alias("nb_pairs"),
    ).first()
    nb_ents = (
        df.select(F.col("subj").alias("e"))
        .unionByName(df.select(F.col("obj").alias("e")))
        .distinct()
        .count()
    )
    return {
        "nb_ents": nb_ents,
        "nb_rels": row["nb_rels"],
        "nb_triplets": row["nb_triplets"],
        "nb_pairs": row["nb_pairs"],
    }


def per_predicate_counts(df: DataFrame) -> DataFrame:
    """Per-predicate row counts (reference: summarize_file group-by-type,
    summarize_preprocessed.py:17-52)."""
    return df.groupBy("pred").agg(F.count(F.lit(1)).alias("n")).orderBy("pred")


def summarize_families(outputs: dict[str, DataFrame]) -> dict[str, dict]:
    """Cardinality summary per emitted family (links/quads/metadata/...)."""
    return {
        name: summarize_edges(df.select("subj", "pred", "obj"))
        for name, df in outputs.items()
        if {"subj", "pred", "obj"} <= set(df.columns)
    }
