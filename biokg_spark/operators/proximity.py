"""Proximity pairs: entity co-occurrence within a turn window.

The pipeline's links stage pairs entities mentioned in the SAME turn
(pipeline/kg.py::cooccurrence_links — the Spark form of the reference's
per-record pairing). Conversational evidence is wider than one turn: a
drug named in turn 7 and the condition in turn 9 are still one
assertion. This operator extracts those cross-turn pairs with a bounded
turn-distance window — the context-window generalization of the links
derivation.

Scale discipline: a naive self-join on conv_id alone fans out
quadratically in the per-conversation mention count (a 10^4-mention
conversation would yield 10^8 candidates). Instead each left mention
becomes the interval [turn−w, turn+w] and the pair candidates come from
the binned range join (operators/temporal.py::range_join_binned): an
equi-join on (conv_id, bin) with a residual BETWEEN — replication is
bounded by ceil((2w+1)/bin_width)+1 bins per mention (~3× at the
default), each unordered pair meets exactly once (points land in one
bin), and a hub conversation costs its share of an equi-join, never a
cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biokg_spark.operators.temporal import range_join_binned


def proximity_pairs(
    ents: DataFrame,
    window: int = 2,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    eid_col: str = "eid",
) -> DataFrame:
    """Entity pairs co-mentioned within ``window`` turns of the same
    conversation.

    ``ents``: one row per mention occurrence (conv, turn, entity id);
    duplicate occurrences are deduplicated first (one mention per
    (conv, turn, entity)). Returns (e1, e2, n_cooc, n_convs) with
    e1 < e2: n_cooc = co-occurring mention-instance pairs across the
    corpus, n_convs = conversations containing at least one such pair.
    Same-entity pairs are excluded.
    """
    m = (
        ents.select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("long").alias("t"),
            F.col(eid_col).alias("eid"),
        )
        .dropDuplicates()
    )
    intervals = m.select(
        "conv_id",
        F.col("eid").alias("e1"),
        (F.col("t") - window).alias("lo"),
        (F.col("t") + window).alias("hi"),
    )
    points = m.select(
        "conv_id", F.col("eid").alias("e2"), F.col("t").alias("pt")
    )
    cand = range_join_binned(
        points,
        intervals,
        point_col="pt",
        lo_col="lo",
        hi_col="hi",
        bin_width=max(1, window),
        keys=["conv_id"],
    )
    # e1 < e2 keeps each unordered pair once (and drops same-entity pairs)
    return (
        cand.where(F.col("e1") < F.col("e2"))
        .groupBy("e1", "e2")
        .agg(
            F.count(F.lit(1)).alias("n_cooc"),
            F.count_distinct("conv_id").alias("n_convs"),
        )
    )
