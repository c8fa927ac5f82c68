"""Structured Streaming ingestion of transcript turns.

The reference is strictly batch (SURVEY.md §2.10) and the north rule is a
batch pipeline, so streaming is a thin incremental-ingest layer, not a
core path: a file-source stream of transcript turns feeding the same
mention logic, with watermarked windowed counts for late turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_mention_counts(
    turns_stream: DataFrame,
    surface_literals: list[str],
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed per-entity mention counts over a streaming turn source.

    Uses a pure-column containment test (no UDF) so the streaming plan
    stays stateless until the windowed aggregate; late data beyond the
    watermark is dropped by the state store.
    """
    surf_arr = F.array(*[F.lit(s) for s in surface_literals])
    toks = F.split(F.lower(F.col("text")), "\\s+")
    hits = turns_stream.select(
        "ts",
        F.explode(
            F.filter(toks, lambda t: F.array_contains(surf_arr, t))
        ).alias("surface"),
    )
    return (
        hits.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "surface")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("win.start", "win.end", "surface", "n_mentions")
    )
