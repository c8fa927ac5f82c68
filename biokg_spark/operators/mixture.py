"""Data-mixture upsampling: temperature-style source reweighting.

A pretraining corpus is rarely trained at its natural source
proportions: small, high-quality sources (reference text, books, code
docs) are repeated for several epochs while the dominant crawl slice
runs at or under one epoch (the mixture tables of GPT-3 §2.2 and
LLaMA §2; The Pile weights its 22 components the same way). The
standard scheme samples source ``s`` with probability proportional to
``p_s ** alpha`` with ``alpha < 1`` flattening the natural
distribution.

This operator materializes that as deterministic per-document epoch
replication at ``alpha = 1/2``: the per-source repeat factor is

    e_s = min(scale * sqrt(C / c_s), max_epochs)

with ``c_s`` the source's total weight (chars/tokens), ``C`` the corpus
total — i.e. ``e_s`` is proportional to ``p_s ** (-1/2)``, the alpha=1/2
temperature weight expressed as epochs relative to one natural pass.
``scale < 1`` pushes the dominant source below one epoch (a crawl
downsample); ``max_epochs`` caps how often a tiny source may repeat.
Every document in source ``s`` is emitted ``floor(e_s)`` times, plus
one extra copy kept iff an md5 threshold on ``(doc_id, copy)`` falls
under ``frac(e_s)`` — no RNG, so the SAME physical copies materialize
on every run, engine, and partitioning (the determinism contract of
``functions/text.py::split_assign`` / ``stratified_keep``).

Engine-exactness: the factor math uses ONLY IEEE-754 correctly-rounded
operations (integer sum, /, sqrt, *, -, floor) on exact integer inputs,
so the JVM and DuckDB produce bit-identical doubles and the oracle
compares exactly. ``pow()`` is NOT correctly rounded by either engine,
which is why alpha is fixed at 1/2 (sqrt IS correctly rounded per
IEEE 754 §5.4.1) rather than a free parameter.

Scale shape (100 TB): one map-side-combinable groupBy over the source
key (a handful of groups -> partial+final HashAggregate), a window-sum
over that tiny factor dim for the corpus total (single-partition on
~10 rows, never on the corpus), a broadcast equi-join of the factor dim
back onto the corpus, and a per-row sequence-explode bounded by
``max_epochs`` — the corpus itself is never shuffled and no driver
loop or collect is involved.

Reference: n/a — training-data-pipeline mandate (mixture weighting);
cf. GPT-3 / LLaMA / The Pile mixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPAN = 4294967296.0  # 2**32: span of the 8-hex-char md5 prefix


def mixture_epoch_factors(
    docs: DataFrame,
    source_col: str = "source",
    weight_col: str = "n_chars",
    max_epochs: float = 4.0,
    scale: float = 1.0,
) -> DataFrame:
    """Per-source epoch factors e_s = min(scale*sqrt(C/c_s), max_epochs).

    Returns one row per source: (source_col, c_s, c_total,
    epoch_factor). The window-sum for the corpus total runs over the
    already-aggregated per-source rows (a handful), not the corpus.
    """
    counts = docs.groupBy(source_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("c_s")
    )
    total = F.sum("c_s").over(Window.partitionBy())
    e = F.least(
        F.lit(float(scale))
        * F.sqrt(F.col("c_total").cast("double") / F.col("c_s").cast("double")),
        F.lit(float(max_epochs)),
    )
    return counts.withColumn("c_total", total).withColumn("epoch_factor", e)


def upsample_mixture(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    weight_col: str = "n_chars",
    max_epochs: float = 4.0,
    scale: float = 1.0,
) -> DataFrame:
    """Materialize the mixture as replicated (id, source, copy) rows.

    copy = 0..floor(e_s)-1 are unconditional; copy = floor(e_s) is kept
    iff the md5 threshold on (id, copy) falls under frac(e_s), so the
    expected copy count per doc is exactly e_s. ``epoch_bp`` reports the
    factor as integer basis points (floor(e*10000)) to keep the output
    hash-comparable without float formatting.
    """
    per = mixture_epoch_factors(
        docs, source_col, weight_col, max_epochs=max_epochs, scale=scale
    ).select(
        source_col,
        "epoch_factor",
        F.floor("epoch_factor").cast("int").alias("n_full"),
        (F.col("epoch_factor") - F.floor("epoch_factor")).alias("frac"),
    )
    keep_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("#"),
                    F.col("copy").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(per), source_col)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("n_full"))))
        .where(
            (F.col("copy") < F.col("n_full"))
            | (keep_hash < F.col("frac") * F.lit(_HASH_SPAN))
        )
        .select(
            id_col,
            source_col,
            "copy",
            F.floor(F.col("epoch_factor") * 10000).cast("int").alias("epoch_bp"),
        )
    )
