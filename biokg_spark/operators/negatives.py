"""Filtered negative sampling for link-prediction training sets.

The reference's end product is a KG-embedding benchmark: it materializes
train/test triple files for link-prediction trainers (reference:
build_benchmarks.py:23-160 writes the per-predicate benchmark TSVs).
Every such trainer's data loader then corrupts positives into negatives
under the standard *filtered* protocol — replace the head or tail entity
and drop any corruption that is itself a true triple — a step the
reference leaves to the downstream consumer. At 10^12-turn scale that
step belongs in the engine: negatives outnumber positives k:1 and
re-deriving them per-trainer means re-shuffling the full triple table
each time.

This operator produces them as a deterministic DataFrame composition —
no RNG, no UDF: the corruption index is md5-derived (the same
hex-arithmetic idiom as functions/text.py's split_assign), so output is
bit-stable across runs, partitionings and engines, and the DuckDB twin
in queries.py reproduces it exactly.

Scale shape (100 TB):

- **universe** — one distinct + dense-rank pass per predicate over the
  corrupted column: a dim-sized table (entities, not triples). The
  ``row_number`` window partitions by predicate; a single predicate's
  entity set is the unit of skew and is bounded by the entity
  vocabulary, not the triple count.
- **candidates** — positives × k expanded ARRAY-SIDE
  (``explode(sequence(...))``): no shuffle, k is a literal.
- **index→entity resolution** — equi-join on (pred, idx) against the
  universe dim: broadcastable for real-world entity vocabularies
  (10^6-10^8 rows); falls back to a hash join AQE can re-plan when not.
- **filter** — one left_anti join against the positives on the full
  corrupted key: the same shuffle a dedup would pay; no driver-side set
  materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def negative_samples(
    links: DataFrame,
    k: int = 3,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    corrupt: str = "obj",
) -> DataFrame:
    """Up to ``k`` filtered corruption negatives per positive triple.

    For positive (s, p, o) and corruption slot ``neg_ix`` in [0, k):
    the candidate entity is ``universe_p[h % n_p]`` where ``universe_p``
    is the sorted distinct entity list seen under predicate p in the
    corrupted position, n_p its size, and h the integer value of the
    first 8 hex chars of ``md5('s|p|o|neg_ix')`` (the hash key is the
    POSITIVE, so head- and tail-corruption of the same positive draw
    the same index into their respective universes). Candidates that
    collide with ANY true triple are dropped (filtered protocol), so a
    positive can yield fewer than k rows — including zero when n_p is
    tiny. Self-corruptions (candidate equals the entity kept on the
    other side) are also dropped: the link vocabularies here relate
    DISTINCT entities, so (s, p, s) is degenerate, not a hard negative.

    ``corrupt`` selects the protocol side:

    - ``"obj"`` (default) — tail corruption; returns
      (subj, pred, neg_obj, neg_ix).
    - ``"subj"`` — head corruption; returns
      (neg_subj, pred, obj, neg_ix).
    - ``"both"`` — union of the two in positive-triple layout:
      (subj, pred, obj, corrupted, neg_ix) where the column named by
      ``corrupted`` ('subj' | 'obj') carries the candidate.
    """
    if corrupt == "both":
        args = dict(k=k, subj_col=subj_col, pred_col=pred_col, obj_col=obj_col)
        tails = negative_samples(links, corrupt="obj", **args)
        heads = negative_samples(links, corrupt="subj", **args)
        return tails.select(
            subj_col,
            pred_col,
            F.col("neg_obj").alias(obj_col),
            F.lit("obj").alias("corrupted"),
            "neg_ix",
        ).unionByName(
            heads.select(
                F.col("neg_subj").alias(subj_col),
                pred_col,
                obj_col,
                F.lit("subj").alias("corrupted"),
                "neg_ix",
            )
        )
    if corrupt not in ("subj", "obj"):
        raise ValueError(f"corrupt must be 'subj', 'obj' or 'both': {corrupt!r}")

    corr_col = obj_col if corrupt == "obj" else subj_col
    keep_col = subj_col if corrupt == "obj" else obj_col
    out_col = "neg_obj" if corrupt == "obj" else "neg_subj"

    pred = F.col(pred_col)
    universe = (
        links.select(pred_col, corr_col)
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy(pred_col).orderBy(corr_col))
            - F.lit(1),
        )
    )
    counts = universe.groupBy(pred_col).agg(F.count(F.lit(1)).alias("n_ent"))

    # hash key is always the positive in (s, p, o, slot) order: stable
    # under corruption side, engine-portable (see the DuckDB twin)
    key = F.concat_ws(
        "|", F.col(subj_col), pred, F.col(obj_col), F.col("neg_ix")
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    candidates = (
        links.join(F.broadcast(counts), pred_col)  # one row per predicate
        .withColumn("neg_ix", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("idx", (h % F.col("n_ent")).cast("int"))
    )
    resolved = (
        candidates.join(
            universe.withColumnRenamed(corr_col, out_col), [pred_col, "idx"]
        )
        .where(F.col(out_col) != F.col(keep_col))
        .select(keep_col, pred_col, out_col, "neg_ix")
    )
    true_triples = links.select(
        F.col(keep_col), pred, F.col(corr_col).alias(out_col)
    )
    out = resolved.join(
        true_triples, [keep_col, pred_col, out_col], "left_anti"
    )
    cols = (
        [subj_col, pred_col, out_col]
        if corrupt == "obj"
        else [out_col, pred_col, obj_col]
    )
    return out.select(*cols, "neg_ix")
