"""Edge-algebra operators: canonicalization, conflict handling, ref union.

These are the reference's set-based link builders re-expressed as
declarative DataFrame ops (SURVEY.md §2.5):
- undirected canonical form ``(min, max)`` (reference:
  compile_biokg.py:192-195, build_benchmarks.py:58-60);
- conflicting INCREASES/DECREASES pairs dropped (reference:
  parsers.py:1989-1990, build_benchmarks.py:101-105);
- duplicate edges across sources merged with unioned reference lists
  (reference: parsers.py:2825-2857).

All are pure built-in compositions — Catalyst plans them as partial+final
hash aggregates with map-side combine, which is exactly the shuffle
discipline wanted at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def canonical_undirected(
    df: DataFrame, s: str = "subj", o: str = "obj", dedup: bool = True
) -> DataFrame:
    """Order endpoints (least, greatest) so A-B == B-A, then dedup."""
    out = df.withColumns(
        {s: F.least(F.col(s), F.col(o)), o: F.greatest(F.col(s), F.col(o))}
    )
    return out.dropDuplicates() if dedup else out


def conflict_exclusion(
    df: DataFrame,
    keys: list[str],
    effect_col: str,
    increases: Column | str = "INCREASES",
    decreases: Column | str = "DECREASES",
) -> DataFrame:
    """Keep (keys) groups carrying exactly one of {INCREASES, DECREASES}.

    Returns one row per surviving group with the winning ``effect``.
    Groups seen with both directions are inconsistent and dropped
    (reference: build_benchmarks.py:101-105).
    """
    inc = increases if isinstance(increases, Column) else F.lit(increases)
    dec = decreases if isinstance(decreases, Column) else F.lit(decreases)
    agg = df.groupBy(*keys).agg(
        F.max(F.when(F.col(effect_col) == inc, 1).otherwise(0)).alias("_has_inc"),
        F.max(F.when(F.col(effect_col) == dec, 1).otherwise(0)).alias("_has_dec"),
    )
    return (
        agg.where(F.col("_has_inc") + F.col("_has_dec") == 1)
        .withColumn(
            "effect",
            F.when(F.col("_has_inc") == 1, inc).otherwise(dec),
        )
        .drop("_has_inc", "_has_dec")
    )


def union_refs(
    df: DataFrame,
    keys: list[str],
    ref_col: str = "pmids",
    out_col: str = "refs",
    drop_values: tuple[str, ...] = ("unassigned",),
) -> DataFrame:
    """Merge duplicate edges, unioning their reference lists.

    ``ref_col`` may be ``array<string>`` or a comma-joined string (the
    reference's on-disk form, parsers.py:901). Output is a sorted distinct
    array; rows whose merged list is empty are dropped (reference:
    parsers.py:2854-2856 drops ``unassigned`` and requires non-empty).
    """
    col = F.col(ref_col)
    dtype = dict(df.dtypes)[ref_col]
    arr = col if dtype.startswith("array") else F.split(col, ",")
    cleaned = F.filter(
        arr, lambda x: (~x.isin(*[F.lit(v) for v in drop_values])) & (x != "")
    )
    return (
        df.withColumn("_refs", cleaned)
        .groupBy(*keys)
        .agg(F.array_sort(F.array_distinct(F.flatten(F.collect_list("_refs")))).alias(out_col))
        .where(F.size(out_col) > 0)
    )


def schema_audit(
    triples: DataFrame,
    types: DataFrame,
    contract: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Per-predicate schema/integrity report for an emitted triple table —
    the publish gate a 10^12-triple pipeline runs before release (the
    graph-side sibling of transcript_integrity's input audit; the
    reference trusts its own emit loop and has no such check).

    ``types``: (entity_id, entity_type) — deduped here to one type per
    id (min), so a dirty type map fans nothing out. ``contract``:
    (pred, subj_type, obj_type, undirected) — the closed vocabulary in
    ORIENTED form. Both are dims → broadcast; the scan over the triple
    table is one pass plus a tiny per-pred aggregate.

    Output per pred: n, n_unknown_subj, n_unknown_obj (type lookup
    missed), n_bad_pair (type pair not licensed for the pred),
    n_bad_orient (undirected triple not in canonical subj<=obj form),
    n_valid (all checks pass).
    """
    # min-type per id via a row_number window, not min(string): a STRING
    # aggregate buffer is not HashAggregate-able, so min() planned as
    # Sort+SortAggregate; the window is one sort of the (dim-sized)
    # type map and keeps the audit's plan SortAggregate-free
    w_t = Window.partitionBy("entity_id").orderBy("entity_type")
    t = (
        types.withColumn("_rk", F.row_number().over(w_t))
        .where(F.col("_rk") == 1)
        .select("entity_id", "entity_type")
    )
    j = (
        triples.select(subj, pred, obj)
        .join(
            F.broadcast(
                t.select(
                    F.col("entity_id").alias(subj),
                    F.col("entity_type").alias("_ts"),
                )
            ),
            subj,
            "left",
        )
        .join(
            F.broadcast(
                t.select(
                    F.col("entity_id").alias(obj),
                    F.col("entity_type").alias("_to"),
                )
            ),
            obj,
            "left",
        )
        .join(
            F.broadcast(
                contract.select(
                    F.col("pred").alias(pred),
                    F.col("subj_type").alias("_ts"),
                    F.col("obj_type").alias("_to"),
                    F.col("undirected").alias("_und"),
                )
            ),
            [pred, "_ts", "_to"],
            "left",
        )
    )
    pair_ok = F.col("_und").isNotNull()
    orient_ok = pair_ok & (~F.col("_und") | (F.col(subj) <= F.col(obj)))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return j.groupBy(pred).agg(
        F.count(F.lit(1)).alias("n"),
        flag(F.col("_ts").isNull()).alias("n_unknown_subj"),
        flag(F.col("_to").isNull()).alias("n_unknown_obj"),
        flag(~pair_ok).alias("n_bad_pair"),
        flag(pair_ok & ~orient_ok).alias("n_bad_orient"),
        flag(orient_ok).alias("n_valid"),
    )
