"""Connected components over candidate-pair edges (dedup clustering).

Near-dup detection (MinHash/LSH, SimHash, embedding-cosine) yields
candidate PAIRS; deduplication needs CLUSTERS — the transitive closure of
the pair graph — plus a survivor per cluster. GraphFrames is not in this
container, so this is the standard alternating large-star/small-star-style
min-label propagation implemented with plain DataFrame joins:

    label(v) ← min(label(v), min over neighbors(label(u)))

iterated to fixpoint. Each iteration is one shuffle join + one aggregate.
Two materialization rules make iteration viable (the classic iterative-
DataFrame traps at scale):
- the edge set is localCheckpointed ONCE up front — otherwise every
  iteration recomputes the (possibly expensive: LSH banding, shingling)
  pair-generation lineage from scratch;
- every iteration's labels are eagerly localCheckpointed — otherwise the
  plan doubles per round and the convergence-check job recomputes the
  join twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex of the pair graph with its component's min id.

    Output: (id, component). Isolated vertices never appear in ``pairs``
    and so are their own components by definition (callers union them in
    if needed). Converges early when an iteration changes no label.

    Each round combines neighbor-min propagation with a pointer-jumping
    step (component ← label(component)), so label distances roughly halve
    per round: convergence is O(log diameter) rounds, and ``max_iter=20``
    covers chains far beyond anything a near-dup graph produces. If the
    labels still changed on the final round the function RAISES — a
    silently split component yields wrong dedup survivors downstream.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    # undirected: keep both directions so propagation flows both ways;
    # materialize ONCE — the upstream pair generation never re-runs
    sym = (
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .dropDuplicates()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        stepped = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("_nbr_min", F.col("component"))
            ).alias("component"),
            F.col("component").alias("_old"),
        )
        # pointer jump: follow one hop through the label table
        # (component is always a vertex id, so the lookup always hits)
        parent = labels.select(
            F.col("id").alias("component"), F.col("component").alias("_p")
        )
        updated = (
            stepped.join(parent, "component", "left")
            .select(
                "id",
                F.least(
                    F.coalesce("_p", F.col("component")), F.col("component")
                ).alias("component"),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            updated.where(F.col("component") != F.col("_old")).limit(1).count()
        )
        labels = updated.drop("_old")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds; "
            "raise max_iter (labels would be silently wrong otherwise)"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster near-dup candidate pairs and pick the survivor (min id).

    Output: (id, survivor, is_survivor) — one row per clustered document;
    downstream keeps ``is_survivor`` rows and drops the rest.
    """
    cc = connected_components(pairs, src, dst)
    return cc.select(
        "id",
        F.col("component").alias("survivor"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )
