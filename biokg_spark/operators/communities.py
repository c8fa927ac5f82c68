"""Synchronous label-propagation community detection (LPA).

Connected components (operators/components.py) answer "what is
reachable"; communities answer "what is densely knit" — the partition
consumers use to browse a KG (drug families, pathway modules) and the
standard cheap clustering for entity-resolution candidate blocking.

This is SYNCHRONOUS LPA with a deterministic tie-break: every node
starts labeled with itself; at each iteration a node adopts the most
frequent label among its NEIGHBORS' previous-iteration labels, ties
broken by the smallest label. Fixed iteration count, no RNG, no
visit-order dependence — the async/randomized variant of the
literature is NOT reproducible across engines, this one is, so the
registry oracles it against DuckDB by unrolling the iterations as
chained CTEs (same discipline as operators/pagerank.py).

Scale shape (100 TB): per iteration one labels×edges shuffle join plus
one (node, label) partial+final count and one per-node top-1 window —
all keyed on the node id, so AQE handles skewed hubs. The edge table is
localCheckpointed once; labels are localCheckpointed every few
iterations so lineage stays flat (the iterative-plan discipline of
operators/components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Community label per node after ``iters`` synchronous rounds.

    ``edges``: directed pairs; pass the symmetrized set for undirected
    semantics (a node's neighbors are its out-edges' dst side).
    Returns (id, community).
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint()
    )
    labels = e.select(F.col("_s").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    )
    top1 = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("lbl"))
    for i in range(iters):
        nbr = e.join(
            labels.withColumnRenamed("id", "_d"), "_d"
        ).select(F.col("_s").alias("id"), "lbl")
        counts = nbr.groupBy("id", "lbl").agg(F.count(F.lit(1)).alias("n"))
        labels = (
            counts.withColumn("rn", F.row_number().over(top1))
            .where(F.col("rn") == 1)
            .select("id", "lbl")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint()
    return labels.select("id", F.col("lbl").alias("community"))


def lpa_oracle_ctes(links_cte: str, iters: int = 4) -> str:
    """DuckDB twin over a ``links(subj, pred, obj)`` CTE chain: the
    symmetrized edge set, then ``iters`` unrolled label rounds with the
    identical (count desc, label asc) tie-break."""
    steps = []
    prev = "l0"
    for t in range(1, iters + 1):
        steps.append(
            f"""c{t} AS (
      SELECT e._s AS id, l.lbl, count(*) AS n
      FROM e JOIN {prev} l ON e._d = l.id GROUP BY e._s, l.lbl),
    l{t} AS (
      SELECT id, lbl FROM (
        SELECT id, lbl,
               row_number() OVER (PARTITION BY id ORDER BY n DESC, lbl ASC)
                 AS rn
        FROM c{t}) WHERE rn = 1)"""
        )
        prev = f"l{t}"
    return f"""
    WITH {links_cte},
    e AS (SELECT DISTINCT subj AS _s, obj AS _d FROM links
          UNION SELECT obj, subj FROM links),
    l0 AS (SELECT DISTINCT _s AS id, _s AS lbl FROM e),
    {','.join(steps)}
    SELECT id AS entity_id, lbl AS community FROM {prev}
    """
