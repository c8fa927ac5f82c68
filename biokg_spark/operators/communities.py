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
        .localCheckpoint(eager=False)
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
            labels = labels.localCheckpoint(eager=False)
    return labels.select("id", F.col("lbl").alias("community"))


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    com_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a community assignment — the evaluation
    metric that closes the community family (LPA produces a partition;
    this scores it): Q = Σ_c [ m_c/m − (d_c/2m)² ] over the undirected
    simple graph (canonicalized pairs, self-loops dropped).

    Returns ONE row: (n_communities, m_edges, inner_edges, modularity)
    with modularity rounded to 6 dp.

    Engine determinism: the two Σ terms are factored so every aggregate
    is an INTEGER sum — Q = (Σm_c)/m − (Σd_c²)/(4m²) — and the only
    float arithmetic is one fixed-shape scalar expression at the end.
    Summing doubles per community would be summation-order-dependent
    across engines; summing bigints is not.

    Scale shape: canonical dedup + degree count + two assignment
    equi-joins keyed on the node id (AQE-splittable), collapsing to a
    |C|-sized per-community frame, then one global aggregate; the edge
    count m rides in-plan as a 1-row crossJoin (the HITS norm idiom —
    no driver action).
    """
    e = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    amem = assign.select(F.col(id_col).alias("_id"), F.col(com_col).alias("_c"))
    deg = (
        e.select(F.col("a").alias("_id"))
        .union(e.select(F.col("b").alias("_id")))
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dc = (
        deg.join(amem, "_id")
        .groupBy("_c")
        .agg(F.sum("deg").alias("d_c"))
    )
    mc = (
        e.join(amem.select(F.col("_id").alias("a"), F.col("_c").alias("_ca")), "a")
        .join(amem.select(F.col("_id").alias("b"), F.col("_c").alias("_cb")), "b")
        .where(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    per = dc.join(mc, "_c", "left").select(
        "_c", "d_c", F.coalesce("m_c", F.lit(0)).alias("m_c")
    )
    m1 = e.agg(F.count(F.lit(1)).alias("m"))
    tot = per.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("m_c").alias("inner_edges"),
        F.sum(F.col("d_c") * F.col("d_c")).alias("_sq"),
    )
    return tot.crossJoin(m1).select(
        F.col("n_communities").cast("long").alias("n_communities"),
        F.col("m").cast("long").alias("m_edges"),
        F.col("inner_edges").cast("long").alias("inner_edges"),
        F.round(
            F.col("inner_edges") * F.lit(1.0) / F.col("m")
            - F.col("_sq")
            * F.lit(1.0)
            / (F.lit(4.0) * F.col("m") * F.col("m")),
            6,
        ).alias("modularity"),
    )


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
