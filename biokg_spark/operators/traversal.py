"""Multi-source BFS distances over the emitted triple table.

Hop-distance from a seed set is the standard KG traversal primitive
behind "context within k hops of the query entities" (GraphRAG-style
retrieval), curriculum radius selection for GNN training, and
reachability audits of a constructed graph. The reference profiles its
compiled graph with flat counts only (summarize_benchmarks.py:6-26);
this is the traversal-shaped audit of the same artifact — ego_network
(operators/walks.py) gives one entity's bounded neighborhood, BFS gives
the corpus-wide distance field from a seed SET.

Algorithm: frontier-expansion BFS. Round h joins the current frontier
against the edge list (an equi-join on the node id), anti-joins the
already-visited set, and labels the survivors dist=h. BFS visits every
node first at its minimum distance, so no min-aggregate is needed —
the anti-join IS the min. Both the frontier and the visited set are
localCheckpointed every round: an iterative plan that keeps its full
lineage re-derives rounds 0..t-1 from the source scan at every action
(the lineage-truncation discipline of operators/components.py,
operators/pagerank.py, operators/kcore.py). Termination: the frontier
empties (one cheap ``isEmpty`` action per round — a driver-side
boolean, not a collect of data) or ``max_hops`` is reached.

Scale shape (100 TB): each round is ONE shuffle of the frontier against
the edge list partitioned by src — with the edge table bucketed by src
the probe co-locates and the shuffle moves only the frontier, which is
bounded by the node set, not the corpus. The visited set grows
monotonically but never exceeds |V|; the anti-join against it
broadcasts while small and shuffles on id once it is not. A hub on the
frontier fans out to its full adjacency exactly once (first visit),
so power-law degree costs one round's explode, never a per-round one.

Determinism: distances are unique (min over hop counts), so output is
engine-exact with a recursive-CTE oracle — no tie-breaking anywhere.

Reference: n/a for the traversal itself — graph-analytics mandate over
the constructed KG (links file form: compile_biokg.py:139-169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Hop distance from ANY seed to every node within ``max_hops``.

    ``edges``: directed edge list (symmetrize before calling for
    undirected semantics). ``seeds``: one-column DataFrame of start
    nodes (``id_col``). Returns (id, dist) with dist = the minimum
    number of hops from the nearest seed, 0 for the seeds themselves;
    nodes farther than ``max_hops`` (or unreachable) are absent.
    """
    assert max_hops >= 0
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    dist = (
        seeds.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["_s"])
            .select(F.col("_d").alias("id"))
            .distinct()
            .join(dist.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt.select("id")
    return dist


def bfs_oracle_sql(
    edges_cte: str,
    seeds_cte: str,
    max_hops: int = 4,
) -> str:
    """Recursive-CTE twin of :func:`bfs_distances`.

    ``edges_cte`` must define ``e(src, dst)`` and ``seeds_cte`` must
    define ``seeds(id)``; the caller supplies both inside one WITH
    chain. The recursive UNION deduplicates full (id, dist) rows, so
    the recursion is bounded by max_hops even on cyclic graphs; the
    final min-aggregate collapses a node reached at several depths to
    its first (= minimum) one, exactly BFS's first-visit contract.
    Integer-only arithmetic — the comparison is engine-exact.
    """
    return f"""WITH RECURSIVE {edges_cte},
    {seeds_cte},
    bfs (id, dist) AS (
      SELECT id, 0 FROM seeds
      UNION
      SELECT e.dst, b.dist + 1
      FROM bfs b JOIN e ON b.id = e.src
      WHERE b.dist < {max_hops}
    )
    SELECT id AS entity_id, CAST(min(dist) AS INT) AS dist
    FROM bfs GROUP BY id"""


def bfs_distances_per_seed(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Per-seed hop distances: (seed, id, dist) for every seed→node
    pair within ``max_hops``.

    The same frontier-expansion/anti-join algorithm as
    :func:`bfs_distances` with the state keyed on (seed, node) instead
    of node — the fields from different seeds expand in the SAME
    per-round join (one shuffle per round for ALL seeds, not one BFS
    per seed), which is what makes a sampled-seed centrality estimate
    affordable: |seeds| is a sample-size knob, not a job multiplier.
    State size is bounded by |seeds| × |V|.
    """
    assert max_hops >= 0
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    dist = (
        seeds.select(F.col(id_col).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("id"), F.lit(0).alias("dist"))
        .localCheckpoint()
    )
    frontier = dist.select("seed", "id")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["_s"])
            .select("seed", F.col("_d").alias("id"))
            .distinct()
            .join(dist.select("seed", "id"), ["seed", "id"], "left_anti")
            .withColumn("dist", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt.select("seed", "id")
    return dist


def harmonic_centrality_sampled(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    decimals: int = 4,
) -> DataFrame:
    """Sampled harmonic centrality: h(v) = Σ_{s ∈ seeds, d(s,v) > 0}
    1 / d(s,v), distances truncated at ``max_hops``.

    Exact harmonic centrality needs all-pairs distances — quadratic and
    off the table at any scale; the standard estimator (Boldi & Vigna
    2014, "Axioms for centrality"; Eppstein–Wang sampling) sums over a
    seed SAMPLE and scales by |V|/|seeds| — the scaling is a constant,
    so this returns the raw truncated sum, the engine-exact quantity
    the oracle can reproduce (no float scaling to disagree on beyond
    the final rounding). Nodes no sampled seed reaches in ``max_hops``
    are absent; a seed contributes nothing to itself (d = 0).

    One frontier-expansion pass for all seeds
    (:func:`bfs_distances_per_seed`) + ONE partial+final HashAggregate
    on the node id.

    Reference: n/a — graph-analytics mandate over the constructed KG
    (the centrality family next to pagerank/HITS/k-core/clustering).
    """
    d = bfs_distances_per_seed(edges, seeds, max_hops, src, dst, id_col)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.round(F.sum(F.lit(1.0) / F.col("dist")), decimals).alias("harmonic"),
            F.count(F.lit(1)).alias("n_seeds_reaching"),
        )
    )


def harmonic_oracle_sql(
    edges_cte: str,
    seeds_cte: str,
    max_hops: int = 4,
    decimals: int = 4,
) -> str:
    """Recursive-CTE twin of :func:`harmonic_centrality_sampled` —
    the :func:`bfs_oracle_sql` recursion keyed on (seed, id), then the
    same 1/dist sum. Emits (entity_id, harmonic, n_seeds_reaching)."""
    return f"""WITH RECURSIVE {edges_cte},
    {seeds_cte},
    bfs (seed, id, dist) AS (
      SELECT id, id, 0 FROM seeds
      UNION
      SELECT b.seed, e.dst, b.dist + 1
      FROM bfs b JOIN e ON b.id = e.src
      WHERE b.dist < {max_hops}
    ),
    md AS (SELECT seed, id, min(dist) AS dist FROM bfs GROUP BY seed, id)
    SELECT id AS entity_id,
           round(sum(1.0 / dist), {decimals}) AS harmonic,
           count(*) AS n_seeds_reaching
    FROM md WHERE dist > 0 GROUP BY id"""
