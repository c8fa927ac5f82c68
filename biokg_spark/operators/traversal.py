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
