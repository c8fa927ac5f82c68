"""PageRank centrality over the emitted triple table (power iteration).

The reference profiles its compiled graph only with flat counts
(summarize_benchmarks.py:6-26); consumers ranking entities (which hub
proteins to inspect, which drugs dominate the evidence) need a
centrality score. This is the standard fixed-iteration power method:

    rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v} rank_t(u) / out_deg(u)

Deterministic (fixed iteration count, no convergence test with
float-order sensitivity), so it is exactly reproducible in any engine —
the registry oracles it against DuckDB by unrolling the iterations as
chained CTEs.

Scale shape (100 TB): per iteration ONE shuffle join (ranks × edges on
src) and ONE partial+final aggregate on dst. The edge table (with
degree attached) is computed once and persisted; ranks are
localCheckpointed every few iterations so the lineage does not grow
linearly with iterations (same discipline as operators/components.py —
an iterative plan that re-derives iteration t from iteration 0 is the
classic Spark-graph failure mode). Node count N is a single driver-side
scalar (one count aggregate), not a collect of data. Dangling mass is
NOT redistributed (simplified variant; for symmetrized/undirected
input every node has out-degree ≥ 1, so nothing dangles) — documented
so the oracle matches term for term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Ranks for every node of ``edges`` (directed src→dst rows;
    symmetrize before calling for undirected semantics). Returns
    (id, rank) with exact float64 ranks — round at the consumer."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one persisted (src, dst, deg) table reused every iteration
    ed = e.join(deg, "src").localCheckpoint()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        sums = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("s"))
            .withColumnRenamed("dst", "id")
        )
        ranks = nodes.join(sums, "id", "left").select(
            "id",
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_oracle_ctes(
    links_cte: str, damping: float = 0.85, iters: int = 10
) -> str:
    """ANSI-SQL twin of :func:`pagerank` over a symmetrized links CTE:
    the fixed iteration count unrolls as chained CTEs r0..r{iters}, each
    one join + one aggregate — term-for-term the Spark recurrence, so
    the value hash matches at 4 dp."""
    d, sql = damping, [links_cte]
    sql.append(
        "e AS (SELECT subj AS src, obj AS dst FROM links "
        "UNION ALL SELECT obj, subj FROM links)"
    )
    sql.append("nodes AS (SELECT DISTINCT src AS id FROM e)")
    sql.append("deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)")
    sql.append("nn AS (SELECT count(*) AS n FROM nodes)")
    sql.append("r0 AS (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM nodes)")
    for i in range(1, iters + 1):
        sql.append(
            f"r{i} AS (SELECT nodes.id, "
            f"{1.0 - d}/(SELECT n FROM nn) + {d}*coalesce(c.s, 0) AS rank "
            f"FROM nodes LEFT JOIN ("
            f"SELECT e.dst AS id, sum(r{i - 1}.rank/deg.deg) AS s "
            f"FROM e JOIN r{i - 1} ON e.src = r{i - 1}.id "
            f"JOIN deg ON e.src = deg.src GROUP BY e.dst) c "
            f"ON nodes.id = c.id)"
        )
    return (
        "WITH "
        + ",\n".join(sql)
        + f"\nSELECT id AS entity_id, round(rank, 4) AS rank FROM r{iters}"
    )
