"""Deterministic distributed k-means over embedding columns.

Semantic organization of a training corpus: cluster document embeddings
to balance topics, stratify mixtures, pick semantic-dedup candidates,
or build IVF-style coarse quantizers (``operators/similarity.py`` fits
its quantizer by sampling; this is the full Lloyd's iteration as a
first-class operator).

Determinism contract — the usual k-means nondeterminism sources are
all removed so runs, partitionings, and ENGINES agree exactly:

* init: the first ``k`` points in id order (no RNG seed to disagree on);
* assignment: argmin of the squared L2 distance in fixed-point
  micro-units (``floor(d * 1e6 + 0.5)`` as LONG — the same float ops
  evaluate identically in every engine, unlike ``round()``, whose
  half-way semantics differ between engines), ties broken by lowest
  cluster id (a struct-min over (dist_u6, cluster));
* update: the QUANTIZED-INTEGER mean — each component is floored to
  integer micro-units (``floor(x * 1e6)`` as LONG) before summation,
  so the per-cluster sum is an exact integer that no addition order
  can perturb (float sums are order-dependent; long sums are not),
  then divided back out in two IEEE correctly-rounded double divisions.
  The ~1e-6 quantization bias is irrelevant to clustering quality and
  is the price of bit-identical centroids everywhere.

Scale shape: centroids are k x d doubles — the ONLY thing that ever
reaches the driver (one k*d-row aggregate collect per iteration, the
same bounded pattern as MLlib's KMeans). Assignment is a pure Column
expression against centroid LITERALS (no join, no shuffle); the update
is one posexplode + one map-side-partial HashAggregate on
(cluster, dim) — k*d groups. Nothing is quadratic in points; iteration
count bounds the job count.

Reference: n/a — training-data-pipeline mandate (embedding clustering);
Lloyd's algorithm per MacQueen/Lloyd, quantized for engine parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QUANT = 1_000_000.0


def _sqdist(v: Column, cent: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(pts: DataFrame, cents: list[list[float]]) -> DataFrame:
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    F.floor(_sqdist(F.col("v"), c) * F.lit(_QUANT) + F.lit(0.5))
                    .cast("long")
                    .alias("dist_u6"),
                    F.lit(ci).alias("cluster"),
                )
                for ci, c in enumerate(cents)
            ]
        )
    )
    return pts.withColumn("cluster", best["cluster"]).withColumn(
        "dist_u6", best["dist_u6"]
    )


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Run ``iterations`` Lloyd's rounds; return the final assignment.

    Output: (id_col, cluster int, dist_u6 long) — the squared L2
    distance to the final centroid in fixed-point micro-units. A cluster emptied
    by an assignment round keeps its previous centroid (cannot happen
    with distinct init points and the id tie-break, but guarded).
    """
    pts = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).cache()
    cents = [list(r.v) for r in pts.orderBy(id_col).limit(k).collect()]
    for _ in range(iterations):
        assigned = _assign(pts, cents)
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(_QUANT)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cluster.setdefault(r.cluster, {})[r.dim] = float(r.s) / r.n / _QUANT
        cents = [
            [by_cluster[ci][d] for d in range(len(cents[ci]))]
            if ci in by_cluster
            else cents[ci]
            for ci in range(k)
        ]
    out = _assign(pts, cents).select(id_col, "cluster", "dist_u6")
    pts.unpersist()
    return out


def kmeans_oracle_sql(
    k: int = 4,
    iterations: int = 2,
    source_sql: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Generate the unrolled DuckDB twin of :func:`kmeans_assign`.

    Per iteration: a cross join of points x k centroids (k rows — the
    oracle may do what the operator must not), the same fixed-point
    argmin row_number, and the same quantized-integer mean. The generated-SQL
    pattern of functions/cascade.py / operators/bpe.py.
    """

    def assign(i: int, cent: str) -> str:
        return (
            f"d{i} AS (SELECT p.{id_col}, c.cluster,"
            f" CAST(floor(list_sum(list_transform(generate_series(1, len(p.v)),"
            f" j -> (p.v[j] - c.v[j]) * (p.v[j] - c.v[j])))"
            f" * 1000000.0 + 0.5) AS BIGINT) AS dist_u6"
            f" FROM pts p CROSS JOIN {cent} c),\n"
            f"a{i} AS (SELECT {id_col}, cluster, dist_u6 FROM"
            f" (SELECT *, row_number() OVER (PARTITION BY {id_col}"
            f" ORDER BY dist_u6, cluster) AS rn FROM d{i}) WHERE rn = 1)"
        )

    parts = [
        f"pts AS (SELECT {id_col},"
        f" list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v"
        f" FROM {source_sql})",
        f"c0 AS (SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cluster, v"
        f" FROM (SELECT {id_col}, v FROM pts ORDER BY {id_col} LIMIT {k}))",
    ]
    for i in range(iterations):
        parts.append(assign(i, f"c{i}"))
        parts.append(
            f"u{i} AS (SELECT a.cluster, dd.dim,"
            f" sum(CAST(floor(p.v[dd.dim] * 1000000.0) AS BIGINT)) AS s,"
            f" count(*) AS n"
            f" FROM pts p JOIN a{i} a ON p.{id_col} = a.{id_col},"
            f" unnest(generate_series(1, len(p.v))) AS dd(dim)"
            f" GROUP BY a.cluster, dd.dim)"
        )
        parts.append(
            f"c{i + 1} AS (SELECT cluster,"
            f" list(CAST(s AS DOUBLE) / n / 1000000.0 ORDER BY dim) AS v"
            f" FROM u{i} GROUP BY cluster)"
        )
    parts.append(assign(iterations, f"c{iterations}"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {id_col}, cluster, dist_u6 FROM a{iterations}"
    )
