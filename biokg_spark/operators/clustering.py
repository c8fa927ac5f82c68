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


def kmeans_oracle_ctes(
    k: int = 4,
    iterations: int = 2,
    source_sql: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[str, str]:
    """CTE body of the :func:`kmeans_assign` DuckDB twin, for composition.

    Returns ``(ctes, final)`` where ``ctes`` defines ``pts({id_col},
    v double[])`` plus the unrolled iterations, and ``final`` names the
    CTE holding the final ``({id_col}, cluster, dist_u6)`` assignment.
    :func:`kmeans_oracle_sql` wraps this; :func:`semantic_dedup`'s oracle
    composes it with the pair stage.
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
    return ",\n".join(parts), f"a{iterations}"


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
    ctes, final = kmeans_oracle_ctes(k, iterations, source_sql, id_col, vec_col)
    return f"WITH {ctes}\nSELECT {id_col}, cluster, dist_u6 FROM {final}"


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    threshold: float = 0.999,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup: k-means blocking + within-cluster cosine near-dup drop.

    The semantic-deduplication stage of a web-scale curation pipeline
    (cf. Abbas et al. 2023, SemDeDup): cluster document embeddings with
    the deterministic :func:`kmeans_assign`, compare pairs only WITHIN a
    cluster, and for every pair with cosine ≥ ``threshold`` drop the
    endpoint CLOSER to its centroid (SemDeDup keeps the member farthest
    from the centroid — the most "representative of the cluster edge");
    dist ties drop the greater id, so the keep set is engine-exact.

    Output: one row per input point — (id_col, cluster, keep boolean);
    keep = the point lost no above-threshold pair.

    Scale shape: candidate generation is a self-equi-join on the cluster
    id — never a cross join — and SemDeDup's own contract bounds the
    quadratic term by scaling k with the corpus (k ≈ n/expected-cluster-
    size, constant cluster sizes at any corpus scale; the paper uses
    50k clusters for LAION). ``max_cluster_size`` is the degenerate-hot-
    cluster guard (the embedding_near_dup_pairs ``max_bucket_size``
    idiom): clusters above the cap skip the pair stage (their members
    all keep) rather than detonate the join. The k-means stage itself
    never touches the driver beyond k×d centroid rows per iteration.

    Reference: n/a — training-data-pipeline mandate (semantic dedup);
    cosine/rounding contract shared with operators/similarity.py so the
    DuckDB twin (queries.py::corpus_semantic_dedup) is value-exact.
    """
    from biokg_spark.operators.similarity import cosine_similarity

    assign = kmeans_assign(emb, id_col, vec_col, k, iterations).localCheckpoint(eager=True)
    # both sides of the within-cluster self-join read pts; materialize it
    # once so the emb-scan + assignment join runs once (no cross-branch CSE).
    pts = emb.select(id_col, vec_col).join(assign, id_col).localCheckpoint(
        eager=True
    )
    if max_cluster_size is not None:
        ok = (
            assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_cluster_size)
            .select("cluster")
        )
        pts = pts.join(ok, "cluster", "left_semi")
    # Bucket-split the within-cluster self-join (guide §2.5 salting): a
    # join keyed on the cluster id alone has only k distinct keys, so
    # the QUADRATIC pair stage runs on at most k tasks no matter how
    # wide the cluster is (measured: ~1.7 busy cores at k=8 on a 10x
    # input, 7.4 s -> >8 min). Each b-side point gets a deterministic
    # hash bucket; the a side explodes over all B buckets, so the join
    # key (cluster, bucket) has k*B values and the SAME candidate pair
    # multiset comes out (every (x, y) pair appears exactly once, via
    # y's bucket). B adapts to the cluster width, never a constant.
    n_buckets = max(
        1, -(-emb.sparkSession.sparkContext.defaultParallelism // k)
    )
    a = pts.select(
        "cluster",
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.col("dist_u6").alias("_da"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_buckets - 1))
        ).alias("_g"),
    )
    b = pts.select(
        "cluster",
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.col("dist_u6").alias("_db"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("_g"),
    )
    losers = (
        a.join(b, ["cluster", "_g"])
        .where(F.col("_ida") < F.col("_idb"))
        .where(
            cosine_similarity(F.col("_va"), F.col("_vb")) >= threshold
        )
        .select(
            F.when(F.col("_da") < F.col("_db"), F.col("_ida"))
            .when(F.col("_db") < F.col("_da"), F.col("_idb"))
            .otherwise(F.greatest("_ida", "_idb"))
            .alias(id_col)
        )
        .distinct()
        .withColumn("_lost", F.lit(True))
    )
    return assign.join(losers, id_col, "left").select(
        id_col,
        "cluster",
        F.coalesce(~F.col("_lost"), F.lit(True)).alias("keep"),
    )


def semantic_dedup_oracle_sql(
    k: int = 4,
    iterations: int = 2,
    source_sql: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
) -> str:
    """DuckDB twin of :func:`semantic_dedup` (composes
    :func:`kmeans_oracle_ctes` with the within-cluster pair stage; same
    4-dp cosine contract as queries.py::_COS_SQL, over the kmeans CTEs'
    pre-cast double vectors)."""
    ctes, final = kmeans_oracle_ctes(k, iterations, source_sql, id_col, vec_col)
    return f"""WITH {ctes},
    pp AS (SELECT p.{id_col}, p.v, a.cluster, a.dist_u6
           FROM pts p JOIN {final} a USING ({id_col})),
    pr AS (SELECT x.{id_col} AS id_a, y.{id_col} AS id_b,
                  x.dist_u6 AS da, y.dist_u6 AS db,
                  round(
                    list_sum(list_transform(generate_series(1, len(x.v)),
                             i -> x.v[i] * y.v[i]))
                    / (sqrt(list_sum(list_transform(x.v, t -> t * t)))
                     * sqrt(list_sum(list_transform(y.v, t -> t * t)))),
                  4) AS sim
           FROM pp x JOIN pp y
             ON x.cluster = y.cluster AND x.{id_col} < y.{id_col}),
    losers AS (SELECT DISTINCT
                 CASE WHEN da < db THEN id_a
                      WHEN db < da THEN id_b
                      ELSE greatest(id_a, id_b) END AS {id_col}
               FROM pr WHERE sim >= {threshold})
    SELECT a.{id_col}, a.cluster, (l.{id_col} IS NULL) AS keep
    FROM {final} a LEFT JOIN losers l USING ({id_col})"""
