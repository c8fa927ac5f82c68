"""Similarity search over embedding columns (array<float>).

Not present in the reference (its linking is exact-ID based); required by
the training-data-pipeline mandate. Two tiers:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is small by construction, so Catalyst broadcast-joins it
  and the big side streams through one pass (no shuffle until the per-query
  top-k aggregate).
- ``lsh_bucketed_topk``: the scale path — sign-bucket the space on the
  first ``sign_bits`` dimensions (a fixed, data-independent hyperplane
  family), then search only within the query's bucket. At 100 TB the
  bucket column becomes the table's partition key so a query prunes
  ~2^sign_bits of the data at the scan.

All arithmetic is float→double cast then sequential sum, with similarity
rounded to 4 dp and ties broken on id — deterministic and reproducible in
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column, decimals: int = 4) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact brute-force top-k by cosine: (q_id, c_id, sim, rank).

    ``queries`` is expected to be small (it is broadcast); the corpus is
    scanned once. Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )


def sign_bucket(vec: Column, sign_bits: int = 4) -> Column:
    """Data-independent LSH bucket: concatenated sign bits of the first
    ``sign_bits`` components ('1' if > 0 else '0')."""
    return F.concat_ws(
        "",
        *[
            (F.element_at(vec, i + 1) > 0).cast("int").cast("string")
            for i in range(sign_bits)
        ],
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    fit_sample_fraction: float = 1.0,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer + multi-probe.

    Train ``n_cells`` centroids on the corpus (pyspark.ml KMeans — one
    pass per iteration, the model is tiny and broadcast), assign every
    corpus vector to its nearest cell at write time (at 100 TB the cell id
    is the table's partition key), then search each query only in its
    ``n_probe`` nearest cells. Recall grows with n_probe; **n_probe =
    n_cells is EXACTLY brute force regardless of the learned centroids**
    (every corpus vector lives in exactly one probed cell) — the
    correctness invariant the oracle checks. Deterministic via fixed seed.

    ``fit_sample_fraction < 1`` fits the quantizer on a corpus sample —
    at 100 TB you never k-means the full table; a few million sampled
    vectors pin the centroids and only the (cheap, single-pass)
    assignment touches every row.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    dense = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="_cell")
    fit_input = (
        dense if fit_sample_fraction >= 1.0
        else dense.sample(fraction=fit_sample_fraction, seed=seed)
    )
    model = km.fit(fit_input)
    assigned = model.transform(dense).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), "_cell"
    )
    # centroid table (tiny): cell -> centroid array
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = corpus.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    # rank this query's cells by centroid cosine, keep n_probe
    q_cells = (
        q.join(F.broadcast(cent_df))
        .select(
            "q_id",
            "q_vec",
            "cell",
            cosine_similarity(F.col("q_vec"), F.col("centroid"), 6).alias("_csim"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("_csim"), F.asc("cell"))
    probes = (
        q_cells.withColumn("_crk", F.row_number().over(wq))
        .where(F.col("_crk") <= n_probe)
        .select("q_id", "q_vec", F.col("cell").alias("_cell"))
    )
    scored = (
        assigned.join(F.broadcast(probes), on="_cell")
        .where(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    sign_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    Recall < 1 by design; the win is that the join key (bucket) prunes the
    corpus scan by ~2^sign_bits. Output schema matches ``cosine_topk``.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), sign_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), sign_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )
