"""Model-based quality classification: hashed-feature logistic
regression trained inside the engine (full-batch gradient descent).

Web-scale corpus curation filters documents with a trained quality
model, not just hand rules: CCNet scores pages with a target-domain
language model, fastText-style classifiers (as used for LLaMA/GPT-3
data curation) hash word n-grams into a fixed bucket space and fit a
linear model over them. This module is that family re-expressed as
DataFrame aggregates: the feature space is the SAME hashed word-shingle
space as :func:`biokg_spark.operators.mixture.dsir_importance` (one
extractor serves dedup, DSIR selection, and classifier filtering), and
training is deterministic full-batch logistic-regression GD with a
fixed iteration count — no sampling, no float-order races — so the
fitted weights AND per-document scores are value-exact reproducible in
any engine; the registry oracles them against DuckDB by unrolling the
iterations as chained CTEs (the operators/pagerank.py discipline).

Model. Per document d with distinct hashed features B_d (|B_d| = n_d):

    z_d = w_bias + Σ_{b ∈ B_d} w_b / n_d        (mean-pooled features)
    p_d = σ(z_d) = 1 / (1 + exp(-z_d))
    L   = -(1/N) Σ_d [ y_d ln p_d + (1-y_d) ln(1-p_d) ]
    ∂L/∂w_b = (1/N) Σ_{d: b ∈ B_d} (p_d - y_d) / n_d
    ∂L/∂w_bias = (1/N) Σ_d (p_d - y_d)

The bias is row bucket = -1 with feature value x = 1 in the SAME
(doc, bucket, x) feature table (bucket rows carry x = 1/n_d), so one
join + one aggregate computes every z_d and one join + one aggregate
computes the whole gradient — the bias needs no special-cased driver
arithmetic and the training loop performs ZERO driver-side actions.

Scale shape (100 TB): the feature table is built ONCE (shingle explode
→ distinct → one groupBy for n_d) and localCheckpointed; each GD step
is (a) broadcast the weight dim (buckets+1 rows — the MODEL is the
broadcast, never driver state) onto the features and partial+final
HashAggregate on doc id, then (b) one more partial+final HashAggregate
on bucket for the gradient. Long/double buffers throughout → no
SortAggregate fallback. Iteration count is fixed and small; the weight
dim is localCheckpointed per step so lineage stays O(1). Scoring a
10^12-doc corpus is step (a) alone — map-side broadcast join plus one
aggregate, embarrassingly parallel.

Reference: n/a — training-data-pipeline mandate (model-based quality
filtering); cf. CCNet (Wenzek et al. 2020) and fastText hashed-n-gram
classifiers (Joulin et al. 2017), re-expressed as two hash aggregates
per GD step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(sh: Column, buckets: int) -> Column:
    """28-bit md5-prefix hash → bucket id (the dsir_importance idiom,
    engine-portable: DuckDB ``('0x' || substr(md5(x),1,7))::BIGINT``)."""
    return (
        F.conv(F.substring(F.md5(sh), 1, 7), 16, 10).cast("long")
        % buckets
    )


def hashed_doc_features(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int,
    width: int = 2,
) -> DataFrame:
    """(id, bucket, x) hashed-shingle design matrix in sparse row form.

    One row per DISTINCT (document, bucket) pair with x = 1/n_d (mean
    pooling — n_d counts distinct buckets AFTER hashing, so collisions
    fold before normalization), plus one bias row (bucket = -1, x = 1)
    per document. Empty text still yields the single empty-string
    shingle, so every input row is represented.
    """
    from biokg_spark.operators.dedup import shingles

    f = (
        docs.select(
            F.col(id_col),
            F.explode(shingles(text_col, width)).alias("_sh"),
        )
        .select(id_col, _bucket_of(F.col("_sh"), buckets).alias("bucket"))
        .distinct()
    )
    n = f.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    feat = f.join(n, id_col).select(
        id_col, "bucket", (F.lit(1.0) / F.col("_n")).alias("x")
    )
    bias = n.select(id_col, F.lit(-1).alias("bucket"), F.lit(1.0).alias("x"))
    return feat.unionByName(bias)


def train_quality_classifier(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    width: int = 2,
    iters: int = 6,
    lr: float = 4.0,
) -> DataFrame:
    """Fit logistic-regression weights; returns (bucket, w) with
    bucket = -1 the bias. ``label`` is any boolean Column over ``docs``
    (typically a weak label: a curated source slice, a rule verdict).

    Deterministic: zero init, fixed ``iters`` full-batch GD steps,
    fixed ``lr``; no sampling and no convergence test, so the result is
    engine-exact (oracle: :func:`quality_classifier_oracle_ctes`).
    ``lr`` defaults high because mean-pooled features make per-weight
    gradients small (each is averaged twice: over the doc's features
    and over the corpus).
    """
    spark = docs.sparkSession
    x = hashed_doc_features(docs, text_col, id_col, buckets, width)
    y = docs.select(F.col(id_col), label.cast("double").alias("y"))
    xy = x.join(y, id_col).localCheckpoint()
    n_docs = docs.count()
    # numPartitions=1: the weight vector is a (buckets+1)-row dim; the
    # default defaultParallelism slices made every GD-step checkpoint a
    # 32-task stage over ~8 rows each.
    w = spark.range(-1, buckets, 1, 1).select(
        F.col("id").alias("bucket"), F.lit(0.0).alias("w")
    )
    for _ in range(iters):
        resid = (
            xy.join(F.broadcast(w), "bucket")
            .groupBy(id_col, "y")
            .agg(F.sum(F.col("w") * F.col("x")).alias("z"))
            .select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
                    - F.col("y")
                ).alias("r"),
            )
        )
        grad = (
            xy.join(resid, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("r") * F.col("x")) / n_docs).alias("g"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w") - lr * F.coalesce(F.col("g"), F.lit(0.0))
                ).alias("w"),
            )
            .localCheckpoint()
        )
    return w


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    width: int = 2,
) -> DataFrame:
    """σ(w·x) per document under fitted ``weights`` → (id, score).

    The 10^12-row path: ONE broadcast join of the (buckets+1)-row model
    onto the hashed features and ONE partial+final HashAggregate on the
    doc id. Hash ``buckets``/``width`` must match training.
    """
    x = hashed_doc_features(docs, text_col, id_col, buckets, width)
    return (
        x.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("w") * F.col("x")).alias("_z"))
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z")))).alias("score"),
        )
    )


def quality_classifier_oracle_ctes(
    docs_cte: str,
    label_sql: str,
    buckets: int = 256,
    width: int = 2,
    iters: int = 6,
    lr: float = 4.0,
) -> str:
    """ANSI-SQL twin: GD steps unrolled as chained CTEs w0..w{iters},
    term-for-term the Spark recurrence (same hashed feature space, same
    mean pooling, same bias-as-bucket(-1) trick). ``docs_cte`` must
    define ``d(doc_id, text)``; ``label_sql`` is a boolean expression
    over a row of ``d``. Emits (doc_id, y, score) with score at 4 dp.

    Only width=2 shingle SQL is generated (the registry's width);
    assert rather than silently diverge from the Spark form.
    """
    assert width == 2
    sql = [docs_cte]
    sql.append(
        """tok AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM d)"""
    )
    sql.append(
        """sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(ts) >= 2
                  THEN array_to_string(list_slice(ts, i, i + 1), ' ')
                  ELSE array_to_string(ts, ' ') END AS sh
      FROM tok, unnest(generate_series(1, greatest(len(ts) - 1, 1))) AS t(i))"""
    )
    sql.append(
        f"""fb AS (
      SELECT DISTINCT doc_id,
             CAST(('0x' || substr(md5(sh), 1, 7)) AS BIGINT) % {buckets}
               AS bucket
      FROM sh)"""
    )
    sql.append(
        "nd AS (SELECT doc_id, count(*) AS n FROM fb GROUP BY doc_id)"
    )
    sql.append(
        """x AS (
      SELECT fb.doc_id, bucket, 1.0 / n AS x FROM fb JOIN nd USING (doc_id)
      UNION ALL SELECT doc_id, -1 AS bucket, 1.0 AS x FROM nd)"""
    )
    sql.append(f"y AS (SELECT doc_id, CAST(({label_sql}) AS DOUBLE) AS y FROM d)")
    sql.append("nn AS (SELECT count(*) AS n FROM d)")
    sql.append(
        f"w0 AS (SELECT i AS bucket, 0.0 AS w "
        f"FROM unnest(generate_series(-1, {buckets - 1})) AS t(i))"
    )
    for i in range(1, iters + 1):
        sql.append(
            f"""r{i} AS (
      SELECT x.doc_id,
             1.0/(1.0 + exp(-sum(w{i - 1}.w * x.x))) - any_value(y.y) AS r
      FROM x JOIN w{i - 1} USING (bucket) JOIN y ON x.doc_id = y.doc_id
      GROUP BY x.doc_id)"""
        )
        sql.append(
            f"""w{i} AS (
      SELECT w{i - 1}.bucket,
             w{i - 1}.w - {lr} * coalesce(g.g, 0.0) AS w
      FROM w{i - 1} LEFT JOIN (
        SELECT bucket, sum(r{i}.r * x.x) / (SELECT n FROM nn) AS g
        FROM x JOIN r{i} USING (doc_id) GROUP BY bucket) g
      ON w{i - 1}.bucket = g.bucket)"""
        )
    return (
        "WITH "
        + ",\n".join(sql)
        + f"""
    SELECT x.doc_id, any_value(y.y) AS y,
           round(1.0/(1.0 + exp(-sum(w{iters}.w * x.x))), 4) AS score
    FROM x JOIN w{iters} USING (bucket) JOIN y ON x.doc_id = y.doc_id
    GROUP BY x.doc_id"""
    )
