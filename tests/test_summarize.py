from biokg_spark.pipeline.summarize import (
    per_predicate_counts,
    summarize_edges,
    summarize_families,
)


def test_summarize_edges(spark):
    df = spark.createDataFrame(
        [("A", "PPI", "B"), ("A", "PPI", "B"), ("B", "DPI", "C"), ("A", "DPI", "C")],
        "subj string, pred string, obj string",
    )
    got = summarize_edges(df)
    assert got == {"nb_ents": 3, "nb_rels": 2, "nb_triplets": 4, "nb_pairs": 3}


def test_per_predicate_counts(spark):
    df = spark.createDataFrame(
        [("A", "PPI", "B"), ("B", "PPI", "C"), ("B", "DPI", "C")],
        "subj string, pred string, obj string",
    )
    got = {r.pred: r.n for r in per_predicate_counts(df).collect()}
    assert got == {"PPI": 2, "DPI": 1}


def test_summarize_families_skips_non_edges(spark):
    edges = spark.createDataFrame(
        [("A", "PPI", "B")], "subj string, pred string, obj string"
    )
    other = spark.createDataFrame([(1,)], "x int")
    got = summarize_families({"links": edges, "ingest": other})
    assert set(got) == {"links"}
    assert got["links"]["nb_triplets"] == 1


def test_corpus_stats_approx_within_sketch_bound(spark, tmp_path):
    """The approx (Greenwald-Khanna) percentile path of corpus_stats
    stays within its documented rank-error bound (n/accuracy, accuracy
    10,000) on an input LARGER than the sketch's exact regime, and the
    non-percentile aggregates are identical to the exact path."""
    import numpy as np
    from pyspark.sql import functions as F

    from biokg_spark.queries import corpus_stats

    n = 25_000  # > accuracy -> the sketch is genuinely approximate
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # skewed token counts: nt = (id*id) % 997 + 1, JVM-side
        F.rtrim(F.repeat(F.lit("w "), ((F.col("id") * F.col("id")) % 997 + 1).cast("int"))).alias("text"),
    )
    d = str(tmp_path / "corpus")
    docs.write.mode("overwrite").parquet(d + "/documents.parquet")

    exact = corpus_stats(spark, d, approx=False).collect()[0]
    approx = corpus_stats(spark, d, approx=True).collect()[0]

    assert approx.n_docs == exact.n_docs == n
    assert approx.total_tokens == exact.total_tokens
    assert approx.max_tokens == exact.max_tokens
    assert approx.mean_chars == exact.mean_chars

    nts = np.array([(i * i) % 997 + 1 for i in range(n)])
    eps = 1.0 / 10_000  # quantile error = rank_error/n = 1/accuracy
    for p, got in ((0.5, approx.p50_tokens), (0.9, approx.p90_tokens)):
        lo = np.percentile(nts, 100 * max(0.0, p - eps), method="lower")
        hi = np.percentile(nts, 100 * min(1.0, p + eps), method="higher")
        assert lo <= got <= hi, (p, got, lo, hi)
