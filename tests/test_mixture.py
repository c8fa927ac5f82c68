"""Data-mixture upsampling semantics (operators/mixture.py)."""

from __future__ import annotations

import math

from biokg_spark.operators.mixture import mixture_epoch_factors, upsample_mixture


def _docs(spark, sizes):
    # sizes: {source: (n_docs, chars_per_doc)}
    rows, i = [], 0
    for src, (n, chars) in sizes.items():
        for _ in range(n):
            rows.append((i, src, chars))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars int")


def test_factors_inverse_sqrt_and_cap(spark):
    # big: 90k chars, small: 10k chars -> C=100k
    docs = _docs(spark, {"crawl": (90, 1000), "books": (10, 1000)})
    per = {
        r.source: r.epoch_factor
        for r in mixture_epoch_factors(docs, max_epochs=4.0).collect()
    }
    assert per["crawl"] == math.sqrt(100_000 / 90_000)
    # sqrt(10) ~ 3.16 < 4 cap
    assert per["books"] == math.sqrt(100_000 / 10_000)
    capped = {
        r.source: r.epoch_factor
        for r in mixture_epoch_factors(docs, max_epochs=2.0).collect()
    }
    assert capped["books"] == 2.0


def test_scale_pushes_dominant_below_one_epoch(spark):
    docs = _docs(spark, {"crawl": (400, 1000), "books": (20, 1000)})
    out = upsample_mixture(docs, max_epochs=4.0, scale=0.5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # crawl factor = 0.5*sqrt(420/400) < 1: a strict subset of one epoch
    assert 0 < len(by_src["crawl"]) < 400
    assert all(r.copy == 0 for r in by_src["crawl"])
    # books factor = 0.5*sqrt(21) ~ 2.29: every doc appears >= 2 times
    books_per_doc = {}
    for r in by_src["books"]:
        books_per_doc[r.doc_id] = books_per_doc.get(r.doc_id, 0) + 1
    assert len(books_per_doc) == 20
    assert all(c in (2, 3) for c in books_per_doc.values())
    # realized copy mass tracks the factor (binomial on 20 docs, wide slack)
    factor = 0.5 * math.sqrt(420 / 20)
    assert abs(sum(books_per_doc.values()) / 20 - factor) < 0.5


def test_rerun_and_partitioning_stable(spark):
    docs = _docs(spark, {"a": (50, 100), "b": (5, 100)})
    one = {(r.doc_id, r.copy) for r in upsample_mixture(docs, scale=0.9).collect()}
    two = {
        (r.doc_id, r.copy)
        for r in upsample_mixture(docs.repartition(7), scale=0.9).collect()
    }
    assert one == two


def test_epoch_bp_matches_factor(spark):
    docs = _docs(spark, {"a": (90, 1000), "b": (10, 1000)})
    rows = upsample_mixture(docs, max_epochs=4.0, scale=1.0).collect()
    bp = {r.source: r.epoch_bp for r in rows}
    assert bp["a"] == math.floor(math.sqrt(100 / 90) * 10000)
    assert bp["b"] == math.floor(math.sqrt(10) * 10000)


def test_budget_select_matches_global_prefix(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from biokg_spark.operators.mixture import budget_select

    rows = [(i, round(((i * 37) % 100) / 100.0, 4), 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, q double, n_tok long")
    got = {
        r.doc_id: (r.running_before, r.selected)
        for r in budget_select(df, "q", "doc_id", "n_tok", budget=500).collect()
    }
    w = Window.orderBy(F.col("q").desc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    exp = {
        r.doc_id: (r.rb, r.rb < 500)
        for r in df.withColumn(
            "rb", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
        ).collect()
    }
    assert got == exp
    assert len(got) == 200


def test_budget_select_boundary_doc_kept(spark):
    from biokg_spark.operators.mixture import budget_select

    df = spark.createDataFrame(
        [(1, 0.9, 40), (2, 0.5, 40), (3, 0.1, 40)],
        "doc_id long, q double, n_tok long",
    )
    got = {
        r.doc_id: r.selected
        for r in budget_select(df, "q", "doc_id", "n_tok", budget=50).collect()
    }
    # doc 2 straddles the budget (prefix 40 < 50): kept; doc 3 (prefix 80): not
    assert got == {1: True, 2: True, 3: False}
