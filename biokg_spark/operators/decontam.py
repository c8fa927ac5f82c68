"""Benchmark decontamination: n-gram overlap between a training corpus
and a held-out evaluation set.

The reference pipeline emits training-ready dumps but leaves
contamination checks to consumers (its dedup is exact-set only,
parsers.py:783-832). At pretraining scale this sweep is mandatory:
any document sharing enough n-grams with an eval benchmark must be
flagged (and usually dropped) before training.

Shape at 100 TB: eval benchmarks are tiny (10^3-10^6 prompts), so the
bench shingle set is a BROADCAST dim — the corpus-side shingle explode
joins against it map-side, and the only shuffle is the per-document
partial+final aggregate of match counts. Nothing here is quadratic and
nothing depends on corpus size beyond the linear scan.

Shingling reuses :func:`biokg_spark.operators.dedup.shingles` (md5-free,
whitespace tokens), so the operator has an exact DuckDB SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biokg_spark.operators.dedup import shingles


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    width: int = 3,
    min_frac: float = 0.5,
) -> DataFrame:
    """Per-document contamination report vs a benchmark set.

    Returns one row per corpus document that shares >= 1 shingle with
    the benchmark: ``(doc_id, n_shingles, n_hit, n_bench_docs, frac,
    contaminated)`` where ``frac = n_hit / n_shingles`` (rounded 4 dp)
    and ``contaminated`` flags ``frac >= min_frac``.

    ``docs`` and ``bench`` must be disjoint document sets (the caller
    splits them); a doc appearing in both would trivially self-match.

    Plan: bench shingles -> distinct (shingle, bench_id), broadcast;
    corpus shingles inner-join it on the shingle string; one groupBy
    per doc. The bench side is the small side by construction — eval
    sets don't grow with the corpus.
    """
    bt = bench_text_col or text_col
    bi = bench_id_col or id_col

    bench_sh = (
        bench.select(
            F.col(bi).alias("_bench_id"),
            F.explode(shingles(bt, width)).alias("sh"),
        )
        .distinct()
    )
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles(text_col, width)).alias("sh")
    )
    sizes = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(
            F.count_distinct("sh").alias("n_hit"),
            F.count_distinct("_bench_id").alias("n_bench_docs"),
        )
    )
    frac = F.round(F.col("n_hit") / F.col("n_shingles"), 4)
    return (
        hits.join(sizes, id_col)
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            "n_bench_docs",
            frac.alias("frac"),
            (frac >= F.lit(min_frac)).alias("contaminated"),
        )
    )
