"""Table catalog: sources and sinks.

The reference's "catalog" is a directory convention of TSV files
(reference: main.py:21-31, compile_biokg.py:11-23). Here sources are
parquet (or any Spark-readable format) tables addressed by directory; the
TSV writer exists only for reference-compatible dumps (reference:
export_triplets parsers.py:100-113, write_triples compile_biokg.py:932-935).

At cluster scale these reads would target an Iceberg catalog; the sandbox
has no Iceberg runtime jar, so the catalog is parquet directories with the
same layout (partitioned paths, schema-on-read). Nothing downstream knows
the difference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table from an sf directory."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def write_tsv(df: DataFrame, path: str, sep: str = "\t") -> None:
    """Reference-compatible TSV dump (no header, positional columns)."""
    df.write.mode("overwrite").option("sep", sep).option("header", "false").csv(path)
