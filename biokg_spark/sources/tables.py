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


def read_excel_table(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """Excel source — S7 analog (reference: parsers.py:3261-3290 reads the
    Hijazi20 supplement with pd.read_excel, then splits ``sub(site)`` via
    regex; the regex split maps to ``regexp_extract`` downstream).

    Gated on an Excel engine being installed (this container ships none):
    the pandas read happens driver-side — Excel files are small curated
    supplements, never the distributed fact data — then distributes via
    ``createDataFrame``.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without openpyxl
        raise NotImplementedError(
            "read_excel_table needs openpyxl (not in this container); "
            "the reference's excel inputs are small curated supplements — "
            "convert to CSV/parquet upstream or install openpyxl"
        ) from exc
    import pandas as pd

    return spark.createDataFrame(pd.read_excel(path, sheet_name=sheet))
