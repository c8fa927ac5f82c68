from pyspark.sql import functions as F

from biokg_spark.operators.stanzas import (
    assemble_stanzas,
    assign_segments,
    prefix_multiplex,
)

LINES = [
    # src, line_no, text  — two files, '//' terminators (reference: parsers.py:452-470)
    ("f1", 0, "ID alpha"),
    ("f1", 1, "AC A1"),
    ("f1", 2, "//"),
    ("f1", 3, "ID beta"),
    ("f1", 4, "AC B1"),
    ("f1", 5, "AC B2"),
    ("f1", 6, "//"),
    ("f2", 0, "ID gamma"),
    ("f2", 1, "//"),
]


def _lines_df(spark):
    return spark.createDataFrame(LINES, "src string, line_no int, text string")


def test_assign_segments(spark):
    df = assign_segments(_lines_df(spark), F.col("text") == "//")
    got = {(r.src, r.line_no): r.segment for r in df.collect()}
    assert got[("f1", 0)] == 0 and got[("f1", 2)] == 0  # terminator closes its own segment
    assert got[("f1", 3)] == 1 and got[("f1", 6)] == 1
    assert got[("f2", 0)] == 0


def test_assemble_stanzas(spark):
    out = assemble_stanzas(_lines_df(spark), F.col("text") == "//")
    rows = {(r.src, r.segment): r for r in out.collect()}
    assert rows[("f1", 0)].lines == ["ID alpha", "AC A1"]
    assert rows[("f1", 1)].lines == ["ID beta", "AC B1", "AC B2"]
    assert rows[("f1", 1)].n_lines == 3
    assert rows[("f2", 0)].lines == ["ID gamma"]


def test_assemble_deterministic_under_repartition(spark):
    df = _lines_df(spark).repartition(7)
    out = assemble_stanzas(df, F.col("text") == "//")
    rows = {(r.src, r.segment): tuple(r.lines) for r in out.collect()}
    assert rows[("f1", 1)] == ("ID beta", "AC B1", "AC B2")


def test_prefix_multiplex(spark):
    st = assemble_stanzas(_lines_df(spark), F.col("text") == "//")
    mux = prefix_multiplex(st)
    rows = {(r.src, r.segment): r.fields for r in mux.collect()}
    assert rows[("f1", 0)] == {"ID": "alpha", "AC": "A1"}
    # repeated prefixes concatenate in line order (parsers.py:225-232)
    assert rows[("f1", 1)]["AC"] == "B1 B2"


def test_tsv_round_trip(spark, tmp_path):
    """K1/S6 analog: reference-compatible TSV dump reads back losslessly
    with an explicit schema (positional columns, no header)."""
    from biokg_spark.sources.tables import write_tsv

    df = spark.createDataFrame(
        [("P1", "PPI", "P2"), ("DB1", "DPI", "P1")],
        "subj string, pred string, obj string",
    )
    path = str(tmp_path / "triples_tsv")
    write_tsv(df, path)
    back = spark.read.csv(path, sep="\t", schema="subj string, pred string, obj string")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_excel_source_gated(spark, tmp_path):
    """S7 Excel source raises a clear gate error when no engine exists
    (and works when one does)."""
    import pytest

    from biokg_spark.sources.tables import read_excel_table

    try:
        import openpyxl  # noqa: F401
        has_engine = True
    except ImportError:
        has_engine = False
    if not has_engine:
        with pytest.raises(NotImplementedError, match="openpyxl"):
            read_excel_table(spark, str(tmp_path / "x.xlsx"))
