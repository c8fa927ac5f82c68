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
