from __future__ import annotations

from pyspark.sql import functions as F

from biokg_spark.datagen import entity_lexicon, id_mapping, transcripts


def _digest(df):
    """Order-insensitive content digest of a DataFrame."""
    cols = [F.col(c).cast("string") for c in df.columns]
    row_hash = F.md5(F.concat_ws("\x01", *cols))
    return df.select(row_hash.alias("h")).agg(
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("d")
    ).first()["d"]


def test_transcripts_deterministic_across_partitioning(spark):
    a = transcripts(spark, n_conversations=20, partitions=2)
    b = transcripts(spark, n_conversations=20, partitions=7)
    assert _digest(a) == _digest(b)


def test_transcripts_schema_and_invariants(spark):
    tx = transcripts(spark, n_conversations=10)
    assert [f.name for f in tx.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    assert tx.schema["turn_idx"].dataType.simpleString() == "int"
    # dense 0-based turn_idx per conversation
    agg = tx.groupBy("conv_id").agg(
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = agg.where((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0
    # ts monotone within conversation (30s per turn)
    assert tx.where(F.col("ts").isNull()).count() == 0


def test_lexicon_contains_alt_ids_and_mapping_resolves_them(spark):
    lex = entity_lexicon(spark)
    alts = {r.entity_id for r in lex.where("entity_id LIKE 'ALT:%'").collect()}
    assert alts
    mapped = {r.src_id for r in id_mapping(spark).collect()}
    assert alts <= mapped


def test_skew_hot_entities_present(spark):
    tx = transcripts(spark, n_conversations=50, hot_entity_pct=25)
    top = (
        tx.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w").rlike("^(protkin|drugamab|carcinitis|pathglyco)"))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"))
        .limit(4)
        .collect()
    )
    hot = {"protkin1", "drugamab1", "carcinitis1", "pathglyco1"}
    assert {r.w for r in top} == hot
