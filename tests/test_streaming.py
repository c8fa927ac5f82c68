from __future__ import annotations

import tempfile

from biokg_spark.datagen import transcripts
from biokg_spark.streaming import streaming_mention_counts


def test_streaming_mention_counts_matches_batch(spark):
    tx = transcripts(spark, n_conversations=10)
    surfaces = ["protkin1", "drugamab1"]
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        tx.write.parquet(src)
        stream = spark.readStream.schema(tx.schema).parquet(src)
        out = streaming_mention_counts(stream, surfaces, window="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("mention_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT surface, sum(n_mentions) AS n FROM mention_counts GROUP BY surface"
        ).collect()
        stream_totals = {r.surface: r.n for r in got}

    from pyspark.sql import functions as F

    batch_totals = {
        r.w: r.n
        for r in tx.select(F.explode(F.split(F.lower("text"), "\\s+")).alias("w"))
        .where(F.col("w").isin(surfaces))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert stream_totals == batch_totals and stream_totals


def test_sessionize_conversations_stateful(spark):
    from biokg_spark.streaming.events import sessionize_conversations

    tx = transcripts(spark, n_conversations=8)
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        tx.write.parquet(src)
        stream = spark.readStream.schema(tx.schema).parquet(src)
        out = sessionize_conversations(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last update per conv must equal the batch ground truth
        got = {
            r.conv_id: (r.n_turns, r.turn_idx_sum)
            for r in spark.sql(
                "SELECT * FROM (SELECT *, row_number() OVER "
                "(PARTITION BY conv_id ORDER BY n_turns DESC) rk FROM sessions) "
                "WHERE rk = 1"
            ).collect()
        }

    from pyspark.sql import functions as F

    want = {
        r.conv_id: (r.n, r.s)
        for r in tx.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("turn_idx").alias("s"))
        .collect()
    }
    assert got == want and len(got) == 8


def test_incremental_mentions_matches_batch(spark, tmp_path):
    """Streamed mention extraction must equal the batch scan, and a second
    run over the same source must append NOTHING (offset bookkeeping)."""
    from collections import Counter

    from biokg_spark.datagen import entity_lexicon
    from biokg_spark.operators.mentions import scan_mentions
    from biokg_spark.streaming.ingest import incremental_mentions

    tx = transcripts(spark, n_conversations=12)
    lex = entity_lexicon(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    tx.write.parquet(src)

    stream = spark.readStream.schema(tx.schema).parquet(src)
    q = incremental_mentions(stream, lex, out, ckpt)
    q.awaitTermination(120)

    cols = ["conv_id", "turn_idx", "surface", "entity_id"]
    got = Counter(tuple(r) for r in spark.read.parquet(out).select(*cols).collect())
    want = Counter(tuple(r) for r in scan_mentions(tx, lex).select(*cols).collect())
    assert got == want and got

    # replay: same source, same checkpoint -> no duplicate appends
    q2 = incremental_mentions(
        spark.readStream.schema(tx.schema).parquet(src), lex, out, ckpt
    )
    q2.awaitTermination(120)
    again = Counter(tuple(r) for r in spark.read.parquet(out).select(*cols).collect())
    assert again == want
