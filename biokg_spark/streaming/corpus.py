"""Streaming corpus dedup: exactly-once first-writer-wins over a doc stream.

The streaming twin of ``operators/dedup.py::delta_dedup``: documents
arrive in micro-batches and each batch is deduplicated against (a) the
fingerprints already KEPT by earlier batches and (b) itself — so across
the whole stream exactly ONE document survives per distinct content,
and it is the first-arriving one (min id within its arrival batch).
This is the ingestion-time dedup a crawl pipeline runs so the corpus
store never accumulates duplicates in the first place.

Exactly-once follows the same idempotent-sink discipline as
``streaming/ingest.py``: each micro-batch writes its FULL status output
(keep / dup_corpus / dup_delta) to its own ``batch_id=N`` partition
with overwrite semantics, and the corpus index a batch dedups against
is read back from partitions ``batch_id < N`` ONLY — so a replayed
batch (foreachBatch is at-least-once) sees exactly the same prior
index, recomputes exactly the same statuses, and overwrites its own
partition with identical content instead of appending duplicates.

Scale shape per micro-batch: work is proportional to the BATCH (one
survivor HashAggregate over batch fingerprints, one fp equi-join
against the index — the index read is a two-column scan that prunes to
``status = 'keep'`` rows, and at warehouse scale is a bucketed/compacted
fingerprint table rather than re-derived partitions). The corpus text
is never rescanned; nothing is collected to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from biokg_spark.operators.dedup import delta_dedup_against_index


def streaming_dedup(
    docs_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Stream documents → per-batch dedup statuses under ``out_path``.

    Readers load ``out_path`` with partition discovery and filter
    ``status = 'keep'`` for the deduplicated corpus view; the
    ``batch_id`` partition column is arrival provenance.
    """

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        has_prior = os.path.isdir(out_path) and any(
            e.startswith("batch_id=") for e in os.listdir(out_path)
        )
        if has_prior:
            index = (
                spark.read.parquet(out_path)
                .where((F.col("batch_id") < batch_id) & (F.col("status") == "keep"))
                .select("fingerprint")
            )
        else:
            index = spark.createDataFrame([], "fingerprint string")
        out = delta_dedup_against_index(index, batch_df, text_col, id_col)
        out.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
