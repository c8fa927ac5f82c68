"""Incremental KG construction over a transcript stream.

The reference's only incrementality is md5-skip re-runs (main.py:91-98);
the engine adds true streaming increments: new transcript turns flow
through the SAME Arrow-batched mention scanner as the batch pipeline and
append into the same mentions table layout. ``foreachBatch`` bridges the
stream to arbitrary batch sinks while keeping exactly-once bookkeeping in
the streaming checkpoint (source offsets + batch id), so a restart never
re-appends a processed micro-batch.

Downstream (links/quads/metadata) stay batch jobs over the growing
mentions table — the reference lifecycle's compile stage re-run on the
incremented input, resumable via the checkpoint manifests as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from biokg_spark.operators.mentions import scan_mentions


def incremental_mentions(
    turns_stream: DataFrame,
    lexicon: DataFrame,
    out_path: str,
    checkpoint_path: str,
    backend: str = "ac",
) -> StreamingQuery:
    """Stream transcript turns → mention rows appended to ``out_path``.

    The scan itself is the batch operator (scan_mentions) applied inside
    ``foreachBatch`` — one code path for batch and streaming, per-batch
    parquet appends, offsets tracked in ``checkpoint_path``.
    """

    def append_batch(batch_df: DataFrame, _batch_id: int) -> None:
        mentions = scan_mentions(batch_df, lexicon, backend=backend)
        mentions.write.mode("append").parquet(out_path)

    return (
        turns_stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
