"""Structured Streaming ingestion of transcript turns.

The reference is strictly batch (SURVEY.md §2.10) and the north rule is a
batch pipeline, so streaming is a thin incremental-ingest layer, not a
core path: a file-source stream of transcript turns feeding the same
mention logic, with watermarked windowed counts for late turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_mention_counts(
    turns_stream: DataFrame,
    surface_literals: list[str],
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed per-entity mention counts over a streaming turn source.

    Uses a pure-column containment test (no UDF) so the streaming plan
    stays stateless until the windowed aggregate; late data beyond the
    watermark is dropped by the state store.
    """
    surf_arr = F.array(*[F.lit(s) for s in surface_literals])
    toks = F.split(F.lower(F.col("text")), "\\s+")
    hits = turns_stream.select(
        "ts",
        F.explode(
            F.filter(toks, lambda t: F.array_contains(surf_arr, t))
        ).alias("surface"),
    )
    return (
        hits.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "surface")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select("win.start", "win.end", "surface", "n_mentions")
    )


def sessionize_conversations(turns_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-conversation running session state.

    ``applyInPandasWithState`` keyed on conv_id: the state store carries
    (n_turns, min/max event time, turn-index checksum) across micro-batches
    and each batch emits the updated session row (Update mode). This is the
    streaming-incremental analog of the batch ingest stage's per-
    conversation bookkeeping — the turn-index sum lets a downstream
    consumer detect gaps (missing turns) without replaying history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("n_turns", LongType()),
            StructField("first_ts", TimestampType()),
            StructField("last_ts", TimestampType()),
            StructField("turn_idx_sum", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_turns", LongType()),
            StructField("min_ts", LongType()),
            StructField("max_ts", LongType()),
            StructField("idx_sum", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        n, mn, mx, s = state.get if state.exists else (0, None, None, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += int(pdf["turn_idx"].sum())
            ts_ns = pdf["ts"].astype("int64")
            lo, hi = int(ts_ns.min()), int(ts_ns.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        state.update((n, mn, mx, s))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n],
                "first_ts": [pd.Timestamp(mn)],
                "last_ts": [pd.Timestamp(mx)],
                "turn_idx_sum": [s],
            }
        )

    return (
        turns_stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: left rows pair with
    right rows of the same ``key`` whose event time falls in
    [left_ts + lower, left_ts + upper] — the streaming form of the
    batch as-of/range join (operators/temporal.py), e.g. enriching a
    turn stream with the tool-result events that follow it.

    Both sides carry a watermark and the join condition bounds
    right_ts relative to left_ts on BOTH ends — exactly what Spark's
    state store needs to evict: unbounded or one-sided conditions
    grow state forever (the documented stream-stream join trap).
    State per key is bounded by watermark + interval width. Inner
    join; append mode.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return lw.join(
        rw,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}")),
    )
