"""Temporal/interval joins Spark lacks as built-ins: as-of and range join.

Not present in the reference (no timestamps there at all, SURVEY §2.8) —
these are the standard missing operators a transcript/event engine needs
(the task brief names them explicitly). Both are built from shuffle-
friendly primitives; neither ever degenerates to a cross join.

- ``asof_join``: for every left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented with the union+window
  trick: tag both sides, union, sort within key by (ts, right-first),
  carry the last-seen right payload forward with ``last(ignorenulls)``
  over an unbounded-preceding frame, keep left rows. ONE shuffle on the
  key — same cost as a groupBy, no join explosion, no per-row probing.
- ``range_join_binned``: equi-join accelerator for point-in-interval
  predicates. Intervals are exploded onto fixed-width bins, points land
  in exactly one bin, the join becomes an equi-join on (key?, bin) with
  a residual BETWEEN filter. Bin width trades replication (wide
  intervals → many bins) against candidate pruning; a cross/BNLJ never
  appears in the plan.
- ``sessionize``: split each key's ordered event stream into sessions
  at idle gaps > a threshold — the episode segmentation an agent-
  transcript pipeline needs before per-episode extraction. Lag + a
  cumulative sum of gap flags over ONE window shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row's time.

    ``right_cols``: payload columns carried from the right side (default:
    everything except the key and timestamp). Left rows with no prior
    right row keep NULL payloads (left-outer semantics, like DuckDB's
    ``ASOF LEFT JOIN``). ``tolerance``: optional max staleness as an SQL
    interval string (e.g. ``'3600 seconds'``) — matches older than that
    become NULL.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        on, ts_col, *right_cols
    ).withColumn("_side", F.lit(0))
    # align schemas: left gets NULL right-payload columns, right gets NULL
    # left-payload columns
    left_cols = [c for c in left.columns if c not in (on, ts_col)]
    for c in right_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_sel = [F.col(on), F.col(ts_col), F.lit(0).alias("_side")]
    r_sel += [F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols]
    r_sel += [F.col(c).alias(f"_r_{c}") for c in right_cols]
    unioned = l_tag.select(
        on, ts_col, "_side", *left_cols, *[f"_r_{c}" for c in right_cols]
    ).unionByName(r_tag.select(*r_sel))
    # right rows sort before left rows at equal ts => <= semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias("_match_ts"),
    )
    out = carried.where(F.col("_side") == 1)
    stale: Column = F.lit(False)
    if tolerance is not None:
        stale = F.col("_match_ts") < F.col(ts_col) - F.expr(
            f"INTERVAL {tolerance}"
        )
    sel = [F.col(on), F.col(ts_col), *left_cols]
    sel += [
        F.when(stale, F.lit(None)).otherwise(F.col(f"_c_{c}")).alias(c)
        for c in right_cols
    ]
    return out.select(*sel)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join via fixed-width binning.

    Every interval row is exploded onto the bins it overlaps; every point
    lands in exactly one bin; the equi-join on (keys + bin) prunes to
    co-binned candidates and the residual BETWEEN keeps exact matches.
    Result: one row per (point row × matching interval row), inner
    semantics, no duplicates (each pair meets in exactly the point's bin).
    """
    keys = keys or []
    p_bin = F.floor(F.col(point_col) / bin_width).cast("long")
    binned_points = points.withColumn("_bin", p_bin)
    spread = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    cond = [binned_points["_bin"] == spread["_bin"]] + [
        binned_points[k] == spread[k] for k in keys
    ]
    joined = binned_points.join(spread, cond).where(
        binned_points[point_col].between(spread[lo_col], spread[hi_col])
    )
    return joined.drop(spread["_bin"]).drop(binned_points["_bin"]).drop(
        *[spread[k] for k in keys]
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a per-key session index: a new session starts whenever the
    time since the previous event of the same key exceeds ``gap_seconds``.

    ``order_cols``: extra deterministic tiebreak columns appended after
    the timestamp in the within-key ordering (pass a unique id when
    timestamps can collide — required for a reproducible session_idx).

    Output: the input columns plus ``session_idx`` (0-based per key).
    Plan shape: ONE shuffle on ``key`` serves both the lag and the
    running sum (same window spec, Catalyst evaluates them in one Window
    operator) — the standard sessionization used before any per-episode
    aggregation. At 100 TB the state per key is a single row (the
    previous timestamp), so skewed keys cost sort time, not memory.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # NTZ timestamps (parquet default) refuse a direct long cast in
    # Spark 4 — hop through timestamp_ltz (session TZ, UTC here) first;
    # plain timestamps/longs pass through the double cast unchanged
    def _secs(c):
        return c.cast("timestamp_ltz").cast("long")

    gap = _secs(F.col(ts_col)) - _secs(prev_ts)
    is_new = F.when(gap > gap_seconds, 1).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn(
        "session_idx", F.sum(is_new).over(running).cast("int")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: how far does each user progress through
    ``steps``, requiring STRICTLY increasing timestamps between stages?

    The classic product-analytics operator (and, over agent transcripts,
    the tool-chain progression question: reached plan -> act -> verify?).
    Stage k's timestamp is the EARLIEST event of type ``steps[k]`` after
    the user's stage-k-1 timestamp — the standard greedy matching, which
    maximizes completion (an earlier stage match can only admit more
    later matches).

    Output: (user_col, reached int, t{k}_us long ...) — one row per user
    seen in ``events``; ``t{k}_us`` is stage k+1's timestamp in epoch
    MICROS (a long: engines format timestamp STRINGS differently, longs
    compare exactly), NULL from the first missed stage on.

    Scale shape: one conditional min-aggregate per stage, each a
    map-side-partial HashAggregate on the user key, chained by equi-joins
    on that same key (co-partitioned after the first shuffle — Catalyst
    reuses the hash partitioning, so stages 2..k add no new exchange of
    the events table; AQE handles user-skew). Never a self-join on time,
    never a window over the full event stream.
    """
    ev = events.select(F.col(user_col), F.col(type_col), F.col(ts_col))
    acc = ev.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).alias("_t0")
    )
    for k in range(1, len(steps)):
        prev = f"_t{k - 1}"
        acc = (
            ev.join(acc, user_col)
            .groupBy(user_col, *[f"_t{j}" for j in range(k)])
            .agg(
                F.min(
                    F.when(
                        (F.col(type_col) == steps[k])
                        & (F.col(ts_col) > F.col(prev)),
                        F.col(ts_col),
                    )
                ).alias(f"_t{k}")
            )
        )
    reached = F.lit(0)
    for k in range(len(steps)):
        reached = F.when(F.col(f"_t{k}").isNotNull(), k + 1).otherwise(reached)
    return acc.select(
        user_col,
        reached.cast("int").alias("reached"),
        *[
            # parquet timestamps read as TIMESTAMP_NTZ; the engine session
            # pins spark.sql.session.timeZone=UTC (session.py), so the
            # cast to TIMESTAMP reinterprets the same wall time and
            # unix_micros equals DuckDB's epoch_us on the naive value
            F.unix_micros(F.col(f"_t{k}").cast("timestamp")).alias(f"t{k + 1}_us")
            for k in range(len(steps))
        ],
    )


def burst_detection(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    trailing: int = 3,
    factor: float = 1.5,
    min_count: int = 5,
) -> DataFrame:
    """Per-key temporal burst detection vs a trailing baseline.

    Buckets each key's events to ``bucket`` granularity, then flags a
    bucket as a burst when its count is ≥ ``factor`` × the mean of the
    previous ``trailing`` OBSERVED buckets (rows-based window — gaps in
    the timeline don't dilute the baseline; the semantics is "vs the
    last N active periods") and ≥ ``min_count`` absolute. The first
    buckets of a key (no trailing history yet) are never bursts. This is
    the spike audit a temporal KG needs before trusting a sudden pile of
    extracted edges (reference has no timestamps at all, SURVEY §2.8 —
    engine addition).

    Plan shape at 100 TB: ONE HashAggregate on (key, bucket) does all
    the data-sized work with map-side partial counts — the window runs
    on the aggregated table (buckets × keys rows, ~10^6 even for years
    of hourly buckets over 10^4 keys), so the per-key sort is trivial.
    Output bucket is an ISO string (artifact convention: no timestamps
    in oracle-compared outputs).
    """
    counts = events.groupBy(
        F.col(key_col),
        F.date_trunc(bucket, F.col(ts_col)).alias("_b"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(-trailing, -1)
    )
    return counts.select(
        key_col,
        F.date_format("_b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "cnt",
        F.round(F.avg("cnt").over(w), 4).alias("baseline"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    ).select(
        key_col,
        "bucket",
        "cnt",
        "baseline",
        (
            (F.col("n_trailing") == trailing)
            & (F.col("cnt") >= factor * F.col("baseline"))
            & (F.col("cnt") >= min_count)
        ).alias("is_burst"),
    )


def sliding_rollup(
    events: DataFrame,
    width_slides: int,
    slide_seconds: int,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Hopping (sliding) event-time windows: per-key counts over
    overlapping windows of ``width_slides × slide_seconds`` seconds
    hopping every ``slide_seconds`` — the overlapping counterpart of
    :mod:`rollup`'s tumbling multi-grain pass (trend smoothing, rate
    limits, "last 7 days, daily" style serving tables).

    Implemented as an explode of each event onto the ``width_slides``
    windows that contain it (epoch-aligned starts, the same alignment
    ``F.window`` uses) followed by ONE map-side-partial HashAggregate
    on (key, window_start). Replication factor IS width/slide — the
    knob the caller already chose; there is no hidden blowup beyond
    it, and no self-join. Window starts are emitted as epoch seconds
    (BIGINT) so cross-engine comparison avoids timestamp formatting.
    """
    keys = list(key_cols or [])
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1_000_000.0)
    base = (F.floor(epoch / slide_seconds)).cast("long")
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(width_slides - 1)),
        lambda j: (base - j) * slide_seconds,
    )
    return (
        events.select(*keys, F.explode(starts).alias("window_start"))
        .groupBy(*keys, "window_start")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def decay_weighted_counts(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    half_life_seconds: int = 7 * 86400,
    decimals: int = 4,
) -> DataFrame:
    """Recency-decayed support per key: score = Σ 0.5^(Δt / half-life),
    Δt measured back from the NEWEST event in the frame.

    The temporal-KG edge-confidence aggregate: an edge seen 500× last
    year and one seen 5× this morning need a common currency; an
    exponential half-life is the standard one (and is MERGEABLE —
    partial sums decay-shift correctly, so the map-side partial
    aggregate below is exact, unlike a sliding hard cutoff). The
    reference time is the corpus max timestamp, joined in-plan as a
    1-row broadcast scalar (the BM25/TF-IDF pattern — no driver
    collect).

    Plan: one 1-row global agg + broadcast cross + ONE partial+final
    HashAggregate on the key. Double buffers — hash-aggregable.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ref = events.agg(F.max(us).alias("_ref_us"))
    halved = (F.col("_ref_us") - us) / F.lit(half_life_seconds * 1_000_000.0)
    return (
        events.crossJoin(F.broadcast(ref))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.pow(F.lit(0.5), halved)), decimals).alias(
                "decay_score"
            ),
        )
    )
