from datetime import datetime

from biokg_spark.operators.temporal import asof_join, range_join_binned


def _t(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            ("u1", _t("2024-01-01 10:00:00"), "e1"),
            ("u1", _t("2024-01-01 12:00:00"), "e2"),
            ("u2", _t("2024-01-01 09:00:00"), "e3"),
        ],
        "user_id string, ts timestamp, event string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _t("2024-01-01 09:30:00"), 100.0),
            ("u1", _t("2024-01-01 11:00:00"), 200.0),
            ("u2", _t("2024-01-01 09:00:00"), 50.0),  # equal ts -> matches (<=)
        ],
        "user_id string, ts timestamp, price double",
    )
    out = {
        (r.user_id, r.event): r.price
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert out == {("u1", "e1"): 100.0, ("u1", "e2"): 200.0, ("u2", "e3"): 50.0}


def test_asof_join_no_prior_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", _t("2024-01-01 08:00:00"), "early"),
         ("u1", _t("2024-01-01 20:00:00"), "late")],
        "user_id string, ts timestamp, event string",
    )
    right = spark.createDataFrame(
        [("u1", _t("2024-01-01 09:00:00"), 1.0)],
        "user_id string, ts timestamp, price double",
    )
    out = {r.event: r.price for r in asof_join(left, right, on="user_id").collect()}
    assert out == {"early": None, "late": 1.0}  # no prior row -> NULL
    tol = {
        r.event: r.price
        for r in asof_join(left, right, on="user_id", tolerance="2 HOURS").collect()
    }
    assert tol == {"early": None, "late": None}  # 11h stale > 2h tolerance


def test_asof_matches_duckdb_oracle(spark):
    """Cross-engine check on a bigger derived input: DuckDB ASOF JOIN is
    the ground truth."""
    import duckdb

    from biokg_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    left = ev.where("event_type = 'click'").select("user_id", "ts", "event_id")
    right = ev.where("event_type = 'purchase'").select("user_id", "ts", "value")
    got = {
        (r.user_id, r.event_id): (None if r.value is None else round(r.value, 4))
        for r in asof_join(left, right, on="user_id").collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want_rows = con.execute("""
        WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type='click'),
             r AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase')
        SELECT l.user_id, l.event_id, r.value
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
    """).fetchall()
    want = {
        (u, e): (None if v is None else round(v, 4)) for u, e, v in want_rows
    }
    assert got == want and got


def test_range_join_binned(spark):
    points = spark.createDataFrame(
        [(1, 0.5), (2, 3.7), (3, 9.99), (4, 20.0)], "pid int, v double"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 1.0), ("b", 3.0, 10.0), ("c", 9.5, 25.0)],
        "name string, lo double, hi double",
    )
    out = range_join_binned(points, intervals, "v", bin_width=2.0)
    got = {(r.pid, r.name) for r in out.collect()}
    assert got == {(1, "a"), (2, "b"), (3, "b"), (3, "c"), (4, "c")}
    # no duplicate pairs despite interval bin replication
    assert out.count() == len(got)


def test_range_join_binned_matches_plain_sql(spark):
    from pyspark.sql import functions as F

    from biokg_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "value").where(
        "value IS NOT NULL"
    )
    iv = (
        load_table(spark, sf, "supplier")
        .select(
            F.col("s_suppkey").alias("name"),
            (F.col("s_acctbal") % 50).alias("lo"),
            (F.col("s_acctbal") % 50 + 5).alias("hi"),
        )
    )
    fast = range_join_binned(ev, iv, "value", bin_width=7.0)
    slow = ev.join(iv, ev.value.between(iv.lo, iv.hi))
    assert fast.count() == slow.count()


def test_sessionize_gap_boundary(spark):
    from biokg_spark.operators.temporal import sessionize

    rows = [
        ("u1", _t("2024-01-01 00:00:00"), 1),
        ("u1", _t("2024-01-01 00:30:00"), 2),  # gap = 1800 = threshold: same
        ("u1", _t("2024-01-01 01:00:01"), 3),  # gap = 1801 > threshold: new
        ("u2", _t("2024-01-05 00:00:00"), 4),  # other key: own session 0
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, event_id int")
    out = sessionize(df, key="user", gap_seconds=1800, order_cols=["event_id"])
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_sessionize_tiebreak_deterministic(spark):
    from biokg_spark.operators.temporal import sessionize

    # equal timestamps: event_id orders them; all in one session
    t = _t("2024-01-01 00:00:00")
    rows = [("u1", t, i) for i in (3, 1, 2)]
    df = spark.createDataFrame(rows, "user string, ts timestamp, event_id int")
    out = sessionize(df, key="user", gap_seconds=60, order_cols=["event_id"])
    assert {r.session_idx for r in out.collect()} == {0}


# ---------------------------------------------------------------------------
# funnel_steps: ordered stage progression
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering_and_greedy(spark):
    from datetime import datetime

    from biokg_spark.operators.temporal import funnel_steps

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # u1 completes in order: view@1 click@2 purchase@3
        (1, "view", ts(1)), (1, "click", ts(2)), (1, "purchase", ts(3)),
        # u2: purchase BEFORE click -> stops at click... view@1 click@5 purchase@2
        (2, "view", ts(1)), (2, "purchase", ts(2)), (2, "click", ts(5)),
        # u3: click before view -> only stage 1 (view@4), no later click
        (3, "click", ts(2)), (3, "view", ts(4)),
        # u4: no view at all
        (4, "click", ts(1)), (4, "purchase", ts(2)),
        # u5: greedy earliest view admits the click between the two views
        (5, "view", ts(1)), (5, "view", ts(9)), (5, "click", ts(3)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.user_id: (r.reached, r.t1_us, r.t2_us, r.t3_us)
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }

    def us(s):
        return int(datetime(2024, 1, 1, 0, 0, s).timestamp() * 1_000_000)

    assert got[1] == (3, us(1), us(2), us(3))
    assert got[2][0] == 2 and got[2][3] is None  # purchase@2 not after click@5
    assert got[3] == (1, us(4), None, None)
    assert got[4] == (0, None, None, None)
    assert got[5] == (2, us(1), us(3), None)
    assert len(got) == 5


def test_burst_detection_planted(spark):
    from datetime import datetime

    from biokg_spark.operators.temporal import burst_detection

    def day(d):
        return datetime(2024, 3, d, 12, 0, 0)

    rows = []
    # key 'e': 10/day for days 1-3, burst of 30 on day 4, back to 10 day 5
    for d, n in [(1, 10), (2, 10), (3, 10), (4, 30), (5, 10)]:
        rows += [("e", day(d))] * n
    # key 'f': climbing but under 1.5x baseline -> never a burst
    for d, n in [(1, 10), (2, 11), (3, 12), (4, 13)]:
        rows += [("f", day(d))] * n
    # key 'g': doubles on day 4 but below min_count=5
    for d, n in [(1, 2), (2, 2), (3, 2), (4, 4)]:
        rows += [("g", day(d))] * n
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = burst_detection(
        ev, bucket="day", trailing=3, factor=1.5, min_count=5
    ).collect()
    bursts = {(r.event_type, r.bucket) for r in out if r.is_burst}
    assert bursts == {("e", "2024-03-04 00:00:00")}
    by_key = {}
    for r in out:
        by_key.setdefault(r.event_type, []).append(r)
    # first 3 buckets of every key lack a full trailing window -> never burst
    for rs in by_key.values():
        rs.sort(key=lambda r: r.bucket)
        assert all(not r.is_burst for r in rs[:3])
    # day-4 baseline for 'e' is mean(10,10,10)=10
    e4 = next(r for r in out if r.event_type == "e" and r.bucket == "2024-03-04 00:00:00")
    assert e4.cnt == 30 and e4.baseline == 10.0


def test_sliding_rollup_overlap(spark):
    from datetime import datetime

    from biokg_spark.operators.temporal import sliding_rollup

    rows = [
        ("a", datetime(2024, 1, 2, 5, 0, 0)),   # day 19724
        ("a", datetime(2024, 1, 3, 5, 0, 0)),   # day 19725
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r.event_type, r.window_start): r.cnt
        for r in sliding_rollup(ev, 2, 86400, ["event_type"]).collect()
    }
    d2, d3 = 19724 * 86400, 19725 * 86400
    # each event lands in its own day's window and the previous day's;
    # the shared window (starting day 2... wait) — window starting at
    # d2 covers [d2, d2+2d): both events; d3 covers only the second;
    # d1 covers only the first
    assert out == {
        ("a", d2 - 86400): 1,
        ("a", d2): 2,
        ("a", d3): 1,
    }


def test_decay_weighted_counts_halving(spark):
    from datetime import datetime

    from biokg_spark.operators.temporal import decay_weighted_counts

    rows = [
        ("e", datetime(2024, 1, 8, 0, 0, 0)),  # ref (newest): weight 1
        ("e", datetime(2024, 1, 1, 0, 0, 0)),  # exactly one half-life: 0.5
        ("f", datetime(2023, 12, 25, 0, 0, 0)),  # two half-lives: 0.25
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r.event_type: (r.n_events, r.decay_score)
        for r in decay_weighted_counts(ev, ["event_type"], half_life_seconds=7 * 86400).collect()
    }
    assert got == {"e": (2, 1.5), "f": (1, 0.25)}
