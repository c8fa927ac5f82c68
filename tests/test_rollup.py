from datetime import datetime

import pytest
from pyspark.sql import functions as F

from biokg_spark.operators.rollup import time_rollup


def test_time_rollup_multi_grain(spark):
    df = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 10, 5), "a", 1.0),
            (datetime(2024, 1, 1, 10, 55), "a", 2.0),
            (datetime(2024, 1, 1, 11, 0), "a", 4.0),
            (datetime(2024, 1, 2, 10, 0), "b", 8.0),
        ],
        "ts timestamp, k string, v double",
    )
    out = time_rollup(
        df, grains=("hour", "day"), keys=("k",),
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
    )
    rows = {(r.grain, r.bucket, r.k): (r.n, r.s) for r in out.collect()}
    assert rows[("hour", "2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert rows[("hour", "2024-01-01 11:00:00", "a")] == (1, 4.0)
    assert rows[("day", "2024-01-01", "a")] == (3, 7.0)
    assert rows[("day", "2024-01-02", "b")] == (1, 8.0)
    # one row per grain x bucket x key, nothing else
    assert len(rows) == 5


def test_time_rollup_unknown_grain(spark):
    df = spark.createDataFrame([(datetime(2024, 1, 1), "a")], "ts timestamp, k string")
    with pytest.raises(ValueError, match="unknown grains"):
        time_rollup(df, grains=("fortnight",))
