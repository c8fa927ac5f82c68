"""FAIR-scheduler pool wiring (session.py + KGPipeline background stages).

The pipeline overlaps the turn_sets-independent output families with the
critical mentions→turn_sets chain as concurrently-submitted Spark jobs.
Under FIFO that overlap steals task slots from the critical path at high
parallelism; the engine therefore runs sessions in FAIR mode with a
weighted "default" (critical, weight 8) and "background" (weight 1)
pool, and background stages opt in via a thread-local pool property.
These tests pin the contract so a config regression (lost allocation
file, renamed pool, property leaking into the caller thread) is caught
without needing a timing-sensitive benchmark.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from biokg_spark.session import BACKGROUND_POOL


def _pools(spark):
    root = spark.sparkContext._jsc.sc().getAllPools()
    return {
        p.name(): p.weight() for p in [root.apply(i) for i in range(root.length())]
    }


def test_session_runs_fair_with_weighted_pools(spark):
    sc = spark.sparkContext
    assert sc.getConf().get("spark.scheduler.mode") == "FAIR"
    pools = _pools(spark)
    # critical pool outweighs background 8:1; both exist from the
    # allocation file (not lazily created with default weight 1)
    assert pools["default"] == 8
    assert pools[BACKGROUND_POOL] == 1


def test_background_pool_property_set_and_restored(spark, tmp_path):
    """_run_in_background_pool sets the thread-local pool property for the
    duration of the checkpointed build and clears it afterwards — and the
    MAIN thread's property is never touched (pinned-thread mode keeps
    local properties per Python thread)."""
    from biokg_spark.plans.checkpoint import CheckpointManager
    from biokg_spark.pipeline.kg import KGPipeline

    pipe = KGPipeline.__new__(KGPipeline)  # wiring-only: no lexicon needed
    pipe.spark = spark
    pipe.ckpt = CheckpointManager(spark, str(tmp_path))

    sc = spark.sparkContext
    seen: dict[str, str | None] = {}

    def build():
        seen["during"] = sc.getLocalProperty("spark.scheduler.pool")
        return spark.range(10).toDF("id")

    def run_in_worker():
        out = pipe._run_in_background_pool("bgstage", "fp0", build, None)
        seen["after"] = sc.getLocalProperty("spark.scheduler.pool")
        return out.count()

    with ThreadPoolExecutor(max_workers=1) as pool:
        assert pool.submit(run_in_worker).result() == 10

    assert seen["during"] == BACKGROUND_POOL
    assert seen["after"] is None
    assert sc.getLocalProperty("spark.scheduler.pool") is None  # main thread


def test_scaling_report_contract(capsys):
    """The SCALING artifact line: efficiency = (thr_hi / thr_lo) / (hi/lo),
    pass at >=0.8, cycles included when the interleaved protocol ran."""
    import json

    import bench

    results = {
        2: {"turns_per_sec": 20000.0, "wall_sec": 450.0},
        8: {"turns_per_sec": 66000.0, "wall_sec": 136.4},
    }
    cycles = [{"cycle": 0, "walls": {"2": 450.0, "8": 136.4},
               "paired_efficiency": 0.825}]
    bench._emit_scaling_report((2, 8), results, 9_000_754,
                               mode="interleaved-pinned", cycles=cycles)
    report = json.loads(capsys.readouterr().out.strip())
    assert report["value"] == round((66000 / 20000) / 4, 3) == 0.825
    assert report["pass"] is True
    assert report["mode"] == "interleaved-pinned"
    assert report["cycles"] == cycles
    assert report["criterion"].startswith(">=0.8")
