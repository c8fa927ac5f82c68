"""Host-speed calibration probes for benchmark artifacts.

The sandbox host's deliverable throughput swings 1.5-2.5x (observed up
to ~5x) between windows on the SAME day (BASELINE.md protocol notes;
round 3's BENCH e2e read 62.8 s while the same code ran 12.3 s seventy
minutes earlier). A wall-clock number without a calibration constant is
therefore ambiguous: a reader cannot tell a host stall from a code
regression. Every BENCH/SINGLENODE/SCALING artifact embeds the probes
below so round-over-round comparisons can be host-normalized.

Two probes, both constant-work and deterministic:

- ``cpu_probe``: a fixed single-thread pure-Python arithmetic loop
  (no allocation, no I/O). Measures the Python interpreter rate the
  hypervisor is actually delivering to one core.
- ``spark_probe``: a tiny fixed Spark job (``range -> sum`` inside
  whole-stage codegen, one partition). Measures delivered JVM
  single-core throughput plus constant job-scheduling overhead.

Both report min-of-k wall seconds (min converges on the machine's true
rate under random stalls) and a ``slowdown`` factor relative to a
reference wall measured in a healthy window on this host class —
slowdown ~1.0 means a healthy window, ~2-5 means a stall window and
absolute walls in the same artifact should be read accordingly.
"""

from __future__ import annotations

import time

# Reference walls measured in a healthy window (2026-08-17, idle host,
# min-of-5). These are CONSTANTS OF THE ARTIFACT FORMAT, not targets:
# slowdown = measured / reference, so 1.0 ~= the window round-3/4
# numbers were calibrated in.
REF_CPU_PROBE_SEC = 0.355
REF_SPARK_PROBE_SEC = 0.23

_CPU_N = 5_000_000


def _cpu_once() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(_CPU_N):
        acc += i * i & 0xFFFF
    if acc < 0:  # keep `acc` live
        raise AssertionError
    return time.perf_counter() - t0


def cpu_probe(reps: int = 3) -> dict:
    """Single-thread Python busy-loop: fixed work, min-of-k wall."""
    best = min(_cpu_once() for _ in range(reps))
    return {
        "wall_sec": round(best, 4),
        "ref_sec": REF_CPU_PROBE_SEC,
        "slowdown": round(best / REF_CPU_PROBE_SEC, 2),
    }


def spark_probe(spark, reps: int = 3) -> dict:
    """Tiny constant Spark job: 50M-row codegen sum on ONE partition
    (single-core JVM rate; independent of local[N])."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 1).select(
            F.sum((F.col("id") * 2 + 1) % 97)
        ).collect()
        return time.perf_counter() - t0

    best = min(once() for _ in range(reps))
    return {
        "wall_sec": round(best, 4),
        "ref_sec": REF_SPARK_PROBE_SEC,
        "slowdown": round(best / REF_SPARK_PROBE_SEC, 2),
    }


def multicore_probe(n_procs: int = 8, reps: int = 2) -> dict:
    """Delivered MULTI-core throughput: run the same busy loop in
    ``n_procs`` processes at once and report parallel efficiency
    (single_wall / parallel_wall — 1.0 = n_procs full cores delivered).

    This closes the single-core probes' blind spot: round 4 measured a
    window where single-core slowdown read a healthy ~1.1 while the
    8-core pipeline leg ran ~1.5x slow — the hypervisor was throttling
    multi-core burst, which only a concurrent probe can see."""
    import multiprocessing as mp

    single = min(_cpu_once() for _ in range(reps))
    best = None
    for _ in range(reps):
        procs = [mp.Process(target=_cpu_once) for _ in range(n_procs)]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        wall = time.perf_counter() - t0
        best = wall if best is None else min(best, wall)
    return {
        "n_procs": n_procs,
        "single_wall_sec": round(single, 4),
        "parallel_wall_sec": round(best, 4),
        "efficiency": round(single / best, 2),
    }


def host_calibration(spark=None, reps: int = 3, multicore: int | None = None) -> dict:
    """CPU (+ optional Spark and multi-core) probes. Pass ``multicore=N``
    to also measure delivered N-core parallel efficiency — do this in
    any artifact whose measured section uses >1 core."""
    cal = {"cpu": cpu_probe(reps)}
    if spark is not None:
        cal["spark"] = spark_probe(spark, reps)
    if multicore:
        cal["multicore"] = multicore_probe(multicore)
    return cal
