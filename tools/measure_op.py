#!/usr/bin/env python
"""Per-operator measurement harness for the r14 optimization round.

Times NAMED registered queries with the EXACT bench.py method (engine
session, ``WARMUPS``/``WARMUPS_RERUN`` warm-ups, median of ``RUNS``
timed samples, RERUN_FULL ops re-invoked per sample) and additionally
records the WARM Spark job count of one post-warm-up run via
``statusTracker`` over a job group — the deterministic structural
signal quoted when wall noise exceeds the effect (OPTIMIZATION_r14.md
method section).

Usage:
    python tools/measure_op.py QUERY [QUERY ...]

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32). Prints one JSON line per query:
``{"query": ..., "median_s": ..., "samples": [...], "warm_jobs": N}``.
A/B comparisons should run this in ALTERNATING fresh processes
(B,A,B,A) and compare min-of-medians (host-noise discipline).

CAVEAT (ADVICE r14 #5): ``warm_jobs`` counts jobs via a driver-thread
job group, which streaming drains submit from stream-execution threads
— the count UNDERCOUNTS for foreachBatch/streaming ops. For those,
quote per-batch ``durationMs`` from ``tools/profile_drain.py`` (a
StreamingQueryListener — thread-independent) instead.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (WARMUPS/RUNS/RERUN_FULL — one method source)
from storm_netmonitor_spark import registry  # noqa: E402
from storm_netmonitor_spark.session import (  # noqa: E402
    get_spark,
    quiet_expected_warnings,
)

names = sys.argv[1:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

registry.load_all()
spark = get_spark(app_name="nm-measure-op")
quiet_expected_warnings(spark)
sc = spark.sparkContext

# the bench's dedicated session warm-up, so the first op's samples are
# op cost rather than JVM/session warm-up
spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).groupBy(
    "n_regionkey"
).count().collect()

for name in names:
    fn = registry.QUERIES[name]
    rerun = name in bench.RERUN_FULL
    df = None if rerun else fn(spark, sf_dir)
    for _ in range(bench.WARMUPS_RERUN if rerun else bench.WARMUPS):
        (fn(spark, sf_dir) if rerun else df).collect()
    samples = []
    for _ in range(bench.RUNS):
        t0 = time.perf_counter()
        (fn(spark, sf_dir) if rerun else df).collect()
        samples.append(round(time.perf_counter() - t0, 4))
    group = f"measure_{name}"
    sc.setJobGroup(group, "r14 per-op job-count audit")
    try:
        (fn(spark, sf_dir) if rerun else df).collect()
    finally:
        sc.setJobGroup("measure_done", "sentinel")
    warm_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    print(
        json.dumps(
            {
                "query": name,
                "median_s": round(statistics.median(samples), 4),
                "samples": samples,
                "warm_jobs": warm_jobs,
                "load": [round(v, 2) for v in os.getloadavg()],
            }
        ),
        flush=True,
    )
