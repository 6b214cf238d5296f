#!/usr/bin/env python
"""Full-registry performance sweep — the source of docs/SCALING.md's
"all N operators" tables.

Runs EVERY registered query twice (cold plan, then steady) against
``SF_DIR`` on ``local[CPUS]`` and prints per-op steady timings sorted
worst-first plus the cold/steady totals. Failures are reported, never
swallowed — a sweep with failures exits non-zero.

Usage:
    python tools/registry_sweep.py [SF_DIR] [CPUS] [TOP_N]

Method notes: each timing includes DataFrame re-construction AND
collect(), so numbers are full-recompute costs (bench.py's prebuilt
method reuses shuffle stages and reads lower — both are real, they
answer different questions). Back-to-back execution means mild cross-op
contention; re-measure outliers in isolation before acting on them.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"
TOP_N = int(sys.argv[3]) if len(sys.argv) > 3 else 15

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as m  # noqa: E402

qs = m.queries()
failures: list[str] = []


def sweep(label: str) -> tuple[dict[str, float], float]:
    timings: dict[str, float] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, SF).collect()
            timings[name] = time.time() - t0
        except Exception as exc:  # report, keep sweeping
            failures.append(f"{label}:{name}")
            print(f"FAIL {label} {name}: {type(exc).__name__}: {exc}"[:300])
    return timings, time.time() - t_all


_, t_cold = sweep("cold")
steady, t_steady = sweep("steady")

print(f"\nSWEEP ops={len(qs)} sf={SF} cpus={CPUS} "
      f"cold={t_cold:.0f}s steady={t_steady:.0f}s failures={len(failures)}")
print(f"worst {TOP_N} steady (full-recompute):")
for v, k in sorted(((v, k) for k, v in steady.items()), reverse=True)[:TOP_N]:
    print(f"  {k}: {v:.2f}s")

sys.exit(1 if failures else 0)
