#!/usr/bin/env python
"""Capture ``.explain("formatted")`` of registered queries to files.

Usage:
    python tools/capture_plan.py OUT_SUFFIX QUERY [QUERY ...]

Writes ``plans/$NM_PLAN_ROUND/<query>_<OUT_SUFFIX>.txt`` (default r15) for each query, built with
the engine session against ``$SPARK_GRAFT_SF_DIR`` (default sf0.1).
Drained/rewritten ops (RERUN_FULL class) return local relations — their
plan file records that shape; the measured evidence for them is the
phase/batch-wall numbers in OPTIMIZATION_r14.md.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from storm_netmonitor_spark import registry  # noqa: E402
from storm_netmonitor_spark.session import get_spark, quiet_expected_warnings  # noqa: E402

registry.load_all()
spark = get_spark(app_name="nm-plan-capture")
quiet_expected_warnings(spark)

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("NM_PLAN_ROUND", "r15"))
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines)")
