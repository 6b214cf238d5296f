"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``storm_netmonitor_spark/``; operators register
themselves into the registry (one entry per SURVEY.md §2 operator).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from storm_netmonitor_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_group_pricing, TPC-H-Q1 shape) on sf0.001."""
    return registry.QUERIES["agg_group_pricing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered for the driver's capped per-round correctness window: fixed
    red rows first, operators without a driver verdict yet next, already
    driver-verified ones last (see registry.driver_ordered)."""
    return registry.driver_ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each hash-checkable query; non-SQL-expressible ops
    are absent (driver records the weaker rows-only check). Lazy oracles
    (data-derived constants) resolve here — against the driver's pinned
    sf0.01 or ``$SPARK_GRAFT_ORACLE_SF_DIR`` — not at import."""
    ordered = registry.driver_ordered(dict(registry.ORACLES))
    return {n: registry.resolve_oracle(n) for n in ordered}
