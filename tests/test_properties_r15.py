"""Hypothesis cross-checks for the round-15 staged kernels (the
r11–r14 staging precedent: every staged batch's decision arithmetic
gets a pure-python reference driven over arbitrary inputs BEFORE
registration, so the DuckDB parity tests verify engine agreement and
these verify the algorithm itself).

Covered kernel: `temperature_alloc_over` (extensions22) — the exact
integer largest-remainder allocation must (a) sum EXACTLY to the
budget on every census, and (b) match the literal python
largest-remainder reference source by source, including remainder
ties (broken by source name) and budgets smaller than the source
count."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

_SPARK = None


def _spark():
    from pyspark.sql import SparkSession

    global _SPARK
    if _SPARK is None:
        _SPARK = SparkSession.builder.master("local[4]").getOrCreate()
        _SPARK.sparkContext.setLogLevel("ERROR")
    return _SPARK


def py_largest_remainder(census: dict, budget: int) -> dict:
    w = {s: math.floor(math.sqrt(n) * 1000) for s, n in census.items()}
    ws = sum(w.values())
    alloc = {s: budget * wi // ws for s, wi in w.items()}
    rem = {s: budget * wi % ws for s, wi in w.items()}
    for s in sorted(census, key=lambda s: (-rem[s], s))[
        : budget - sum(alloc.values())
    ]:
        alloc[s] += 1
    return alloc


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    census=st.dictionaries(
        keys=st.text(alphabet="abc", min_size=1, max_size=4),
        values=st.integers(1, 10_000),
        min_size=1,
        max_size=10,
    ),
    budget=st.integers(1, 5_000),
)
def test_allocation_matches_literal_largest_remainder(census, budget):
    """Skewed censuses (1..10k docs per source), tiny and prime-ish
    budgets, and short colliding source names (remainder ties resolve
    by name) — the allocation must equal the python reference and
    conserve the budget exactly."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions22 import (
        temperature_alloc_over,
    )

    spark = _spark()
    frame = tiny_local_frame(
        spark, list(census.items()), "source string, n_docs long"
    )
    got = {
        r["source"]: r["alloc_n"]
        for r in temperature_alloc_over(frame, budget).collect()
    }
    want = py_largest_remainder(census, budget)
    assert got == want, f"\ncensus: {census}\nbudget: {budget}"
    assert sum(got.values()) == budget
