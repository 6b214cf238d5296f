"""Hypothesis cross-checks for the round-15 staged kernels (the
r11–r14 staging precedent: every staged batch's decision arithmetic
gets a pure-python reference driven over arbitrary inputs BEFORE
registration, so the DuckDB parity tests verify engine agreement and
these verify the algorithm itself).

Covered kernels:

- `temperature_alloc_over` (extensions22) — the exact integer
  largest-remainder allocation must (a) sum EXACTLY to the budget on
  every census, and (b) match the literal python largest-remainder
  reference source by source, including remainder ties (broken by
  source name) and budgets smaller than the source count.
- `t_closeness_summary` (extensions26) — the cross-multiplied
  integer-cumulant EMD and its above-t decision must match a literal
  python probability-space EMD over arbitrary group/bucket
  populations, including groups missing buckets entirely."""

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


def py_t_closeness(rows, t_pct):
    """Literal probability-space reference: EMD = Σ|cum(p−q)|/(B−1)
    over the globally-observed ordered buckets."""
    from collections import Counter

    glob = Counter(b for _, b in rows)
    buckets = sorted(glob)
    n = sum(glob.values())
    groups: dict = {}
    for g, b in rows:
        groups.setdefault(g, Counter())[b] += 1
    out = {}
    for g, cnt in groups.items():
        gsz = sum(cnt.values())
        cum, d = 0.0, 0.0
        for b in buckets:
            cum += cnt.get(b, 0) / gsz - glob[b] / n
            d += abs(cum)
        emd = d / (len(buckets) - 1) if len(buckets) > 1 else 0.0
        out[g] = (gsz, emd, emd > t_pct / 100 + 1e-12)
    return out


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(0, 4),
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda r: len({b for _, b in r}) >= 2),
    t_pct=st.integers(5, 80),
)
def test_t_closeness_matches_literal_probability_emd(rows, t_pct):
    """Arbitrary group/bucket populations (groups may miss buckets
    entirely — the grid fill path) and arbitrary thresholds: the
    integer-cumulant summary must agree with the float reference on
    the group count, the flagged set, the exposed rows, and the max
    EMD to the dratio quantum."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions26 import (
        t_closeness_summary,
    )

    spark = _spark()
    frame = tiny_local_frame(spark, rows, "q string, b int")
    got = t_closeness_summary(frame, ["q"], F.col("b"), t_pct).collect()[0]
    ref = py_t_closeness(rows, t_pct)
    assert got["n_groups"] == len(ref)
    assert got["n_rows"] == len(rows)
    assert got["groups_above_t"] == sum(1 for _, _, a in ref.values() if a)
    assert got["rows_at_risk"] == sum(
        g for g, _, a in ref.values() if a
    )
    assert abs(got["max_emd"] - max(e for _, e, _ in ref.values())) < 1e-6
