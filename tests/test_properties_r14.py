"""Hypothesis cross-checks for the round-14 staged kernels (the
r11–r13 staging precedent: every staged batch's decision arithmetic
gets a pure-python reference driven over arbitrary inputs BEFORE
registration, so the DuckDB parity tests verify engine agreement and
these verify the algorithm itself).

Covered kernel: `bpe_merge_rounds` (extensions17) — the two-pass
non-overlapping ``replace`` merge and the total-order pair adoption
must equal literal left-to-right greedy BPE on arbitrary word tables,
including the boundary-sharing shapes (alternating pair runs,
same-symbol runs) that break one-pass string replacement.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from tests.test_extensions17_staged import py_bpe_reference

_SPARK = None


def _spark():
    from pyspark.sql import SparkSession

    global _SPARK
    if _SPARK is None:
        _SPARK = SparkSession.builder.master("local[4]").getOrCreate()
        _SPARK.sparkContext.setLogLevel("ERROR")
    return _SPARK


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    words=st.dictionaries(
        keys=st.text(alphabet="ab", min_size=1, max_size=8),
        values=st.integers(1, 9),
        min_size=1,
        max_size=12,
    ),
    rounds=st.integers(1, 3),
)
def test_bpe_rounds_match_literal_greedy_reference(words, rounds):
    """A two-letter alphabet maximizes boundary-sharing collisions
    (every pair shares symbols with its neighbors); counts break ties
    through the (count desc, left asc, right asc) total order."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions17 import (
        bpe_merge_rounds,
    )

    spark = _spark()
    frame = tiny_local_frame(
        spark, list(words.items()), "w string, wc long"
    )
    got = bpe_merge_rounds(frame, rounds)
    want = py_bpe_reference(words, rounds)
    assert got == want, f"\nwords: {words}\nengine: {got}\nref: {want}"
