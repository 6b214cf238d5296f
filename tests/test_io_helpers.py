"""Unit coverage for the io-layer local-relation helpers — the three
ADVICE r12 traps: non-finite doubles rendered as bare ``nan``/``inf``
tokens (which Spark SQL parses as column references), comma-bearing
types sheared by the naive DDL split, and ``detach_result`` VALUES text
growing linearly with a corpus-scaling frame."""

from __future__ import annotations

import math

import pytest

from storm_netmonitor_spark.io import (
    _DETACH_VALUES_MAX_ROWS,
    detach_result,
    tiny_local_frame,
)


@pytest.mark.fast
def test_tiny_local_frame_nonfinite_doubles(spark):
    rows = [
        ("nan", float("nan")),
        ("pinf", float("inf")),
        ("ninf", float("-inf")),
        ("plain", 1.5),
        ("null", None),
    ]
    got = {
        r["k"]: r["v"]
        for r in tiny_local_frame(spark, rows, "k string, v double").collect()
    }
    assert math.isnan(got["nan"])
    assert got["pinf"] == float("inf")
    assert got["ninf"] == float("-inf")
    assert got["plain"] == 1.5
    assert got["null"] is None


@pytest.mark.fast
def test_tiny_local_frame_comma_bearing_types(spark):
    """decimal(p,s) and array<...> must not be sheared by the DDL comma
    split — these route through createDataFrame instead of VALUES."""
    from decimal import Decimal

    df = tiny_local_frame(
        spark,
        [(Decimal("12.34"), [1, 2, 3])],
        "d decimal(10,2), xs array<int>",
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "decimal(10,2)",
        "array<int>",
    ]
    row = df.collect()[0]
    assert row["d"] == Decimal("12.34") and row["xs"] == [1, 2, 3]


@pytest.mark.fast
def test_detach_result_small_frame_is_values_relation(spark):
    """A bounded ledger detaches as a VALUES local relation — no scan
    node, schema preserved exactly."""
    src = spark.range(5).selectExpr(
        "id AS k", "CAST(id * 1.5 AS double) AS v"
    )
    out = detach_result(spark, src)
    assert out.schema == src.schema
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in src.collect()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan" not in plan or "LocalTableScan" in plan


@pytest.mark.fast
def test_detach_result_large_frame_avoids_values_text(spark):
    """Above the ledger bound the detach must NOT render per-row SQL
    text (plan-literal size would scale with the data) — it goes
    through createDataFrame, values and schema intact."""
    n = _DETACH_VALUES_MAX_ROWS + 500
    src = spark.range(n).selectExpr("id AS k", "CAST(id AS string) AS s")
    out = detach_result(spark, src)
    assert out.schema == src.schema
    assert out.count() == n
    # spot-check boundary rows survived the round-trip
    got = {r["k"]: r["s"] for r in out.filter(f"k IN (0, {n - 1})").collect()}
    assert got == {0: "0", n - 1: str(n - 1)}


@pytest.mark.fast
def test_backfill_apply_fully_current_short_circuits(spark, monkeypatch):
    """ADVICE r12: with an all-current work-list the apply must not
    write (an empty partitioned dataset cannot be re-read) — it emits
    the zero-I/O ledger with n_tgt_after = n_tgt_before."""
    from storm_netmonitor_spark.operators import extensions13 as e13

    plan = tiny_local_frame(
        spark,
        [
            ("2024-01-01", "current", 10, 10),
            ("2024-01-02", "current", 7, 7),
        ],
        "event_date string, status string, n_src long, n_tgt long",
    )
    monkeypatch.setattr(
        e13, "plan_incremental_backfill", lambda s, d: plan
    )
    rows = sorted(
        tuple(r)
        for r in e13.sink_backfill_apply(spark, "/root/testdata/sf0.001").collect()
    )
    assert rows == [
        ("2024-01-01", "current", 10, 10, 10),
        ("2024-01-02", "current", 7, 7, 7),
    ]
    assert e13.LAST_BACKFILL_IO == [0, 2]
