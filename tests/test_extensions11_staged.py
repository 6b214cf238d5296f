"""§2.AB verification (REGISTERED in round 12; staged at round-11 close).

Each §2.AB op runs the exact same vanilla-shaped check the driver
applies: Spark result vs its DuckDB oracle, column names + row count +
canonical values — plus the property tests that pin each op's planning
discipline (work-list completeness and class coverage, bin-capacity and
time-contiguity invariants, planted orphan detection, key-pruned scans).
These were the registration gate's first half; they stay green as the
batch's standing parity suite now that the ops are in the registry.
"""

from __future__ import annotations

import pytest

from tests.parity import canon_rows, run_oracle, run_spark

SF = "/root/testdata/sf0.01"


def _assert_staged_parity(fn, oracle_sql: str, spark, sf_dir: str = SF):
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_backfill_plan_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions11 import (
        plan_incremental_backfill,
        plan_incremental_backfill_oracle,
    )

    _assert_staged_parity(
        plan_incremental_backfill, plan_incremental_backfill_oracle(), spark
    )


def test_compaction_plan_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions11 import (
        plan_compaction,
        plan_compaction_oracle,
    )

    _assert_staged_parity(plan_compaction, plan_compaction_oracle(), spark)


def test_ri_audit_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions11 import (
        audit_referential_integrity,
        audit_referential_integrity_oracle,
    )

    _assert_staged_parity(
        audit_referential_integrity,
        audit_referential_integrity_oracle(),
        spark,
    )


def test_backfill_plan_covers_all_classes_and_is_complete(spark):
    """The work-list must tile the source partition set exactly, carry
    all three classes on this fixture, and every missing/stale row must
    genuinely need work (n_tgt < n_src), every current row none."""
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions11 import (
        plan_incremental_backfill,
    )
    from pyspark.sql import functions as F

    plan = {
        r["event_date"]: r
        for r in plan_incremental_backfill(spark, SF).collect()
    }
    src_dates = {
        r["d"]
        for r in load_table(spark, SF, "events")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .collect()
    }
    assert set(plan) == src_dates
    classes = {r["status"] for r in plan.values()}
    assert classes == {"missing", "stale", "current"}
    for r in plan.values():
        if r["status"] == "missing":
            assert r["n_tgt"] == 0 and r["n_src"] > 0
        elif r["status"] == "stale":
            assert 0 < r["n_tgt"] < r["n_src"]
        else:
            assert r["n_tgt"] == r["n_src"]


def test_backfill_target_scan_is_partition_column_only(spark):
    """The manifest-level claim: the target side of the plan reads ONLY
    the partition column — no payload column appears in the read
    schema of the staged target's scan."""
    from storm_netmonitor_spark.operators.extensions11 import (
        plan_incremental_backfill,
    )

    plan = plan_incremental_backfill(spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    # the staged-target parquet scan must project no payload columns
    hits = 0
    for scan_part in plan.split("FileScan parquet")[1:]:
        head = scan_part.split("\n")[0]
        if "nm_bf_tgt_" in head or "events_target" in head:
            hits += 1
            assert "ReadSchema: struct<>" in head, head
    assert hits >= 1, f"target scan not found in plan:\n{plan}"


def test_compaction_plan_invariants(spark):
    """Bin invariants: bins are time-contiguous within a date (hr
    ranges of consecutive bins do not interleave), every bin except a
    date's last holds ≥ target rows once closed (a bin only closes
    because the running sum crossed the target), and the plan conserves
    the corpus row count."""
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions11 import (
        _CPT_TARGET_ROWS,
        plan_compaction,
    )

    rows = plan_compaction(spark, SF).collect()
    by_date: dict[str, list] = {}
    for r in rows:
        by_date.setdefault(r["event_date"], []).append(r)
    total = sum(r["n_rows"] for r in rows)
    assert total == load_table(spark, SF, "events").count()
    for date, bins in by_date.items():
        bins.sort(key=lambda r: r["bin_id"])
        assert [b["bin_id"] for b in bins] == list(range(len(bins)))
        for a, b in zip(bins, bins[1:]):
            assert a["hr_to"] < b["hr_from"], (date, a, b)
        # a non-final bin closed because the cumulative row count
        # crossed its boundary: its pack plus everything before it
        # reaches the next bin boundary
        run = 0
        for b in bins[:-1]:
            run += b["n_rows"]
            assert run >= (b["bin_id"] + 1) * _CPT_TARGET_ROWS, (date, b)


def test_ri_audit_clean_corpus_and_planted_orphans(spark):
    """The testdata graph is referentially clean (all-zero orphans —
    asserted, not assumed), and the kernel DETECTS planted violations:
    an orphan key and a NULL key land in the right counters with the
    exact share."""
    from storm_netmonitor_spark.operators.extensions11 import (
        audit_referential_integrity,
        ri_edge_audit,
    )

    for r in audit_referential_integrity(spark, SF).collect():
        assert r["n_orphan"] == 0 and r["n_null"] == 0, r
    child = spark.createDataFrame(
        [(1,), (2,), (999,), (None,)], "k bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    out = ri_edge_audit(child, "k", parent, "pk", "t.k", "p.pk").collect()[0]
    assert out["n_child"] == 4
    assert out["n_null"] == 1
    assert out["n_orphan"] == 1
    assert abs(out["orphan_pct"] - 0.25) < 1e-9


def test_ri_audit_scans_prune_to_the_key(spark):
    """Each child scan projects exactly one column — the audit never
    reads payload at any scale."""
    from storm_netmonitor_spark.operators.extensions11 import (
        audit_referential_integrity,
    )

    plan = audit_referential_integrity(spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    for scan_part in plan.split("ReadSchema: ")[1:]:
        schema = scan_part.split("\n")[0].strip()
        n_cols = 0 if schema == "struct<>" else schema.count(":")
        assert n_cols <= 1, schema


@pytest.mark.parametrize(
    "name",
    [
        "plan_incremental_backfill",
        "plan_compaction",
        "audit_referential_integrity",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions11 as e11

    fn = getattr(e11, name)
    c1, r1 = run_spark(fn, spark, SF)
    c2, r2 = run_spark(fn, spark, SF)
    assert canon_rows(c1, r1) == canon_rows(c2, r2)


def test_ri_edge_audit_null_parent_and_empty_child(spark):
    """ADVICE r11: the kernel's contract over arbitrary frames — NULL
    parent keys are excluded from the membership set (no SQL NOT IN
    three-valued collapse: orphans still count when a parent key is
    NULL), and an empty child frame emits n_child=0 with orphan_pct=0
    instead of feeding dratio a zero denominator."""
    from storm_netmonitor_spark.operators.extensions11 import ri_edge_audit

    parent = spark.createDataFrame(
        [(1,), (2,), (None,)], "pk long"
    )
    child = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "ck long"
    )
    r = ri_edge_audit(child, "ck", parent, "pk", "c->p", "pk").collect()[0]
    # ck=3 is an orphan even though the parent set contains a NULL
    assert (r["n_child"], r["n_null"], r["n_orphan"]) == (4, 1, 1)
    assert r["orphan_pct"] == 0.25

    empty = spark.createDataFrame([], "ck long")
    r0 = ri_edge_audit(empty, "ck", parent, "pk", "e->p", "pk").collect()[0]
    assert (r0["n_child"], r0["n_orphan"]) == (0, 0)
    assert r0["orphan_pct"] == 0.0
