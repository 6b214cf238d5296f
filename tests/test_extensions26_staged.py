"""Round-15 candidate verification, sixth batch (SURVEY §2.AQ —
staged, NOT registered).

Each §2.AQ candidate runs the exact same vanilla-shaped check the
driver will apply once it is registered in round 15: Spark result vs
its DuckDB oracle — plus the property tests that pin the
privacy/sampling/forensics discipline: a hand-computed integer-EMD
plant for t-closeness, an independent python md5-rank recomputation
for the reservoir, and fabricated-digit plants for the Benford
census."""

from __future__ import annotations

import hashlib

import pytest

from tests.parity import canon_rows, run_oracle, run_spark

SF = "/root/testdata/sf0.01"


def _assert_staged_parity(fn, oracle_sql: str, spark, sf_dir: str = SF):
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_t_closeness_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions26 import (
        agg_t_closeness,
        agg_t_closeness_oracle,
    )

    _assert_staged_parity(agg_t_closeness, agg_t_closeness_oracle(), spark)


def test_reservoir_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions26 import (
        sample_reservoir_hash,
        sample_reservoir_hash_oracle,
    )

    _assert_staged_parity(
        sample_reservoir_hash, sample_reservoir_hash_oracle(), spark
    )


def test_benford_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions26 import (
        agg_benford_deviation,
        agg_benford_deviation_oracle,
    )

    _assert_staged_parity(
        agg_benford_deviation, agg_benford_deviation_oracle(), spark
    )


def test_t_closeness_kernel_on_a_hand_computed_plant(spark):
    """Two buckets, one skewed group: g1 = 4 rows all in bucket 0
    (EMD 12/(4·12·1) = 0.25), g2 = 5+3 (EMD 12/(8·12·1) = 0.125);
    t = 20% flags exactly g1 via the integer comparison
    100·12 > 20·4·12."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions26 import (
        t_closeness_summary,
    )

    rows = [("g1", 0)] * 4 + [("g2", 0)] * 5 + [("g2", 1)] * 3
    df = tiny_local_frame(spark, rows, "q string, b int")
    out = t_closeness_summary(df, ["q"], F.col("b"), 20).collect()[0]
    assert out["n_groups"] == 2
    assert out["groups_above_t"] == 1
    assert out["rows_at_risk"] == 4
    assert out["max_emd"] == 0.25
    assert out["n_rows"] == 12


def test_t_closeness_uniform_groups_read_zero(spark):
    """Groups that mirror the global distribution exactly have EMD 0
    and never flag."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions26 import (
        t_closeness_summary,
    )

    rows = [(g, b) for g in ("a", "b") for b in (0, 1, 2)]
    df = tiny_local_frame(spark, rows, "q string, b int")
    out = t_closeness_summary(df, ["q"], F.col("b"), 1).collect()[0]
    assert out["groups_above_t"] == 0
    assert out["max_emd"] == 0.0


def test_reservoir_kernel_matches_python_md5_order(spark):
    """The winner set must equal an independent python recomputation
    of the md5 rank per source."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions26 import (
        _RESERVOIR_SALT,
        reservoir_hash_over,
    )

    data = [(i, "s" + str(i % 2)) for i in range(30)]
    docs = tiny_local_frame(spark, data, "doc_id long, source string")
    got = {
        (r["source"], r["doc_id"]): r["rk"]
        for r in reservoir_hash_over(docs, 3, _RESERVOIR_SALT).collect()
    }
    want = {}
    for src in ("s0", "s1"):
        members = sorted(
            (i for i, s in data if s == src),
            key=lambda i: (
                hashlib.md5(f"{_RESERVOIR_SALT}|{i}".encode()).hexdigest(),
                i,
            ),
        )
        for rk, i in enumerate(members[:3], start=1):
            want[(src, i)] = rk
    assert got == want


def test_benford_kernel_flags_a_fabricated_population(spark):
    """All-fives reads share 1.0 at digit 5 (max positive deviation)
    and the maximal negative deviation everywhere else — every digit
    row present."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions26 import (
        _BENFORD_PPM,
        benford_over,
    )

    vals = tiny_local_frame(
        spark, [(5.1,), (55.0,), (500.0,), (5999.0,)], "x double"
    )
    rows = {r["digit"]: r for r in benford_over(vals).collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[5]["n"] == 4 and rows[5]["share_pct"] == 1.0
    assert rows[5]["dev_pct"] > 0
    for d in (1, 2, 3, 4, 6, 7, 8, 9):
        assert rows[d]["n"] == 0
        assert rows[d]["share_pct"] == 0.0
        assert abs(rows[d]["dev_pct"] + _BENFORD_PPM[d] / 1e6) < 1e-9


def test_benford_census_conserves_the_table(spark):
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions26 import (
        agg_benford_deviation,
    )

    rows = agg_benford_deviation(spark, SF).collect()
    assert {r["digit"] for r in rows} == set(range(1, 10))
    n = load_table(spark, SF, "orders").count()
    assert sum(r["n"] for r in rows) == n
    assert abs(sum(r["share_pct"] for r in rows) - 1.0) < 1e-4


def test_reservoir_draws_exactly_k_per_source(spark):
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions26 import (
        _RESERVOIR_K,
        sample_reservoir_hash,
    )

    rows = sample_reservoir_hash(spark, SF).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["rk"])
    n_src = (
        load_table(spark, SF, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(by_src) == n_src
    for src, rks in by_src.items():
        assert sorted(rks) == list(range(1, _RESERVOIR_K + 1)), src


def test_t_closeness_summary_covers_the_corpus(spark):
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions26 import (
        agg_t_closeness,
    )

    out = agg_t_closeness(spark, SF).collect()[0]
    assert out["n_rows"] == load_table(spark, SF, "customer").count()
    assert 0.0 <= out["max_emd"] <= 1.0
    assert 0 <= out["groups_above_t"] <= out["n_groups"]


def _synth_oracle(sql: str, ddl: str, table: str, rows):
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(f"CREATE TABLE {table}({ddl})")
        ph = ", ".join("?" for _ in rows[0])
        con.executemany(f"INSERT INTO {table} VALUES ({ph})", list(rows))
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        out = cur.fetchall()
    finally:
        con.close()
    return cols, out


def test_t_closeness_oracle_agrees_on_a_skewed_synthetic_table(spark):
    """Engine kernel and oracle agree on a synthetic customer table
    with a deliberately skewed group — parity does not lean on the
    corpus's near-uniform buckets."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions26 import (
        _TCLOSE_T_PCT,
        agg_t_closeness_oracle,
        t_closeness_summary,
    )

    rows_in = (
        [(1, "A", 500.0)] * 6            # nation 1 / seg A: all bucket 0
        + [(2, "A", 500.0)] * 2
        + [(2, "A", 1500.0)] * 2
        + [(2, "A", 2500.0)] * 2         # nation 2: spread
        + [(1, "B", 1500.0)] * 3
        + [(1, "B", 2500.0)] * 1
    )
    rows_in = [
        (nk, seg, bal) for nk, seg, bal in rows_in
    ]
    df = tiny_local_frame(
        spark,
        rows_in,
        "c_nationkey long, c_mktsegment string, c_acctbal double",
    )
    res = t_closeness_summary(
        df,
        ["c_nationkey", "c_mktsegment"],
        F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)"),
        _TCLOSE_T_PCT,
    )
    o_cols, o_rows = _synth_oracle(
        agg_t_closeness_oracle(),
        "c_nationkey BIGINT, c_mktsegment VARCHAR, c_acctbal DOUBLE",
        "customer",
        rows_in,
    )
    assert canon_rows(res.columns, res.collect()) == canon_rows(
        o_cols, o_rows
    )


def test_staged_plan_shapes(spark):
    """100 TB plan pins: the reservoir window partitions by source
    (never a global sort), the Benford census carries no cartesian
    beyond the broadcast expectation/total attaches, and the
    t-closeness grid attach is the broadcast B-row frame."""
    from storm_netmonitor_spark.operators import extensions26 as e26

    p = (
        e26.sample_reservoir_hash(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    flat = p.lower().replace(" ", "")
    assert "windowspecdefinition(source#" in flat
    assert "CartesianProduct" not in p

    for fn in (e26.agg_benford_deviation, e26.agg_t_closeness):
        p2 = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p2, fn.__name__


@pytest.mark.parametrize(
    "name",
    [
        "agg_t_closeness",
        "sample_reservoir_hash",
        "agg_benford_deviation",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions26 as e26

    fn = getattr(e26, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )
