"""Round-15 candidate verification, fifth batch (SURVEY §2.AP —
staged, NOT registered).

Each §2.AP candidate runs the exact same vanilla-shaped check the
driver will apply once it is registered in round 15: Spark result vs
its DuckDB oracle — plus the property tests that pin the
graph-hygiene/profile discipline: a planted star for the degree
census, a hand-traceable clique-plus-tail cascade for the k-core
peel, planted nulls/duplicates for the profile, and the one-pass /
no-cartesian plan pins."""

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


def test_degree_census_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions25 import (
        graph_degree_census,
        graph_degree_census_oracle,
    )

    _assert_staged_parity(
        graph_degree_census, graph_degree_census_oracle(), spark
    )


def test_kcore_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions25 import (
        graph_kcore_decompose,
        graph_kcore_decompose_oracle,
    )

    _assert_staged_parity(
        graph_kcore_decompose, graph_kcore_decompose_oracle(), spark
    )


def test_column_profile_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions25 import (
        quality_column_profile,
        quality_column_profile_oracle,
    )

    _assert_staged_parity(
        quality_column_profile, quality_column_profile_oracle(), spark
    )


def test_degree_census_reads_a_planted_star(spark):
    """One hub supplying 5 leaves: src side censuses a single degree-5
    node; dst side censuses five degree-1 nodes."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions25 import (
        degree_census_over,
    )

    edges = tiny_local_frame(
        spark,
        [("hub", f"leaf{i}") for i in range(5)],
        "src string, dst string",
    )
    rows = {
        (r["side"], r["degree"]): r
        for r in degree_census_over(edges).collect()
    }
    assert set(rows) == {("src", 5), ("dst", 1)}
    assert rows[("src", 5)]["n_nodes"] == 1
    assert rows[("src", 5)]["node_share_pct"] == 1.0
    assert rows[("dst", 1)]["n_nodes"] == 5
    assert rows[("dst", 1)]["node_share_pct"] == 1.0


def test_kcore_kernel_traces_a_planted_cascade(spark):
    """K4 clique with a two-edge tail, k=2: round 1 peels the tail
    end, round 2 peels the now-exposed middle, round 3 is the
    fixpoint — the surviving core is exactly the clique."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions25 import (
        kcore_rounds_over,
    )

    edges = tiny_local_frame(
        spark,
        [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),   # K4
            ("d", "e"), ("e", "f"),               # the tail
        ],
        "src string, dst string",
    )
    rows = kcore_rounds_over(edges, 2, 3)
    assert rows == [
        (1, 1, 5, 7),   # f falls; K4 + d-e survive
        (2, 1, 4, 6),   # e falls; the clique remains
        (3, 0, 4, 6),   # fixpoint: the census shows convergence
    ]


def test_profile_kernel_counts_planted_nulls_and_dupes(spark):
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions25 import (
        column_profile_over,
    )

    df = tiny_local_frame(
        spark,
        [(1, "a"), (1, None), (2, None), (None, "b")],
        "x long, y string",
    )
    rows = {r["column_name"]: r for r in column_profile_over(df, ("x", "y")).collect()}
    assert rows["x"]["n_rows"] == 4
    assert rows["x"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 2
    assert rows["x"]["null_ppm"] == 0.25
    assert rows["y"]["n_nulls"] == 2
    assert rows["y"]["n_distinct"] == 2
    assert rows["y"]["null_ppm"] == 0.5


def test_degree_census_conserves_the_edge_set(spark):
    """Each side's degrees sum to the SAME edge count, and per-side
    node totals match the distinct endpoint counts."""
    from storm_netmonitor_spark.operators.extensions25 import (
        _edges,
        graph_degree_census,
    )

    e = _edges(spark, SF)
    n_edges = e.count()
    rows = graph_degree_census(spark, SF).collect()
    for side, col in (("src", "src"), ("dst", "dst")):
        srows = [r for r in rows if r["side"] == side]
        assert sum(r["degree"] * r["n_nodes"] for r in srows) == n_edges
        assert sum(r["n_nodes"] for r in srows) == (
            e.select(col).distinct().count()
        )
        assert abs(sum(r["node_share_pct"] for r in srows) - 1.0) < 1e-4


def test_kcore_census_is_monotone(spark):
    from storm_netmonitor_spark.operators.extensions25 import (
        _KCORE_ROUNDS,
        graph_kcore_decompose,
    )

    rows = sorted(
        graph_kcore_decompose(spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == list(range(1, _KCORE_ROUNDS + 1))
    prev_n = prev_e = None
    for r in rows:
        if prev_n is not None:
            assert r["n_nodes"] <= prev_n
            assert r["n_edges"] <= prev_e
        prev_n, prev_e = r["n_nodes"], r["n_edges"]


def test_profile_covers_the_schema_with_zero_nulls(spark):
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions25 import (
        _PROFILE_COLS,
        quality_column_profile,
    )

    rows = {r["column_name"]: r for r in quality_column_profile(spark, SF).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    n = load_table(spark, SF, "orders").count()
    for r in rows.values():
        assert r["n_rows"] == n
        assert r["n_nulls"] == 0 and r["null_ppm"] == 0.0
        assert 0 < r["n_distinct"] <= n


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


def test_profile_oracle_agrees_on_planted_nulls(spark):
    """Engine kernel and oracle agree on a synthetic orders table WITH
    nulls — the corpus's zero-null profile is oracle-agreed, the plant
    proves the null arithmetic."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions25 import (
        _PROFILE_COLS,
        column_profile_over,
        quality_column_profile_oracle,
    )

    rows_in = [
        (1, 10, "O", 100.5, "2024-01-01 00:00:00", "1-URGENT"),
        (2, 10, None, 100.5, None, "2-HIGH"),
        (3, None, "F", None, "2024-01-02 00:00:00", None),
    ]
    df = tiny_local_frame(
        spark,
        rows_in,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate_s AS TIMESTAMP) AS o_orderdate",
        "o_orderpriority",
    )
    res = column_profile_over(df, _PROFILE_COLS)
    o_cols, o_rows = _synth_oracle(
        quality_column_profile_oracle(),
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
        "orders",
        rows_in,
    )
    assert canon_rows(res.columns, res.collect()) == canon_rows(
        o_cols, o_rows
    )


def test_staged_plan_shapes(spark):
    """100 TB plan pins: the profile is ONE pass over orders (a single
    parquet scan feeds the multi-distinct Expand — no per-column
    rescans), and the degree census carries no cartesian."""
    from storm_netmonitor_spark.operators import extensions25 as e25

    p = (
        e25.quality_column_profile(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("orders.parquet") == 1
    assert "Expand" in p  # the C-way multi-distinct, schema-bounded
    assert "CartesianProduct" not in p

    p2 = (
        e25.graph_degree_census(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p2


@pytest.mark.parametrize(
    "name",
    [
        "graph_degree_census",
        "graph_kcore_decompose",
        "quality_column_profile",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions25 as e25

    fn = getattr(e25, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )
