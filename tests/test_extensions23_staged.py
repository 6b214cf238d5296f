"""Round-15 candidate verification, third batch (SURVEY §2.AN —
staged, NOT registered).

Each §2.AN candidate runs the exact same vanilla-shaped check the
driver will apply once it is registered in round 15: Spark result vs
its DuckDB oracle — plus the property tests that pin the
embedding-geometry discipline. The testdata embeddings are
near-isotropic unit vectors, so the corpus censuses are flat-ish
there; anisotropy/margin/hub DETECTION is proven by plants through
the factored kernels (exact binary-fraction embeddings, so every
planted dot is float-exact)."""

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


def test_energy_concentration_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions23 import (
        vec_energy_concentration,
        vec_energy_concentration_oracle,
    )

    _assert_staged_parity(
        vec_energy_concentration, vec_energy_concentration_oracle(), spark
    )


def test_nn_margin_census_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions23 import (
        vec_nn_margin_census,
        vec_nn_margin_census_oracle,
    )

    _assert_staged_parity(
        vec_nn_margin_census, vec_nn_margin_census_oracle(), spark
    )


def test_hubness_census_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions23 import (
        vec_hubness_census,
        vec_hubness_census_oracle,
    )

    _assert_staged_parity(
        vec_hubness_census, vec_hubness_census_oracle(), spark
    )


def _vecs(spark, rows):
    from storm_netmonitor_spark.io import tiny_local_frame

    return tiny_local_frame(
        spark, rows, "vec_id long, embedding array<float>"
    )


def test_energy_kernel_ranks_a_planted_dominant_dimension(spark):
    """One dimension carries 90% of the mass: it must rank first with
    the exact share, and the cumulative column must close at 1."""
    from storm_netmonitor_spark.operators.extensions23 import (
        energy_concentration_over,
    )

    e = _vecs(
        spark,
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (3, [0.5, 0.5, 0.0]),
        ],
    )
    rows = sorted(
        energy_concentration_over(e).collect(),
        key=lambda r: r["energy_rank"],
    )
    assert [r["pos"] for r in rows] == [1, 2, 3]
    # energies: pos1 = 2.25, pos2 = 0.25, pos3 = 0 (micro-units)
    assert [r["energy_micro"] for r in rows] == [2_250_000, 250_000, 0]
    assert rows[0]["energy_share_pct"] == 0.9
    assert rows[1]["energy_share_pct"] == 0.1
    assert rows[2]["cum_energy_share_pct"] == 1.0


def test_margin_kernel_bands_planted_gaps(spark):
    """Two queries with float-exact gaps: (0.75 − 0.5) bands at 25,
    an all-zero-sim query bands at 0."""
    from storm_netmonitor_spark.operators.extensions23 import (
        nn_margin_census_over,
    )

    e = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),    # query A
            (10, [0.0, 1.0]),   # query B — orthogonal to all candidates
            (1, [0.75, 0.0]),
            (2, [0.5, 0.0]),
            (3, [0.25, 0.0]),
        ],
    )
    rows = {
        r["margin_band"]: r for r in nn_margin_census_over(e, 10).collect()
    }
    assert set(rows) == {25, 0}
    assert rows[25]["n_queries"] == 1
    assert rows[0]["n_queries"] == 1
    assert rows[25]["query_share_pct"] == 0.5


def test_hubness_kernel_counts_a_planted_hub(spark):
    """c1/c2 appear in both queries' top-2 (query B's zero sims fall
    back to the vec_id tie-break), c3 is never retrieved — the
    histogram must show {2: two vecs, 0: one vec}."""
    from storm_netmonitor_spark.operators.extensions23 import (
        hubness_census_over,
    )

    e = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (10, [0.0, 1.0]),
            (1, [0.75, 0.0]),
            (2, [0.5, 0.0]),
            (3, [0.25, 0.0]),
        ],
    )
    rows = {
        r["k_occurrence"]: r
        for r in hubness_census_over(e, 10, 2).collect()
    }
    assert {k: r["n_vecs"] for k, r in rows.items()} == {2: 2, 0: 1}


def test_energy_census_covers_all_dims_and_sums(spark):
    from storm_netmonitor_spark.operators.extensions23 import (
        vec_energy_concentration,
    )

    rows = sorted(
        vec_energy_concentration(spark, SF).collect(),
        key=lambda r: r["energy_rank"],
    )
    assert [r["energy_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["pos"] for r in rows}) == len(rows)
    prev = None
    for r in rows:
        if prev is not None:
            assert r["energy_micro"] <= prev  # rank order is by energy
            assert r["cum_energy_share_pct"] >= prev_cum
        prev, prev_cum = r["energy_micro"], r["cum_energy_share_pct"]
    assert abs(rows[-1]["cum_energy_share_pct"] - 1.0) < 1e-4
    assert abs(sum(r["energy_share_pct"] for r in rows) - 1.0) < 1e-3


def test_margin_and_hubness_conserve_the_sample(spark):
    """The margin census counts every query exactly once; the hubness
    histogram conserves both the candidate population and the total
    number of top-k picks (Q × k)."""
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions23 import (
        _HUB_K,
        _Q_MOD,
        vec_hubness_census,
        vec_nn_margin_census,
    )

    e = load_table(spark, SF, "embeddings")
    n_q = e.filter(f"vec_id % {_Q_MOD} = 0").count()
    n_cand = e.filter(f"vec_id % {_Q_MOD} != 0").count()

    mrows = vec_nn_margin_census(spark, SF).collect()
    assert all(r["margin_band"] >= 0 for r in mrows)
    assert sum(r["n_queries"] for r in mrows) == n_q

    hrows = vec_hubness_census(spark, SF).collect()
    assert sum(r["n_vecs"] for r in hrows) == n_cand
    assert (
        sum(r["k_occurrence"] * r["n_vecs"] for r in hrows) == n_q * _HUB_K
    )


def _synth_oracle(sql: str, rows):
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])"
        )
        con.executemany(
            "INSERT INTO embeddings VALUES (?, ?)", list(rows)
        )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        out = cur.fetchall()
    finally:
        con.close()
    return cols, out


def test_margin_oracle_agrees_on_a_planted_population(spark):
    """Engine kernel and oracle agree on the planted population too —
    band parity does not lean on the near-isotropic corpus."""
    from storm_netmonitor_spark.operators.extensions23 import (
        nn_margin_census_over,
        vec_nn_margin_census_oracle,
    )

    rows_in = [
        (0, [1.0, 0.0]),
        (10, [0.0, 1.0]),
        (1, [0.75, 0.0]),
        (2, [0.5, 0.0]),
        (3, [0.25, 0.0]),
    ]
    res = nn_margin_census_over(_vecs(spark, rows_in), 10)
    o_cols, o_rows = _synth_oracle(vec_nn_margin_census_oracle(), rows_in)
    assert canon_rows(res.columns, res.collect()) == canon_rows(
        o_cols, o_rows
    )


def test_staged_plan_shapes(spark):
    """100 TB plan pins: the Q-block attach is the allowlisted
    broadcast nested loop (bounded inner side — the vec_batch_knn
    class), NEVER a CartesianProduct; the energy census is one keyed
    decimal aggregate (no join in its lineage at all); the rank
    windows are q_id-keyed."""
    from storm_netmonitor_spark.operators import extensions23 as e23

    p = (
        e23.vec_energy_concentration(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p

    for fn in (e23.vec_nn_margin_census, e23.vec_hubness_census):
        p2 = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p2, fn.__name__
        flat = p2.lower().replace(" ", "")
        assert "windowspecdefinition(q_id#" in flat, fn.__name__


@pytest.mark.parametrize(
    "name",
    [
        "vec_energy_concentration",
        "vec_nn_margin_census",
        "vec_hubness_census",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions23 as e23

    fn = getattr(e23, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )
