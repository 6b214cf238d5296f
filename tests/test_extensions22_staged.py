"""Round-15 candidate verification, second batch (SURVEY §2.AM —
staged, NOT registered).

Each §2.AM candidate runs the exact same vanilla-shaped check the
driver will apply once it is registered in round 15: Spark result vs
its DuckDB oracle — plus the property tests that pin the
mixture/curriculum discipline. The testdata sources are uniform (25
docs each at sf0.01), so the corpus drift rows are near-flat there;
the allocation/ordering arithmetic is proven against independent
python recomputations and planted skews through the factored
kernels."""

from __future__ import annotations

import hashlib
import math

import pytest

from tests.parity import canon_rows, run_oracle, run_spark

SF = "/root/testdata/sf0.01"


def _assert_staged_parity(fn, oracle_sql: str, spark, sf_dir: str = SF):
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_temperature_resample_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions22 import (
        sample_temperature_resample,
        sample_temperature_resample_oracle,
    )

    _assert_staged_parity(
        sample_temperature_resample,
        sample_temperature_resample_oracle(),
        spark,
    )


def test_curriculum_stages_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions22 import (
        pipeline_curriculum_stages,
        pipeline_curriculum_stages_oracle,
    )

    _assert_staged_parity(
        pipeline_curriculum_stages,
        pipeline_curriculum_stages_oracle(),
        spark,
    )


def test_epoch_mix_drift_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions22 import (
        pipeline_epoch_mix_drift,
        pipeline_epoch_mix_drift_oracle,
    )

    _assert_staged_parity(
        pipeline_epoch_mix_drift, pipeline_epoch_mix_drift_oracle(), spark
    )


def _python_largest_remainder(census: dict, budget: int) -> dict:
    """Independent integer largest-remainder recomputation — the
    allocation law the kernel must reproduce exactly."""
    w = {s: math.floor(math.sqrt(n) * 1000) for s, n in census.items()}
    ws = sum(w.values())
    floor_n = {s: budget * wi // ws for s, wi in w.items()}
    rem = {s: budget * wi % ws for s, wi in w.items()}
    leftover = budget - sum(floor_n.values())
    order = sorted(census, key=lambda s: (-rem[s], s))
    for s in order[:leftover]:
        floor_n[s] += 1
    return floor_n


def test_temperature_kernel_matches_python_on_a_skewed_census(spark):
    """A heavily skewed planted census: the allocation must sum
    EXACTLY to the budget, match the independent python
    largest-remainder recomputation source by source, and up-weight
    the tail (a √n target share above the proportional share for the
    smallest source)."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions22 import (
        temperature_alloc_over,
    )

    census = {"big": 10_000, "mid": 400, "tail": 9, "tiny": 1}
    frame = tiny_local_frame(
        spark, list(census.items()), "source string, n_docs long"
    )
    budget = 997  # prime: exercises the remainder distribution
    rows = {r["source"]: r for r in temperature_alloc_over(frame, budget).collect()}
    want = _python_largest_remainder(census, budget)
    assert {s: r["alloc_n"] for s, r in rows.items()} == want
    assert sum(r["alloc_n"] for r in rows.values()) == budget
    tiny = rows["tiny"]
    assert tiny["alloc_share_pct"] > tiny["corpus_share_pct"]
    big = rows["big"]
    assert big["alloc_share_pct"] < big["corpus_share_pct"]


def test_temperature_allocation_sums_to_budget_on_corpus(spark):
    from storm_netmonitor_spark.operators.extensions22 import (
        _RESAMPLE_BUDGET,
        sample_temperature_resample,
    )

    rows = sample_temperature_resample(spark, SF).collect()
    assert sum(r["alloc_n"] for r in rows) == _RESAMPLE_BUDGET
    assert abs(sum(r["corpus_share_pct"] for r in rows) - 1.0) < 1e-4


def test_curriculum_kernel_classifies_band_boundaries(spark):
    """Docs planted EXACTLY on the stage boundaries: 31→1, 32→2,
    63→2, 64→3, 95→3, 96→4 — the half-open [lo, hi) contract."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions22 import (
        curriculum_stages_over,
    )

    def doc(n):  # n whitespace tokens
        return " ".join("w" for _ in range(n))

    docs = tiny_local_frame(
        spark,
        [(doc(n),) for n in (31, 32, 63, 64, 95, 96)],
        "text string",
    )
    rows = {r["stage"]: r for r in curriculum_stages_over(docs).collect()}
    assert {s: r["n_docs"] for s, r in rows.items()} == {1: 1, 2: 2, 3: 2, 4: 1}
    assert rows[1]["n_tokens"] == 31
    assert rows[2]["n_tokens"] == 32 + 63
    assert rows[4]["n_tokens"] == 96
    # cumulative totals ascend and close at the corpus totals
    assert rows[4]["cum_docs"] == 6
    assert rows[4]["cum_tokens"] == 31 + 32 + 63 + 64 + 95 + 96
    assert rows[1]["cum_docs"] == 1
    assert rows[2]["cum_docs"] == 3


def test_curriculum_census_is_cumulative_and_conserves(spark):
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions22 import (
        pipeline_curriculum_stages,
    )

    rows = sorted(
        pipeline_curriculum_stages(spark, SF).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_label"] for r in rows] == [
        "short",
        "medium",
        "long",
        "xlong",
    ][: len(rows)]
    run_docs = run_toks = 0
    for r in rows:
        run_docs += r["n_docs"]
        run_toks += r["n_tokens"]
        assert r["cum_docs"] == run_docs
        assert r["cum_tokens"] == run_toks
    assert run_docs == load_table(spark, SF, "documents").count()
    assert abs(sum(r["token_share_pct"] for r in rows) - 1.0) < 1e-4


def test_epoch_mix_kernel_matches_python_recomputation(spark):
    """The kernel's prefix census must equal an independent python
    recomputation of the registered shuffle law: shard = md5-hex-mod,
    order = md5('epochE|' + id) with doc_id tie-break, prefix =
    each shard's leading ⌈n/5⌉."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions22 import (
        epoch_mix_drift_over,
    )

    data = [(i, "s" + str(i % 3)) for i in range(40)]
    docs = tiny_local_frame(spark, data, "doc_id long, source string")
    n_shards = 4
    epochs = (1, 2)
    got = {
        (r["epoch"], r["source"]): r["n_prefix"]
        for r in epoch_mix_drift_over(docs, epochs, n_shards).collect()
    }

    want: dict = {}
    for e in epochs:
        shards: dict = {}
        for i, src in data:
            sh = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_shards
            shards.setdefault(sh, []).append((i, src))
        for sh, members in shards.items():
            members.sort(
                key=lambda t: (
                    hashlib.md5(f"epoch{e}|{t[0]}".encode()).hexdigest(),
                    t[0],
                )
            )
            take = -(-len(members) // 5)
            for _, src in members[:take]:
                want[(e, src)] = want.get((e, src), 0) + 1
    assert got == want


def test_epoch_mix_prefix_shares_sum_to_one(spark):
    from storm_netmonitor_spark.operators.extensions22 import (
        _DRIFT_EPOCHS,
        pipeline_epoch_mix_drift,
    )

    rows = pipeline_epoch_mix_drift(spark, SF).collect()
    assert {r["epoch"] for r in rows} == set(_DRIFT_EPOCHS)
    for e in _DRIFT_EPOCHS:
        eshare = sum(
            r["prefix_share_pct"] for r in rows if r["epoch"] == e
        )
        assert abs(eshare - 1.0) < 1e-4
    for r in rows:
        assert (
            abs(
                r["drift_ppm"]
                - (r["prefix_share_pct"] - r["corpus_share_pct"])
            )
            < 1e-9
        )


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


def test_temperature_oracle_agrees_on_a_skewed_synthetic_corpus(spark):
    """Engine kernel and oracle agree on a skewed corpus the uniform
    testdata never exercises — allocation parity does not lean on the
    uniform-sources precondition."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions22 import (
        _RESAMPLE_BUDGET,
        sample_temperature_resample_oracle,
        temperature_alloc_over,
    )

    rows_in = (
        [(i, "big") for i in range(50)]
        + [(100 + i, "mid") for i in range(7)]
        + [(200, "tiny")]
    )
    docs = tiny_local_frame(spark, rows_in, "doc_id long, source string")
    src = docs.groupBy("source").count().withColumnRenamed("count", "n_docs")
    res = temperature_alloc_over(src, _RESAMPLE_BUDGET)
    o_cols, o_rows = _synth_oracle(
        sample_temperature_resample_oracle(),
        "doc_id BIGINT, source VARCHAR",
        "documents",
        rows_in,
    )
    assert canon_rows(res.columns, res.collect()) == canon_rows(
        o_cols, o_rows
    )


def test_staged_plan_shapes(spark):
    """100 TB plan pins: no CartesianProduct anywhere (the bounded
    single-row/label attaches render as the allowlisted BNLJ class);
    the curriculum label frame is a local relation (no scan job for a
    4-row VALUES table); the epoch-drift rank windows partition by
    (epoch, shard) — never an un-partitioned global sort over the
    corpus."""
    from storm_netmonitor_spark.operators import extensions22 as e22

    for fn in (
        e22.sample_temperature_resample,
        e22.pipeline_curriculum_stages,
        e22.pipeline_epoch_mix_drift,
    ):
        p = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p, fn.__name__

    p2 = (
        e22.pipeline_curriculum_stages(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LocalTableScan" in p2 or "LocalRelation" in p2

    # the rank window must be keyed by (epoch, shard) — a window whose
    # partition spec dropped to empty would be a global sort over the
    # corpus (the scale smell the registered epoch_shuffle avoids)
    p3 = (
        e22.pipeline_epoch_mix_drift(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    flat = p3.lower().replace(" ", "").replace("\n", "")
    assert "windowspecdefinition(epoch#" in flat
    assert "cartesianproduct" not in flat


@pytest.mark.parametrize(
    "name",
    [
        "sample_temperature_resample",
        "pipeline_curriculum_stages",
        "pipeline_epoch_mix_drift",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions22 as e22

    fn = getattr(e22, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )
