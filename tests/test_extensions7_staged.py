"""§2.X operator verification (staged first, REGISTERED later in r11).

Each §2.X op runs the exact same vanilla-shaped check the driver applies:
Spark result vs its DuckDB oracle, column names + row count + canonical
values — plus the property tests that pin each op's decision discipline.
These tests predate the registration (they were the first half of the
registration gate) and stay as the module-local parity+property suite;
the registry-wide sweeps now cover the two batch ops too, while
``stream_minhash_index_merge`` is excluded from the batch plan sweeps by
the ``stream_`` prefix like every streaming-drain op (its per-batch
incrementality is pinned here instead).
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


def test_vec_ivf_index_insert_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions7 import (
        vec_ivf_index_insert,
        vec_ivf_index_insert_oracle,
    )

    _assert_staged_parity(
        vec_ivf_index_insert, vec_ivf_index_insert_oracle(), spark
    )


def test_vec_index_drift_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions7 import (
        vec_index_drift,
        vec_index_drift_oracle,
    )

    _assert_staged_parity(vec_index_drift, vec_index_drift_oracle(), spark)


def test_stream_minhash_index_merge_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions7 import (
        stream_minhash_index_merge,
        stream_minhash_index_merge_oracle,
    )

    _assert_staged_parity(
        stream_minhash_index_merge,
        stream_minhash_index_merge_oracle(),
        spark,
    )


def test_insert_routing_margins_are_healthy(spark):
    """The only float-dependent step in insert/drift is the argmax cell
    choice. Audit every routed delta vector's margin: the winning dot
    must beat the runner-up by far more than cross-engine summation
    noise (~1e-13 absolute at dim=64), or the two engines could route a
    vector differently."""
    import numpy as np

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions7 import (
        _embed_split,
        base_trained_cents,
    )

    split = _embed_split(spark, SF)
    cents = np.array(base_trained_cents(spark, SF, split), dtype=np.float64)
    delta = (
        load_table(spark, SF, "embeddings")
        .filter(f"vec_id >= {split}")
        .collect()
    )
    worst = float("inf")
    for r in delta:
        dots = cents @ np.array(r["embedding"], dtype=np.float64)
        top2 = np.sort(dots)[-2:]
        worst = min(worst, float(top2[1] - top2[0]))
    assert worst > 1e-9, f"routing margin too thin: {worst}"


def test_drift_flag_is_integer_exact(spark):
    """Recompute every drifted flag from the integer census alone — the
    flag must be a pure function of counts (no float anywhere), and the
    census must conserve the populations."""
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions7 import (
        _DRIFT_DEN,
        _embed_split,
        vec_index_drift,
    )

    rows = vec_index_drift(spark, SF).collect()
    tot_b = sum(r["n_base"] for r in rows)
    tot_d = sum(r["n_delta"] for r in rows)
    split = _embed_split(spark, SF)
    e = load_table(spark, SF, "embeddings")
    assert tot_b == e.filter(f"vec_id >= 1 AND vec_id < {split}").count()
    assert tot_d == e.filter(f"vec_id >= {split}").count()
    flagged = 0
    for r in rows:
        expect = (
            abs(r["n_delta"] * tot_b - r["n_base"] * tot_d) * _DRIFT_DEN
            >= tot_b * tot_d
        )
        assert r["drifted"] == expect, r
        flagged += expect
    # the op is informative at test scale: mixed flags, not all-or-nothing
    assert 0 < flagged < len(rows)


def test_streaming_merge_equals_batch_merge(spark):
    """Batch-equivalence, op vs op: the streaming fold must emit EXACTLY
    the registered batch merge's pair set (same standing index artifact,
    same delta, different execution mode)."""
    from storm_netmonitor_spark.operators.extensions6 import (
        text_minhash_index_merge,
    )
    from storm_netmonitor_spark.operators.extensions7 import (
        stream_minhash_index_merge,
    )

    streamed = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in stream_minhash_index_merge(spark, SF).collect()
    )
    batch = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in text_minhash_index_merge(spark, SF).collect()
    )
    assert streamed == batch and len(streamed) > 0


def test_streaming_merge_commits_multiple_batches(spark):
    """Per-batch incremental folding is the claim — the drain must have
    committed ≥2 micro-batches, each with a recorded wall."""
    from storm_netmonitor_spark.operators import extensions7 as e7

    e7.stream_minhash_index_merge(spark, SF).collect()
    assert len(e7.LAST_MERGE_BATCH_WALLS) >= 2


def test_staged_plan_shapes(spark):
    """No cartesian / nested-loop anywhere in the batch candidates (the
    registry-wide guard, applied pre-registration); the drift op's only
    BroadcastNestedLoopJoin is the deliberate 1-row totals combine."""
    from storm_netmonitor_spark.operators.extensions7 import (
        vec_index_drift,
        vec_ivf_index_insert,
    )
    from tests.test_plans import plan

    p = plan(vec_ivf_index_insert(spark, SF), mode="simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    p = plan(vec_index_drift(spark, SF), mode="simple")
    assert "CartesianProduct" not in p
    # the crossJoin(broadcast(tot)) 1-row scalar combine is the allowed
    # exception (the tpch_q11 precedent); nothing else may plan one
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_base_cents_persist_in_artifact_store(spark, tmp_path, monkeypatch):
    """A fresh inserting process must read the base-trained quantizer,
    never re-train it: second build against a warm store returns without
    invoking Lloyd (proven by clearing the session memo and counting
    store entries)."""
    import os

    from storm_netmonitor_spark.io import _SESSION_MEMO
    from storm_netmonitor_spark.operators.extensions7 import (
        _embed_split,
        base_trained_cents,
    )

    def drop_memo() -> None:
        for k in [k for k in _SESSION_MEMO if "ivf_base_cents" in repr(k)]:
            _SESSION_MEMO.pop(k)

    monkeypatch.setenv("NM_ARTIFACT_DIR", str(tmp_path / "store"))
    drop_memo()  # earlier tests may have memoized against the real store
    split = _embed_split(spark, SF)
    c1 = base_trained_cents(spark, SF, split)
    store = str(tmp_path / "store")
    (entry,) = [n for n in os.listdir(store) if n.startswith("ivf_base_cents")]
    ino = os.stat(os.path.join(store, entry)).st_ino
    # drop the in-process memo: the next call must hit the DISK store
    drop_memo()
    c2 = base_trained_cents(spark, SF, split)
    assert c1 == c2
    assert os.stat(os.path.join(store, entry)).st_ino == ino  # no re-publish


def test_index_drift_kernel_boundary_exact_vs_fractions(spark):
    """The drifted flag must implement |n_d/tot_d − n_b/tot_b| ≥ 1/200
    EXACTLY — including censuses crafted to land PRECISELY on the
    boundary, where any float rendering of the shares would be a coin
    flip. Reference: Fraction arithmetic. Shares must equal the
    half-away-rounded exact rational at 6 decimals."""
    from fractions import Fraction

    from storm_netmonitor_spark.operators.extensions7 import (
        _DRIFT_DEN,
        index_drift_over,
    )

    # (n_base per cell, n_delta per cell) — case 2 lands exactly ON the
    # boundary for cell 0: 30/400 - 14/200 = 0.075 - 0.07 = 1/200
    cases = [
        ([10, 20, 30], [10, 20, 30]),       # identical shares: no drift
        ([30, 170, 200], [14, 86, 100]),    # cell 0 exactly AT boundary
        ([0, 5, 5], [5, 5, 0]),             # empty cells both sides
        ([1, 0, 0], [0, 0, 1]),             # total concentration flip
    ]
    for n_base, n_delta in cases:
        def routed(counts):
            rows = [
                (int(i * 1000 + j), int(cid))
                for cid, c in enumerate(counts)
                for j in range(c)
                for i in [cid]
            ]
            return spark.createDataFrame(
                rows or [(0, 0)], "vec_id long, cid int"
            ).filter("vec_id >= 0" if rows else "vec_id < 0")

        out = {
            r["cid"]: r
            for r in index_drift_over(
                routed(n_base), routed(n_delta), len(n_base)
            ).collect()
        }
        tot_b, tot_d = sum(n_base), sum(n_delta)
        for cid in range(len(n_base)):
            r = out[cid]
            assert r["n_base"] == n_base[cid] and r["n_delta"] == n_delta[cid]
            expect_flag = abs(
                Fraction(n_delta[cid], tot_d) - Fraction(n_base[cid], tot_b)
            ) >= Fraction(1, _DRIFT_DEN)
            assert r["drifted"] == expect_flag, (n_base, n_delta, cid)

            def half_away_6(fr: Fraction) -> float:
                num, den = fr.numerator * 10**6, fr.denominator
                q, rem = divmod(num, den)
                if 2 * rem >= den:
                    q += 1
                return q / 10**6

            assert r["share_base"] == half_away_6(
                Fraction(n_base[cid], tot_b)
            )
            assert r["share_delta"] == half_away_6(
                Fraction(n_delta[cid], tot_d)
            )


def test_route_tie_breaks_to_smallest_cid(spark):
    """Exact-tie discipline: with duplicate centroids (dot ties are then
    EXACT, not float-noise), ``np.argmax`` must take the first maximum —
    the same smallest-cid rule the SQL twin's ``ROW_NUMBER … ORDER BY
    dot DESC, cid`` applies. A divergence here would silently route the
    two engines differently on degenerate quantizers."""
    from storm_netmonitor_spark.kernels import route_to_centroids

    v = [1.0] + [0.0] * 63
    cents = [v, v, ([0.0, 1.0] + [0.0] * 62)]  # cid 0 and 1 tie exactly
    corpus = spark.createDataFrame(
        [(7, v)], "vec_id long, embedding array<double>"
    )
    (row,) = route_to_centroids(corpus, cents).collect()
    assert row["cid"] == 0


def test_codegen_router_matches_arrow_router(spark):
    """The two routing kernels must make IDENTICAL assignment decisions
    — the codegen (latency-class) kernel is only valid as a physical
    alternative because the audited assignment margins (≥1.1e-5) dwarf
    the accumulation-order noise between BLAS and a sequential fold."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions7 import (
        _embed_split,
        base_trained_cents,
        route_to_centroids,
        route_to_centroids_codegen,
    )

    split = _embed_split(spark, SF)
    cents = base_trained_cents(spark, SF, split)
    pop = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") >= 1
    ).select("vec_id", "embedding")
    a = {
        (r["vec_id"], r["cid"])
        for r in route_to_centroids(pop, cents).collect()
    }
    b = {
        (r["vec_id"], r["cid"])
        for r in route_to_centroids_codegen(pop, cents).collect()
    }
    assert a == b
