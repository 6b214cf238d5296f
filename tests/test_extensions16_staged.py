"""Round-13 candidate verification (SURVEY §2.AG — staged, NOT registered).

Each §2.AG candidate runs the exact same vanilla-shaped check the driver
will apply once it is registered in round 13: Spark result vs its DuckDB
oracle — plus the property tests that pin the quantization-quality
discipline (assignment conservation, cross-op error-total identity with
the registered encode, churn-census marginals equal to the two routing
censuses, metric bounds).
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


def test_pq_distortion_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions16 import (
        vec_pq_distortion,
        vec_pq_distortion_oracle,
    )

    _assert_staged_parity(
        vec_pq_distortion, vec_pq_distortion_oracle(SF), spark
    )


def test_pq_recall_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions16 import (
        vec_pq_recall,
        vec_pq_recall_oracle,
    )

    _assert_staged_parity(vec_pq_recall, vec_pq_recall_oracle(SF), spark)


def test_snapshot_diff_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions16 import (
        vec_index_snapshot_diff,
        vec_index_snapshot_diff_oracle,
    )

    _assert_staged_parity(
        vec_index_snapshot_diff, vec_index_snapshot_diff_oracle(SF), spark
    )


def test_pq_distortion_conserves_and_matches_encode_totals(spark):
    """Every vector assigns exactly one code per subspace (Σ n_assigned
    = N × subs), and the census's error totals equal the registered
    encode's d2 values summed directly — cross-op identity, exact at
    the e6 integer scale."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions16 import (
        vec_pq_distortion,
    )
    from storm_netmonitor_spark.operators.vectors import (
        _PQ_SUBS,
        vec_pq_encode,
    )

    rows = vec_pq_distortion(spark, SF).collect()
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_assigned"] for r in rows) == n_vecs * _PQ_SUBS
    want = {
        (r["sub"], r["code"]): (r["n"], r["tot"])
        for r in vec_pq_encode(spark, SF)
        .groupBy("sub", "code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("d2") * 1000000).cast("long")).alias("tot"),
        )
        .collect()
    }
    for r in rows:
        key = (r["sub"], r["code"])
        if key in want:
            assert (r["n_assigned"], r["total_d2_e6"]) == want[key]
        else:
            assert r["n_assigned"] == 0 and r["total_d2_e6"] == 0
            assert r["mean_d2"] == 0.0


def test_pq_recall_bounds_and_signal(spark):
    """0 ≤ recall ≤ 1 per query; the fine quantizer must retrieve a
    meaningful share of the exact neighbors on this corpus (mean
    recall > 0.2 — PQ at 8×16 codes is lossy but not random)."""
    from storm_netmonitor_spark.operators.extensions16 import (
        _PQR_K,
        vec_pq_recall,
    )

    rows = vec_pq_recall(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r[f"hits_at_{_PQR_K}"] <= _PQR_K
        assert abs(r["recall_pct"] - r[f"hits_at_{_PQR_K}"] / _PQR_K) < 1e-6
    mean = sum(r["recall_pct"] for r in rows) / len(rows)
    assert mean > 0.2, f"ADC ranking is near-random (mean recall {mean})"


def test_snapshot_diff_marginals_equal_the_two_routings(spark):
    """Census identities: Σ n = corpus size; row sums (per cid_from)
    equal the base-trained routing census; column sums (per cid_to)
    equal the full-trained routing census; share_of_from values per
    source cell reconstruct its total."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators.extensions7 import (
        _embed_split,
        base_trained_cents,
        route_to_centroids,
    )
    from storm_netmonitor_spark.operators.extensions16 import (
        vec_index_snapshot_diff,
    )
    from storm_netmonitor_spark.operators.vectors import ivf_index

    rows = vec_index_snapshot_diff(spark, SF).collect()
    corpus, full_cents = ivf_index(spark, SF)
    base_cents = base_trained_cents(spark, SF, _embed_split(spark, SF))
    n_corpus = corpus.count()
    assert sum(r["n"] for r in rows) == n_corpus

    def census(cents):
        return {
            r["cid"]: r["n"]
            for r in route_to_centroids(corpus, cents)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    base_census, full_census = census(base_cents), census(full_cents)
    from collections import defaultdict

    row_sum, col_sum, share_sum = (
        defaultdict(int),
        defaultdict(int),
        defaultdict(float),
    )
    for r in rows:
        row_sum[r["cid_from"]] += r["n"]
        col_sum[r["cid_to"]] += r["n"]
        share_sum[r["cid_from"]] += r["share_of_from"]
        assert r["moved"] == (r["cid_from"] != r["cid_to"])
    assert {k: v for k, v in row_sum.items() if v} == base_census
    assert {k: v for k, v in col_sum.items() if v} == full_census
    for cid, tot in row_sum.items():
        if tot:
            assert abs(share_sum[cid] - 1.0) < 1e-4, (cid, share_sum[cid])


@pytest.mark.parametrize(
    "name",
    ["vec_pq_distortion", "vec_pq_recall", "vec_index_snapshot_diff"],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions16 as e16

    fn = getattr(e16, name)
    c1, r1 = run_spark(fn, spark, SF)
    c2, r2 = run_spark(fn, spark, SF)
    assert canon_rows(c1, r1) == canon_rows(c2, r2)
