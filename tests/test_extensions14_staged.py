"""Round-13 candidate verification (SURVEY §2.AE — staged, NOT registered).

Each §2.AE candidate runs the exact same vanilla-shaped check the driver
will apply once it is registered in round 13: Spark result vs its DuckDB
oracle, column names + row count + canonical values — plus the property
tests that pin the evaluation discipline (metric bounds and boundary
identities, the integer gain table, cross-op identities against the
registered recall/CC ops, label locality, the streaming fold's ≥2-batch
shape). Keeping these green all round makes the r13 registration a
3-line diff with zero new risk (the §2.W–§2.AD precedent).
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


def test_rank_metrics_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions14 import (
        vec_rank_metrics,
        vec_rank_metrics_oracle,
    )

    _assert_staged_parity(vec_rank_metrics, vec_rank_metrics_oracle(), spark)


def test_community_lpa_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions14 import (
        graph_community_lpa,
        graph_community_lpa_oracle,
    )

    _assert_staged_parity(
        graph_community_lpa, graph_community_lpa_oracle(), spark
    )


def test_serve_recall_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions14 import (
        stream_serve_recall,
        stream_serve_recall_oracle,
    )

    _assert_staged_parity(
        stream_serve_recall, stream_serve_recall_oracle(), spark
    )


def test_gain_table_is_integer_exact_and_decreasing(spark):
    """The cross-engine exactness hinge: the NDCG gain table is a fixed
    integer tuple — first entry exactly 1e6 (1/log2(2)), strictly
    decreasing, k entries — inlined identically into both engines."""
    from storm_netmonitor_spark.operators.extensions14 import (
        _RM_GAINS_E6,
        _RM_IDCG_E6,
        _RM_K,
    )

    assert len(_RM_GAINS_E6) == _RM_K
    assert _RM_GAINS_E6[0] == 1_000_000
    assert all(a > b for a, b in zip(_RM_GAINS_E6, _RM_GAINS_E6[1:]))
    assert _RM_IDCG_E6 == sum(_RM_GAINS_E6)


def test_rank_metric_bounds_and_boundary_identities(spark):
    """0 ≤ mrr, ndcg ≤ 1; with binary relevance and both lists cut at
    k, ndcg = 1 ⇔ every served item is relevant (n_hits = k — position
    gains then sum to IDCG regardless of order), and mrr = 1 ⇔ the
    first served item is relevant."""
    from storm_netmonitor_spark.operators.extensions14 import (
        _RM_K,
        vec_rank_metrics,
    )

    rows = vec_rank_metrics(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["mrr"] <= 1.0 and 0.0 <= r["ndcg"] <= 1.0
        assert (r["ndcg"] == 1.0) == (r["n_hits"] == _RM_K)
        assert (r["mrr"] == 1.0) == (r["first_hit_rank"] == 1)
        assert (r["mrr"] == 0.0) == (r["first_hit_rank"] == 0) == (
            r["n_hits"] == 0
        )


def test_rank_metrics_hits_agree_with_registered_recall(spark):
    """Cross-op identity: n_hits at the serving default must equal the
    registered recall curve's hits_at_10 at nprobe = 6 — one candidate
    semantics, two metric families."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators.extensions9 import vec_ann_recall
    from storm_netmonitor_spark.operators.extensions14 import (
        vec_rank_metrics,
    )
    from storm_netmonitor_spark.operators.vectors import IVF_NPROBE

    rank_hits = {
        r["q_id"]: r["n_hits"] for r in vec_rank_metrics(spark, SF).collect()
    }
    recall_hits = {
        r["q_id"]: r["hits_at_10"]
        for r in vec_ann_recall(spark, SF)
        .filter(F.col("nprobe") == IVF_NPROBE)
        .collect()
    }
    assert rank_hits == recall_hits


def test_lpa_labels_stay_inside_cc_components(spark):
    """Label locality: a label only ever travels along edges, so after
    any number of rounds a node's community label must belong to the
    node's own connected component (the registered CC op's labeling).
    Isolated docs keep their own id."""
    from storm_netmonitor_spark.operators.corpus import (
        text_dedup_components,
    )
    from storm_netmonitor_spark.operators.extensions14 import (
        graph_community_lpa,
    )

    comp = {
        r["doc_id"]: r["component"]
        for r in text_dedup_components(spark, SF).collect()
    }
    lpa = {
        r["doc_id"]: r["community"]
        for r in graph_community_lpa(spark, SF).collect()
    }
    assert set(lpa) == set(comp)
    singletons = {
        d for d, c in comp.items()
        if sum(1 for x in comp.values() if x == c) == 1
    }
    for doc, label in lpa.items():
        # the label is a doc id from the same component
        assert comp[label] == comp[doc], (doc, label)
        if doc in singletons:
            assert label == doc


def test_serve_recall_folds_batches_and_matches_served_quality(spark):
    """≥2 committed batches (per-batch scoring, not one big batch), one
    row per served query id, and for vec_id 0 — the registered op's
    canonical query — the hit count equals the recall curve's at the
    serving default (both sides exclude the self-match for qid 0 by
    corpus construction)."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators import extensions14 as e14
    from storm_netmonitor_spark.operators.extensions6 import (
        STREAM_ANN_QUERY_IDS,
    )
    from storm_netmonitor_spark.operators.extensions9 import vec_ann_recall
    from storm_netmonitor_spark.operators.vectors import IVF_NPROBE

    out = {r["qid"]: r for r in e14.stream_serve_recall(spark, SF).collect()}
    assert set(out) == set(STREAM_ANN_QUERY_IDS)
    assert len(e14.LAST_SERVE_RECALL_WALLS) >= 2
    for r in out.values():
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_pct"] - r["n_hits"] / 10) < 1e-6
    rec0 = (
        vec_ann_recall(spark, SF)
        .filter((F.col("q_id") == 0) & (F.col("nprobe") == IVF_NPROBE))
        .collect()[0]["hits_at_10"]
    )
    assert out[0]["n_hits"] == rec0


@pytest.mark.parametrize(
    "name",
    ["vec_rank_metrics", "graph_community_lpa", "stream_serve_recall"],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions14 as e14

    fn = getattr(e14, name)
    c1, r1 = run_spark(fn, spark, SF)
    c2, r2 = run_spark(fn, spark, SF)
    assert canon_rows(c1, r1) == canon_rows(c2, r2)
