"""§2.Z operator verification (staged first, REGISTERED later in r11).

Each §2.Z op runs the exact same vanilla-shaped check the driver
applies: Spark result vs its DuckDB oracle, column names + row count +
canonical values — plus the property tests that pin each op's
measurement discipline (S-curve shape vs LSH theory, confusion
identities against the underlying registered gates, recall
monotonicity and decision margins, plan guards). These tests predate
the registration (they were the first half of the registration gate)
and stay as the module-local parity+property suite; the registry-wide
sweeps now cover the three ops too, with `vec_ann_recall` and
`text_filter_agreement` on the cartesian allowlist (broadcast Q-row
query block / inherited 1-row scalar BNLJ renderings).
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


def test_minhash_calibration_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions9 import (
        text_minhash_calibration,
        text_minhash_calibration_oracle,
    )

    _assert_staged_parity(
        text_minhash_calibration, text_minhash_calibration_oracle(), spark
    )


def test_filter_agreement_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions9 import (
        text_filter_agreement,
        text_filter_agreement_oracle,
    )

    _assert_staged_parity(
        text_filter_agreement, text_filter_agreement_oracle(SF), spark
    )


def test_ann_recall_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions9 import (
        vec_ann_recall,
        vec_ann_recall_oracle,
    )

    _assert_staged_parity(vec_ann_recall, vec_ann_recall_oracle(SF), spark)


def test_calibration_curve_has_the_s_shape(spark):
    """The measured catch rate must reproduce the 1-(1-s^r)^b banding
    probability at each fraction's POOLED Jaccard — the property that
    makes the op a calibration, not just a counter. Binomial noise over
    n_docs bounds the allowed deviation (±5 pp at n = 500)."""
    from storm_netmonitor_spark.operators.extensions9 import (
        _CAL_BANDS,
        _CAL_SEEDS,
        text_minhash_calibration,
    )

    rows = {
        r["frac_pct"]: r
        for r in text_minhash_calibration(spark, SF).collect()
    }
    rpb = len(_CAL_SEEDS) // _CAL_BANDS
    prev = -1.0
    for f in sorted(rows):
        r = rows[f]
        jac = r["pooled_jaccard"]
        theory = 1.0 - (1.0 - jac**rpb) ** _CAL_BANDS
        measured = r["n_caught"] / r["n_docs"]
        assert abs(measured - theory) < 0.05, (f, measured, theory)
        assert measured >= prev, "catch rate must be monotone in fraction"
        prev = measured
    # the merge-contract anchor: at ~0.9 Jaccard the catch rate is ~1
    assert rows[max(rows)]["n_caught"] >= rows[max(rows)]["n_docs"] - 2


def test_calibration_plan_is_pure_jvm_single_exchange(spark):
    """One codegen'd scan + one 4-row keyed exchange: no Python eval
    nodes, no cartesian, no unpartitioned window anywhere in the plan."""
    from storm_netmonitor_spark.operators.extensions9 import (
        text_minhash_calibration,
    )

    plan = text_minhash_calibration(spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} in plan:\n{plan}"


def test_agreement_confusion_identities(spark):
    """Cell sums must tile the corpus for every gate pair, and each
    gate's marginal keep count must equal the REGISTERED op's own keep
    count — the audit may not drift from the decisions it audits."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators.corpus import text_quality_gopher
    from storm_netmonitor_spark.operators.corpus2 import (
        text_perplexity_unigram,
    )
    from storm_netmonitor_spark.operators.extensions5 import text_ppl_buckets
    from storm_netmonitor_spark.operators.extensions9 import (
        text_filter_agreement,
    )

    n_docs = 500
    keeps = {
        "ppl": text_perplexity_unigram(spark, SF)
        .filter("keep").count(),
        "gopher": text_quality_gopher(spark, SF).filter("keep").count(),
        "tercile": text_ppl_buckets(spark, SF)
        .filter(F.col("bucket") != "tail").count(),
    }
    for r in text_filter_agreement(spark, SF).collect():
        cells = (
            r["n_both_keep"] + r["n_only_a"] + r["n_only_b"] + r["n_both_drop"]
        )
        assert cells == n_docs, r
        assert r["n_both_keep"] + r["n_only_a"] == keeps[r["gate_a"]], r
        assert r["n_both_keep"] + r["n_only_b"] == keeps[r["gate_b"]], r
        agree = r["n_both_keep"] + r["n_both_drop"]
        assert abs(r["agree_pct"] - agree / n_docs) < 1e-9, r


def test_recall_monotone_and_bounded(spark):
    """Recall@10 is a count of exact-top-10 members found — per query it
    must be in [0, 10] and non-decreasing in nprobe (a larger probe set
    is a superset, so the top-10 can only gain exact members or swap in
    better ones already counted)."""
    from storm_netmonitor_spark.operators.extensions9 import (
        _REC_PROBES,
        vec_ann_recall,
    )

    rows = vec_ann_recall(spark, SF).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in rows:
        assert 0 <= r["hits_at_10"] <= 10
        by_q.setdefault(r["q_id"], {})[r["nprobe"]] = r["hits_at_10"]
    for q, curve in by_q.items():
        assert sorted(curve) == sorted(_REC_PROBES)
        vals = [curve[p] for p in sorted(curve)]
        assert vals == sorted(vals), (q, curve)
    # the headline: the sweep's top end beats its bottom end on average
    mean = lambda p: sum(c[p] for c in by_q.values()) / len(by_q)  # noqa: E731
    assert mean(max(_REC_PROBES)) > mean(min(_REC_PROBES))


def test_recall_decision_margins(spark):
    """Margin audit for the two float-adjacent decisions: (1) every
    query's probe ranking gap at each swept boundary, (2) every query's
    exact and per-probe top-10 boundary gap in the DECIMAL sims — both
    must clear thresholds far above the float-vs-SQL accumulation error
    (~1e-13) and the decimal-6 quantum (1e-6)."""
    import numpy as np
    import pyarrow.parquet as pq

    from storm_netmonitor_spark.operators.extensions9 import (
        _REC_K,
        _REC_PROBES,
        _REC_QUERIES,
    )
    from storm_netmonitor_spark.operators.vectors import ivf_index

    _, cents = ivf_index(spark, SF)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t.column("vec_id"))
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    cmat = np.array(cents, dtype=np.float64)
    min_probe_gap = np.inf
    min_rank_gap = np.inf
    for q in range(_REC_QUERIES):
        qv = emb[ids == q][0]
        dots = np.sort(cmat @ qv)[::-1]
        for p in _REC_PROBES:
            if p < len(dots):
                min_probe_gap = min(min_probe_gap, dots[p - 1] - dots[p])
        mask = (ids != 0) & (ids != q)
        sims = np.round(emb[mask] @ qv, 6)
        order = np.sort(sims)[::-1]
        min_rank_gap = min(min_rank_gap, order[_REC_K - 1] - order[_REC_K])
    assert min_probe_gap > 1e-6, min_probe_gap
    # decimal-6 sims: a boundary GAP of 0 is a tie (broken by vec_id
    # identically in both engines); a nonzero gap must be ≥ one quantum
    assert min_rank_gap == 0 or min_rank_gap >= 1e-6 - 1e-12, min_rank_gap


def test_recall_plan_guards(spark):
    """The only pairwise term is the broadcast Q-row query block (ONE
    BroadcastNestedLoopJoin, never a CartesianProduct), and every rank
    window is partitioned — no SinglePartition funnel."""
    from storm_netmonitor_spark.operators.extensions9 import vec_ann_recall

    plan = vec_ann_recall(spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,]+),", plan):
        first = m.group(1).strip()
        assert not first.startswith("specifiedwindowframe"), (
            f"unpartitioned window in plan:\n{plan}"
        )


@pytest.mark.parametrize(
    "name",
    ["text_minhash_calibration", "text_filter_agreement", "vec_ann_recall"],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions9 as e9

    fn = getattr(e9, name)
    c1, r1 = run_spark(fn, spark, SF)
    c2, r2 = run_spark(fn, spark, SF)
    assert canon_rows(c1, r1) == canon_rows(c2, r2)
