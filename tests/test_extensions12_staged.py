"""§2.AC verification (REGISTERED in round 12; staged at round-11 close).

Each §2.AC op runs the exact same vanilla-shaped check the driver
applies: Spark result vs its DuckDB oracle, column names + row count +
canonical values — plus the property tests that pin the frozen-model
discipline (planted-OOV detection with a hand-computed pseudo-count
score, standing docs have zero OOV under their own LM, gate-census
conservation against the composed registered ops, the streaming fold's
≥2-batch shape). These were the registration gate's first half; they
stay green as the batch's standing parity suite now that the ops are in
the registry.
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


def test_frozen_score_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions12 import (
        text_ppl_frozen_score,
        text_ppl_frozen_score_oracle,
    )

    _assert_staged_parity(
        text_ppl_frozen_score, text_ppl_frozen_score_oracle(), spark
    )


def test_gate_drift_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions12 import (
        quality_gate_drift,
        quality_gate_drift_oracle,
    )

    _assert_staged_parity(
        quality_gate_drift, quality_gate_drift_oracle(SF), spark
    )


def test_stream_gate_scores_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions12 import (
        stream_gate_scores,
        stream_gate_scores_oracle,
    )

    _assert_staged_parity(
        stream_gate_scores, stream_gate_scores_oracle(), spark
    )


def test_frozen_kernel_detects_planted_oov(spark):
    """The OOV contract, hand-computed: a doc whose tokens are entirely
    out of vocabulary takes the 1/total pseudo-count for every token —
    xent = ln(total) exactly — and mixed docs count their OOV tokens."""
    import math

    from storm_netmonitor_spark.operators.extensions12 import (
        frozen_ppl_score,
    )

    # toy frozen LM: "a"×3, "b"×1, total 4
    lm = spark.createDataFrame(
        [("a", 3, 4), ("b", 1, 4)], "w string, cw long, total long"
    )
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "zz qq"), (3, "a zz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in frozen_ppl_score(docs, lm).collect()}
    assert out[1]["oov_tokens"] == 0
    assert out[2]["oov_tokens"] == 2
    assert out[3]["oov_tokens"] == 1
    # all-OOV doc: every token scores -ln(1/4) = ln 4
    assert abs(out[2]["xent"] - round(math.log(4), 6)) < 2e-6
    # mixed doc: (-ln(3/4) + -ln(1/4)) / 2
    expect = (-math.log(3 / 4) + math.log(4)) / 2
    assert abs(out[3]["xent"] - expect) < 2e-6


def test_standing_docs_have_zero_oov_under_their_own_lm(spark):
    """The frozen LM is trained ON the standing corpus, so standing docs
    can never be out of vocabulary — the structural sanity check that
    the split and the training population line up."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions8 import _doc_split
    from storm_netmonitor_spark.operators.extensions12 import (
        _frozen_lm,
        frozen_ppl_score,
    )

    split = _doc_split(spark, SF)
    lm = _frozen_lm(spark, SF, split)
    standing = load_table(spark, SF, "documents").filter(
        F.col("doc_id") < split
    )
    assert (
        frozen_ppl_score(standing, lm)
        .filter(F.col("oov_tokens") > 0)
        .count()
        == 0
    )


def test_frozen_score_exercises_both_keep_branches(spark):
    from storm_netmonitor_spark.operators.extensions12 import (
        text_ppl_frozen_score,
    )

    rows = text_ppl_frozen_score(spark, SF).collect()
    keeps = sum(1 for r in rows if r["keep"])
    assert 0 < keeps < len(rows)


def test_gate_drift_census_identities(spark):
    """Census conservation against the composed registered decisions:
    the four cells tile both populations exactly, the gopher margins
    equal the registered op's keep counts per population, and the
    ppl margins equal the frozen scorer's."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.corpus import text_quality_gopher
    from storm_netmonitor_spark.operators.extensions8 import _doc_split
    from storm_netmonitor_spark.operators.extensions12 import (
        _frozen_lm,
        frozen_ppl_score,
        quality_gate_drift,
    )

    split = _doc_split(spark, SF)
    d = load_table(spark, SF, "documents")
    n_std = d.filter(F.col("doc_id") < split).count()
    n_del = d.filter(F.col("doc_id") >= split).count()
    cells = {r["cid"]: r for r in quality_gate_drift(spark, SF).collect()}
    assert set(cells) == {0, 1, 2, 3}
    assert sum(r["n_base"] for r in cells.values()) == n_std
    assert sum(r["n_delta"] for r in cells.values()) == n_del
    for cid, r in cells.items():
        assert r["gopher_keep"] == (cid >= 2)
        assert r["ppl_keep"] == (cid % 2 == 1)
    gop = text_quality_gopher(spark, SF).withColumn(
        "pop", (F.col("doc_id") >= split).cast("int")
    )
    gk_std = gop.filter("keep and pop = 0").count()
    gk_del = gop.filter("keep and pop = 1").count()
    assert cells[2]["n_base"] + cells[3]["n_base"] == gk_std
    assert cells[2]["n_delta"] + cells[3]["n_delta"] == gk_del
    scores = frozen_ppl_score(d, _frozen_lm(spark, SF, split))
    pk_del = scores.filter(
        (F.col("doc_id") >= split) & F.col("keep")
    ).count()
    assert cells[1]["n_delta"] + cells[3]["n_delta"] == pk_del


def test_stream_gate_scores_folds_multiple_batches(spark):
    from storm_netmonitor_spark.operators import extensions12 as e12

    out = e12.stream_gate_scores(spark, SF)
    assert out.count() == 100
    assert len(e12.LAST_GATE_BATCH_WALLS) >= 2


def test_frozen_score_plan_guards(spark):
    """The scorer's only nested-loop shape is the 1-row total attach
    (the text_perplexity_unigram allowlisted class); the LM join is
    broadcast-class, never a cartesian."""
    from storm_netmonitor_spark.operators.extensions12 import (
        text_ppl_frozen_score,
    )

    plan = text_ppl_frozen_score(spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


@pytest.mark.parametrize(
    "name",
    ["text_ppl_frozen_score", "quality_gate_drift", "stream_gate_scores"],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions12 as e12

    fn = getattr(e12, name)
    c1, r1 = run_spark(fn, spark, SF)
    c2, r2 = run_spark(fn, spark, SF)
    assert canon_rows(c1, r1) == canon_rows(c2, r2)


def test_frozen_score_emits_row_for_empty_token_doc(spark):
    """ADVICE r11: a doc whose text tokenizes to nothing must NOT vanish
    from the scored frame — the contract is 'score the delta', so it
    gets an explicit (n_tokens=0, oov_tokens=0, xent=NULL, keep=false)
    row instead of a silent gap."""
    from storm_netmonitor_spark.operators.extensions12 import (
        _frozen_lm,
        frozen_ppl_score,
    )
    from storm_netmonitor_spark.operators.extensions8 import _doc_split

    split = _doc_split(spark, SF)
    lm = _frozen_lm(spark, SF, split)
    docs = spark.createDataFrame(
        [(900001, ""), (900002, "   "), (900003, "alpha beta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in frozen_ppl_score(docs, lm).collect()}
    assert set(rows) == {900001, 900002, 900003}
    for did in (900001, 900002):
        r = rows[did]
        assert r["n_tokens"] == 0 and r["oov_tokens"] == 0
        assert r["xent"] is None and r["keep"] is False
    assert rows[900003]["n_tokens"] == 2 and rows[900003]["xent"] is not None
