"""Round-14 candidate verification, second batch (SURVEY §2.AI —
staged, NOT registered).

Each §2.AI candidate runs the exact same vanilla-shaped check the
driver will apply once it is registered in round 14: Spark result vs
its DuckDB oracle — plus the property tests that pin the
composition-integrity discipline. The corpus legitimately carries zero
below-l groups and a single verified near-dup pair at the test SFs —
those zeros are oracle-agreed, and DETECTION is proven by plants
through the factored kernels (the decontamination-plant precedent).
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


def test_source_overlap_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions18 import (
        text_source_overlap_matrix,
        text_source_overlap_matrix_oracle,
    )

    _assert_staged_parity(
        text_source_overlap_matrix, text_source_overlap_matrix_oracle(), spark
    )


def test_l_diversity_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions18 import (
        agg_l_diversity,
        agg_l_diversity_oracle,
    )

    _assert_staged_parity(agg_l_diversity, agg_l_diversity_oracle(), spark)


def test_dedup_rate_curve_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions18 import (
        pipeline_dedup_rate_curve,
        pipeline_dedup_rate_curve_oracle,
    )

    _assert_staged_parity(
        pipeline_dedup_rate_curve, pipeline_dedup_rate_curve_oracle(), spark
    )


def test_source_overlap_census_invariants(spark):
    """Every source pair appears exactly once (a < b over sources with
    at least one shared gram), shared counts are bounded by both set
    sizes, and jaccard sits in (0, 1]."""
    from storm_netmonitor_spark.operators.extensions18 import (
        text_source_overlap_matrix,
    )

    rows = text_source_overlap_matrix(spark, SF).collect()
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        key = (r["source_a"], r["source_b"])
        assert key not in seen
        seen.add(key)
        assert 0 < r["n_shared"] <= min(r["n_grams_a"], r["n_grams_b"])
        assert 0 < r["jaccard"] <= 1


def test_source_overlap_detects_a_planted_mirror(spark):
    """A source that mirrors another verbatim must census at
    jaccard 1.0; a disjoint source must not pair with either."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions18 import (
        source_overlap_over,
    )

    docs = tiny_local_frame(
        spark,
        [
            ("orig", "alpha beta gamma delta epsilon"),
            ("mirror", "alpha beta gamma delta epsilon"),
            ("disjoint", "one two three four five"),
        ],
        "source string, text string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_over(docs).collect()
    }
    assert set(rows) == {("mirror", "orig")}
    m = rows[("mirror", "orig")]
    assert m["n_shared"] == m["n_grams_a"] == m["n_grams_b"] == 3
    assert m["jaccard"] == 1.0


def test_l_diversity_detects_a_planted_homogeneous_group(spark):
    """A group whose members all share the sensitive value must count
    below-l with its full row exposure and drag min_l to 1 — the
    corpus's zero is oracle-agreed; the plant proves detection."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions18 import (
        l_diversity_summary,
    )

    df = tiny_local_frame(
        spark,
        [
            # homogeneous group: 4 rows, ONE sensitive value
            ("g1", "s", 7), ("g1", "s", 7), ("g1", "s", 7), ("g1", "s", 7),
            # diverse group: 3 rows, 3 sensitive values
            ("g2", "s", 1), ("g2", "s", 2), ("g2", "s", 3),
        ],
        "qa string, qb string, sens int",
    )
    row = l_diversity_summary(df, ["qa", "qb"], F.col("sens"), 3).collect()[0]
    assert row["n_groups"] == 2
    assert row["groups_below_l"] == 1
    assert row["rows_at_risk"] == 4
    assert row["min_l"] == 1
    assert row["n_rows"] == 7


def test_dedup_curve_is_monotone_and_conserves(spark):
    """n_pairs and n_docs_touched are non-increasing in the threshold,
    every threshold row is present even when empty, docs touched is
    bounded by 2×pairs, and the share reconstructs from the counts."""
    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions18 import (
        _CURVE_THRESHOLDS,
        pipeline_dedup_rate_curve,
    )

    rows = sorted(
        pipeline_dedup_rate_curve(spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == list(_CURVE_THRESHOLDS)
    n_docs = load_table(spark, SF, "documents").count()
    prev_p = prev_d = None
    for r in rows:
        assert 0 <= r["n_docs_touched"] <= 2 * r["n_pairs"]
        assert abs(r["docs_share"] - r["n_docs_touched"] / n_docs) < 1e-5
        if prev_p is not None:
            assert r["n_pairs"] <= prev_p and r["n_docs_touched"] <= prev_d
        prev_p, prev_d = r["n_pairs"], r["n_docs_touched"]


def test_dedup_curve_kernel_on_planted_pairs(spark):
    """A planted pair population exercising every bucket: the kernel
    must count pairs at-or-above each threshold and dedup the touched
    docs across overlapping pairs."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions18 import (
        dedup_curve_over,
    )

    pairs = tiny_local_frame(
        spark,
        [
            (1, 2, 0.06),   # counts only at 0.05
            (2, 3, 0.15),   # counts at 0.05, 0.1
            (3, 4, 0.25),   # + 0.2
            (4, 5, 0.45),   # + 0.4
            (1, 5, 0.45),   # + 0.4 (docs overlap with others)
        ],
        "doc_a long, doc_b long, jaccard double",
    )
    rows = {
        r["threshold"]: r
        for r in dedup_curve_over(pairs, (0.05, 0.1, 0.2, 0.4), 10).collect()
    }
    assert rows[0.05]["n_pairs"] == 5 and rows[0.05]["n_docs_touched"] == 5
    assert rows[0.1]["n_pairs"] == 4 and rows[0.1]["n_docs_touched"] == 5
    assert rows[0.2]["n_pairs"] == 3 and rows[0.2]["n_docs_touched"] == 4
    assert rows[0.4]["n_pairs"] == 2 and rows[0.4]["n_docs_touched"] == 3
    assert rows[0.4]["docs_share"] == 0.3


def test_staged_plan_shapes(spark):
    """100 TB plan pins for the batch: the overlap census self-join is
    a gram-keyed EQUI join (never a cartesian/nested loop), the
    l-diversity summary has no Expand (two plain hash aggregates), and
    the curve's threshold frame is a local relation (no scan job for a
    4-row VALUES table)."""
    from storm_netmonitor_spark.operators import extensions18 as e18

    p = (
        e18.text_source_overlap_matrix(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    p2 = (
        e18.agg_l_diversity(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p2
    assert "Expand" not in p2  # single-distinct stays a two-level agg

    p3 = (
        e18.pipeline_dedup_rate_curve(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LocalTableScan" in p3 or "LocalRelation" in p3
    # the T-row threshold attach legitimately renders as a broadcast
    # nested loop (bounded inner side — the vec_batch_knn class); a
    # CartesianProduct never does
    assert "CartesianProduct" not in p3


def test_bpe_vocab_cap_is_take_ordered(spark):
    """The §2.AH BPE word-table cap must render as
    TakeOrderedAndProject (limit-bounded fetch), never a global sort —
    the cap is what makes the induction collect model-sized."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions17 import _BPE_WORD_CAP

    d = load_table(spark, SF, "documents")
    words = (
        d.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .orderBy(F.desc("wc"), "w")
        .limit(_BPE_WORD_CAP)
    )
    p = words._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p


@pytest.mark.parametrize(
    "name",
    [
        "text_source_overlap_matrix",
        "agg_l_diversity",
        "pipeline_dedup_rate_curve",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions18 as e18

    fn = getattr(e18, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )


def _duck_on_docs(sql: str, rows):
    """Run an oracle against a SYNTHETIC (source, text) documents view —
    the corpus-independence harness for the gram-window guard."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents(source VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", list(rows))
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        out = cur.fetchall()
    finally:
        con.close()
    return cols, out


def test_source_overlap_short_docs_agree_with_oracle(spark):
    """ADVICE r13 regression: a doc with < 3 tokens contributes NO
    grams in BOTH engines (the old greatest(size-2, 1) rendering
    emitted one short/empty gram Spark-side, making parity depend on
    an every-doc->=3-token corpus precondition). Engine and oracle
    must agree on a corpus that violates that precondition."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions18 import (
        source_overlap_over,
        text_source_overlap_matrix_oracle,
    )

    rows = [
        ("a", "alpha beta gamma delta"),
        ("a", "two tokens"),          # < 3 tokens: zero grams
        ("b", "alpha beta gamma"),
        ("b", ""),                    # zero tokens: zero grams
        ("c", "solo"),                # source with ONLY short docs:
        ("c", "just two"),            # zero grams -> pairs with nobody
    ]
    docs = tiny_local_frame(spark, rows, "source string, text string")
    s_cols, s_rows = docs.sparkSession, source_overlap_over(docs)
    s_cols, s_rows = s_rows.columns, s_rows.collect()
    o_cols, o_rows = _duck_on_docs(text_source_overlap_matrix_oracle(), rows)
    assert sorted(s_cols) == sorted(o_cols)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)
    got = {(r["source_a"], r["source_b"]): r for r in s_rows}
    # only a<->b pair (c has zero grams); short docs added no grams
    assert set(got) == {("a", "b")}
    ab = got[("a", "b")]
    assert (ab["n_grams_a"], ab["n_grams_b"], ab["n_shared"]) == (2, 1, 1)
