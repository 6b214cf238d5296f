"""Round-11 candidate verification (SURVEY §2.W — staged, NOT registered).

Each §2.W candidate runs the exact same vanilla-shaped check the driver
will apply once it is registered in round 11: Spark result vs its DuckDB
oracle, column names + row count + canonical values. Keeping these green
all round makes the r11 registration a 3-line diff with zero new risk.
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


def test_multimodal_joined_dedup_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions6 import (
        multimodal_joined_dedup,
        multimodal_joined_dedup_oracle,
    )

    _assert_staged_parity(
        multimodal_joined_dedup, multimodal_joined_dedup_oracle(), spark
    )


def test_joined_dedup_components_refine_both_modalities(spark):
    """The union-edge components must be a COARSENING of each single
    modality's components (every text-only or vec-only duplicate pair
    stays together), and doc_id ≡ vec_id (the §2.W contract) must hold."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.corpus import (
        text_dedup_components,
    )
    from storm_netmonitor_spark.operators.extensions6 import (
        multimodal_joined_dedup,
    )

    d = load_table(spark, SF, "documents").select("doc_id")
    e = load_table(spark, SF, "embeddings").select("vec_id")
    assert d.join(e, d.doc_id == e.vec_id).count() == d.count() == e.count()

    joined = {
        r["doc_id"]: r["component"]
        for r in multimodal_joined_dedup(spark, SF).collect()
    }
    text_only = {
        r["doc_id"]: r["component"]
        for r in text_dedup_components(spark, SF).collect()
    }
    assert set(joined) == set(text_only)
    # same text component => same joined component (coarsening)
    by_text: dict = {}
    for doc, comp in text_only.items():
        by_text.setdefault(comp, set()).add(joined[doc])
    assert all(len(v) == 1 for v in by_text.values())
    # and the joined clustering is at least as coarse
    assert len(set(joined.values())) <= len(set(text_only.values()))
