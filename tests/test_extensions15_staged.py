"""Round-13 candidate verification (SURVEY §2.AF — staged, NOT registered).

Each §2.AF candidate runs the exact same vanilla-shaped check the driver
will apply once it is registered in round 13: Spark result vs its DuckDB
oracle, column names + row count + canonical values — plus the property
tests that pin the ingest-gate discipline (batch-split invariance
against a one-shot reference, cross-op identity with the registered
batch monitor, counter conservation, the ≥2-batch fold shape).
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


def test_decontaminate_gate_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions15 import (
        stream_decontaminate_gate,
        stream_decontaminate_gate_oracle,
    )

    _assert_staged_parity(
        stream_decontaminate_gate, stream_decontaminate_gate_oracle(), spark
    )


def test_pii_gate_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions15 import (
        stream_pii_gate,
        stream_pii_gate_oracle,
    )

    _assert_staged_parity(stream_pii_gate, stream_pii_gate_oracle(), spark)


def test_profile_gate_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions15 import (
        stream_profile_gate,
        stream_profile_gate_oracle,
    )

    _assert_staged_parity(
        stream_profile_gate, stream_profile_gate_oracle(), spark
    )


def test_decon_gate_conserves_and_folds_batches(spark):
    """≥2 committed batches; per-lang n_contaminated + n_kept == n_train;
    the lang totals tile exactly the delta train population."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators import extensions15 as e15
    from storm_netmonitor_spark.operators.corpus import BENCH_SOURCE
    from storm_netmonitor_spark.operators.extensions8 import _doc_split

    rows = e15.stream_decontaminate_gate(spark, SF).collect()
    assert len(e15.LAST_DECON_BATCH_WALLS) >= 2
    split = _doc_split(spark, SF)
    d = load_table(spark, SF, "documents").filter(
        (F.col("doc_id") >= split) & (F.col("source") != BENCH_SOURCE)
    )
    want = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {r["lang"]: r for r in rows}
    assert {k: v["n_train"] for k, v in got.items()} == want
    for r in rows:
        assert r["n_contaminated"] + r["n_kept"] == r["n_train"]
    # at sf0.01 the delta legitimately contains zero contaminated docs
    # (the full corpus has 2, both standing) — detection itself is
    # proven by the planted test below, and the zero here must agree
    # with the oracle (it does: the parity test covers this table)


def test_decon_kernel_detects_planted_contamination(spark):
    """The semi-join really fires: a crafted delta doc embedding 8
    consecutive benchmark tokens is flagged; a clean sibling is not."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators import extensions15 as e15
    from storm_netmonitor_spark.operators.corpus import (
        BENCH_SOURCE,
        DECON_NGRAM,
    )

    bench = e15._bench_grams(spark, SF)
    src_text = (
        load_table(spark, SF, "documents")
        .filter(F.col("source") == BENCH_SOURCE)
        .select("text")
        .first()["text"]
    )
    stolen = " ".join(src_text.lower().split()[:DECON_NGRAM])
    docs = spark.createDataFrame(
        [
            (900001, "en", "prefix words " + stolen + " suffix words"),
            (900002, "en", "completely novel tokens qq ww ee rr tt yy uu ii"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in e15.decon_lang_counts(docs, bench).collect()}
    assert out["en"]["n_train"] == 2
    assert out["en"]["n_contaminated"] == 1
    assert out["en"]["n_kept"] == 1


def test_pii_gate_equals_batch_kernel_on_the_delta(spark):
    """Cross-op identity: the drained table must equal the registered
    scrub kernel applied to the delta in ONE batch — the batch-twin
    contract, row for row."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators import extensions15 as e15
    from storm_netmonitor_spark.operators.corpus import pii_report
    from storm_netmonitor_spark.operators.extensions8 import _doc_split

    split = _doc_split(spark, SF)
    delta = load_table(spark, SF, "documents").filter(
        F.col("doc_id") >= split
    )
    want = {
        r["doc_id"]: tuple(r) for r in pii_report(delta).collect()
    }
    got = {
        r["doc_id"]: tuple(r)
        for r in e15.stream_pii_gate(spark, SF).collect()
    }
    assert got == want
    assert len(e15.LAST_PII_BATCH_WALLS) >= 2


def test_profile_gate_equals_registered_batch_monitor(spark):
    """Cross-op identity: the streaming fold against the persisted
    standing census must equal the registered text_profile_drift
    output exactly (the stream_index_drift ≡ vec_index_drift
    precedent)."""
    from storm_netmonitor_spark.operators import extensions15 as e15
    from storm_netmonitor_spark.operators.extensions8 import (
        text_profile_drift,
    )

    got = sorted(
        tuple(r) for r in e15.stream_profile_gate(spark, SF).collect()
    )
    want = sorted(
        tuple(r) for r in text_profile_drift(spark, SF).collect()
    )
    assert got == want
    assert len(e15.LAST_PROFILE_BATCH_WALLS) >= 2


@pytest.mark.parametrize(
    "name",
    [
        "stream_decontaminate_gate",
        "stream_pii_gate",
        "stream_profile_gate",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions15 as e15

    fn = getattr(e15, name)
    c1, r1 = run_spark(fn, spark, SF)
    c2, r2 = run_spark(fn, spark, SF)
    assert canon_rows(c1, r1) == canon_rows(c2, r2)
