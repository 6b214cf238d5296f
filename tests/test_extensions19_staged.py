"""Round-14 candidate verification, third batch (SURVEY §2.AJ —
staged, NOT registered).

Each §2.AJ candidate runs the exact same vanilla-shaped check the
driver will apply once it is registered in round 14: Spark result vs
its DuckDB oracle — plus the property tests that pin the serving
discipline: the frozen-tokenizer apply against a pure-python apply on
planted words, the zero-merge fertility identity (tokens == chars),
packing conservation against the corpus censuses, and planted
burst / regular streams through the Fano kernel.
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


def test_bpe_fertility_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions19 import (
        text_bpe_fertility,
        text_bpe_fertility_oracle,
    )

    _assert_staged_parity(
        text_bpe_fertility, text_bpe_fertility_oracle(), spark
    )


def test_pack_efficiency_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions19 import (
        pipeline_pack_efficiency,
        pipeline_pack_efficiency_oracle,
    )

    _assert_staged_parity(
        pipeline_pack_efficiency, pipeline_pack_efficiency_oracle(), spark
    )


def test_burstiness_fano_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions19 import (
        events_burstiness_fano,
        events_burstiness_fano_oracle,
    )

    _assert_staged_parity(
        events_burstiness_fano, events_burstiness_fano_oracle(), spark
    )


def test_apply_kernel_matches_python_apply_on_planted_words(spark):
    """The frozen-merge apply (the Arrow row-local tokenize kernel)
    must count tokens exactly like a literal greedy apply — including
    same-symbol runs and merged-symbol collisions — and agree with the
    TRAINING kernel's distributed islands merge on the same words."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions17 import (
        chars_seq_frame,
        merge_pair,
    )
    from storm_netmonitor_spark.operators.extensions19 import (
        apply_merges_token_counts,
    )

    words = ["abababab", "aab", "bba", "aaaa", "ab", "b", "abba"]
    merges = [(1, "a", "b", "ab", 0), (2, "ab", "ab", "abab", 0)]

    def py_apply(w):
        s = list(w)
        for _, left, right, _, _ in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    frame = tiny_local_frame(
        spark, [(w, 1) for w in words], "w string, wc long"
    )
    got = {
        r["w"]: r["tok_n"]
        for r in apply_merges_token_counts(frame, merges).collect()
    }
    for w in words:
        assert got[w] == len(py_apply(w)), (w, got[w], py_apply(w))

    # cross-path identity: the training-side distributed islands merge
    # produces the same token counts on the same words
    seq = chars_seq_frame(frame)
    for _, left, right, _, _ in merges:
        seq = merge_pair(seq, left, right)
    islands = {
        r["seq"].replace(" ", ""): len(r["seq"].split(" "))
        for r in seq.collect()
    }
    assert islands == got


def test_fertility_zero_merge_identity_and_bounds(spark):
    """With an EMPTY merge table every word tokenizes at char count —
    so the fertility table folds to chars/word exactly; under the
    trained merges tokens sit in [words, chars] and fertility
    reconstructs from the counters."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions19 import (
        apply_merges_token_counts,
        text_bpe_fertility,
    )

    rows = text_bpe_fertility(spark, SF).collect()
    for r in rows:
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert abs(r["fertility"] - r["n_tokens"] / r["n_words"]) < 1e-5

    d = load_table(spark, SF, "documents")
    words = (
        d.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    zero = apply_merges_token_counts(words, [])
    bad = zero.filter(F.col("tok_n") != F.length("w")).count()
    assert bad == 0


def test_pack_efficiency_conserves_the_corpus(spark):
    """Bin censuses must tile the corpus exactly: Σ docs = |documents|,
    Σ chars = corpus chars per language; overflow is only possible via
    a boundary-straddling doc (max bin ≤ budget + max doc)."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions19 import (
        pipeline_pack_efficiency,
    )
    from storm_netmonitor_spark.operators.pipeline import PACK_BUDGET_CHARS

    rows = {r["lang"]: r for r in pipeline_pack_efficiency(spark, SF).collect()}
    d = load_table(spark, SF, "documents")
    truth = {
        r["lang"]: r
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.max("n_chars").alias("max_doc"),
        )
        .collect()
    }
    assert set(rows) == set(truth)
    for lang, r in rows.items():
        t = truth[lang]
        assert r["n_docs"] == t["n_docs"]
        assert r["total_chars"] == t["chars"]
        assert r["max_bin_chars"] <= PACK_BUDGET_CHARS + t["max_doc"]
        assert 0 <= r["overflow_bins"] <= r["n_bins"]


def test_fano_detects_planted_burst_and_regularity(spark):
    """A one-minute burst must measure Fano = n·(1−1/m) ≈ the burst
    size; a one-event-per-minute stream must measure exactly 0."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions19 import fano_over

    rows = []
    # burst: 60 events in minute 0, then 59 empty... only OBSERVED
    # minutes count, so spread one trailing event over minutes 1..9
    for i in range(60):
        rows.append(("burst", f"2024-01-01 00:00:{i % 60:02d}"))
    for m in range(1, 10):
        rows.append(("burst", f"2024-01-01 00:{m:02d}:00"))
    # regular: exactly one event per minute
    for m in range(10):
        rows.append(("regular", f"2024-01-01 01:{m:02d}:00"))
    frame = tiny_local_frame(
        spark, rows, "event_type string, ts_s string"
    ).selectExpr("event_type", "CAST(ts_s AS TIMESTAMP) AS ts")
    got = {r["event_type"]: r for r in fano_over(frame).collect()}
    assert got["regular"]["fano"] == 0.0
    # burst moments: minutes m=10, counts (60,1×9): n·Σc² −(Σc)² =
    # 10·3609 − 69² = 31329; n·Σc = 690 → fano = 45.404348
    assert got["burst"]["n_minutes"] == 10
    assert got["burst"]["n_events"] == 69
    assert abs(got["burst"]["fano"] - 31329 / 690) < 1e-5


@pytest.mark.parametrize(
    "name",
    [
        "text_bpe_fertility",
        "pipeline_pack_efficiency",
        "events_burstiness_fano",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions19 as e19

    fn = getattr(e19, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )


def test_bpe_oracles_tolerate_merge_exhaustion():
    """ADVICE r13 regression: when induction exhausts before
    _BPE_ROUNDS (every word collapses to one symbol), the w{r}
    winner CTEs go empty — the old CROSS JOIN emptied every
    downstream seq/aseq CTE and the whole oracle result, while the
    python trainer breaks out of its loop and still emits rows. The
    LEFT JOIN ... ON TRUE rendering must pass sequences through
    unchanged instead."""
    from storm_netmonitor_spark.operators.extensions17 import (
        _BPE_ROUNDS,
        greedy_bpe_merges,
        text_bpe_merge_train_oracle,
    )
    from storm_netmonitor_spark.operators.extensions19 import (
        text_bpe_fertility_oracle,
    )
    from tests.test_extensions18_staged import _duck_on_docs

    assert _BPE_ROUNDS >= 2  # the exhaustion scenarios below need it

    # partial exhaustion: one two-char word -> round 1 merges it to a
    # single symbol, rounds 2.._BPE_ROUNDS have no pairs left
    rows = [("s", "aa aa aa")]
    assert greedy_bpe_merges({"aa": 3}, _BPE_ROUNDS) == [
        (1, "a", "a", "aa", 3)
    ]
    _, train = _duck_on_docs(text_bpe_merge_train_oracle(), rows)
    assert [(r[0], r[1], r[2], r[3], r[4]) for r in train] == [
        (1, "a", "a", "aa", 3)
    ]
    cols, fert = _duck_on_docs(text_bpe_fertility_oracle(), rows)
    rec = dict(zip(cols, fert[0]))
    assert (rec["n_words"], rec["n_chars"], rec["n_tokens"]) == (3, 6, 3)
    assert rec["fertility"] == 1.0

    # total exhaustion: every word is already a single symbol -> zero
    # merge rounds ever fire, fertility = 1 token/word
    rows0 = [("s", "a b c a")]
    assert greedy_bpe_merges({"a": 2, "b": 1, "c": 1}, _BPE_ROUNDS) == []
    _, train0 = _duck_on_docs(text_bpe_merge_train_oracle(), rows0)
    assert train0 == []
    cols0, fert0 = _duck_on_docs(text_bpe_fertility_oracle(), rows0)
    rec0 = dict(zip(cols0, fert0[0]))
    assert (rec0["n_words"], rec0["n_tokens"]) == (4, 4)
    assert rec0["fertility"] == 1.0
