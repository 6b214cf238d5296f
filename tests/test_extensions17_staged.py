"""Round-14 candidate verification (SURVEY §2.AH — staged, NOT registered).

Each §2.AH candidate runs the exact same vanilla-shaped check the driver
will apply once it is registered in round 14: Spark result vs its DuckDB
oracle — plus the property tests that pin the tokenizer/representation
discipline (merge-table determinism and greedy-merge semantics vs a
pure-python BPE reference, coverage counters tiling the corpus token
census, truncation-recall bounds with the self-recall identity).
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


def test_bpe_merge_train_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions17 import (
        text_bpe_merge_train,
        text_bpe_merge_train_oracle,
    )

    _assert_staged_parity(
        text_bpe_merge_train, text_bpe_merge_train_oracle(), spark
    )


def test_vocab_coverage_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions17 import (
        text_vocab_coverage,
        text_vocab_coverage_oracle,
    )

    _assert_staged_parity(
        text_vocab_coverage, text_vocab_coverage_oracle(), spark
    )


def test_matryoshka_recall_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions17 import (
        vec_matryoshka_recall,
        vec_matryoshka_recall_oracle,
    )

    _assert_staged_parity(
        vec_matryoshka_recall, vec_matryoshka_recall_oracle(), spark
    )


def py_bpe_reference(words: dict[str, int], rounds: int):
    """Literal greedy BPE: per round count adjacent pairs over the
    current symbol sequences (weighted by word count), adopt the
    (count desc, left asc, right asc) winner, merge left-to-right
    non-overlapping."""
    seqs = {w: list(w) for w in words}
    merges = []
    for r in range(1, rounds + 1):
        cnt: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + c
        if not cnt:
            break
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, left, right, left + right, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_kernel_matches_python_reference_on_adversarial_words(spark):
    """The two-pass replace merge must equal the literal greedy merge on
    the boundary-sharing shapes that break one-pass string replacement:
    alternating pair runs ('abababab'), odd/even same-symbol runs
    ('aaa', 'aaaa'), and pre-merged symbols colliding with pair text
    ('ab' token vs (a,b) merge)."""
    from storm_netmonitor_spark.io import tiny_local_frame
    from storm_netmonitor_spark.operators.extensions17 import (
        bpe_merge_rounds,
    )

    words = {
        "abababab": 5,
        "aaa": 4,
        "aaaa": 3,
        "aab": 7,
        "abab": 2,
        "ba": 6,
        "b": 9,
    }
    frame = tiny_local_frame(
        spark, list(words.items()), "w string, wc long"
    )
    got = bpe_merge_rounds(frame, 4)
    want = py_bpe_reference(words, 4)
    assert got == want, f"\nengine: {got}\nreference: {want}"


def test_bpe_distributed_kernel_matches_the_driver_induction(spark):
    """Path identity: the distributed rounds (the beyond-driver-memory
    scale path) and the registered op's capped driver-side induction
    must produce the IDENTICAL merge table on the corpus word table —
    one induction semantics, two execution strategies."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators import extensions17 as e17

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
    distributed = e17.bpe_merge_rounds(words, e17._BPE_ROUNDS)
    registered = [
        tuple(r) for r in e17.text_bpe_merge_train(spark, SF).collect()
    ]
    assert distributed == registered


def test_bpe_merge_counts_are_monotone_and_deterministic(spark):
    """Adopted pair counts never increase round-over-round on this
    corpus class (each merge removes the most frequent adjacency), and
    three runs in one session produce the identical merge table."""
    from storm_netmonitor_spark.operators.extensions17 import (
        text_bpe_merge_train,
    )

    runs = [
        tuple(tuple(r) for r in text_bpe_merge_train(spark, SF).collect())
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    counts = [r[4] for r in runs[0]]
    assert counts == sorted(counts, reverse=True)
    merged = [r[3] for r in runs[0]]
    assert len(set(merged)) == len(merged)


def test_vocab_coverage_tiles_the_corpus_census(spark):
    """Per-source token totals must tile the corpus token census
    exactly; covered counters are bounded by their totals; the type
    coverage never exceeds the vocabulary budget."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions17 import (
        _VOCAB_K,
        text_vocab_coverage,
    )

    rows = text_vocab_coverage(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    corpus_tokens = d.select(
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("t")
    ).count()
    assert sum(r["n_tokens"] for r in rows) == corpus_tokens
    for r in rows:
        assert 0 <= r["n_covered_tokens"] <= r["n_tokens"]
        assert 0 <= r["n_covered_types"] <= min(r["n_types"], _VOCAB_K)
        assert abs(
            r["coverage_pct"] - r["n_covered_tokens"] / r["n_tokens"]
        ) < 1e-5


def test_matryoshka_recall_bounds_and_self_identity(spark):
    """n_hits ∈ [0, k] per query with recall = n_hits/k; and the
    degenerate width (prefix = full dim) must measure recall 1.0 for
    every query — the self-identity that pins the two rank windows to
    the same total order."""
    from storm_netmonitor_spark.operators import extensions17 as e17

    rows = e17.vec_matryoshka_recall(spark, SF).collect()
    assert len(rows) == e17._MAT_QUERIES
    for r in rows:
        assert 0 <= r["n_hits"] <= e17._MAT_K
        assert abs(r["recall"] - r["n_hits"] / e17._MAT_K) < 1e-9

    orig = e17._MAT_DIM
    e17._MAT_DIM = 64
    try:
        full = e17.vec_matryoshka_recall(spark, SF).collect()
    finally:
        e17._MAT_DIM = orig
    assert all(r["recall"] == 1.0 for r in full)


@pytest.mark.parametrize(
    "name",
    [
        "text_bpe_merge_train",
        "text_vocab_coverage",
        "vec_matryoshka_recall",
    ],
)
def test_run_to_run_determinism(spark, name):
    from storm_netmonitor_spark.operators import extensions17 as e17

    fn = getattr(e17, name)
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert canon_rows(a.columns, a.collect()) == canon_rows(
        b.columns, b.collect()
    )
