#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md M4 gate).

Runs the ten headline queries of BASELINE.md — by their SURVEY §2 registry
ids, i.e. the exact same callables the correctness gate checks — against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]``, and prints ONE JSON line:

    {"metric": "suite_wall_seconds", "value": <total>, "unit": "sec",
     "queries": {"agg_group_pricing": <sec>, ...}, "sf": 0.1}

Method mirrors BASELINE.md: per query 1 warm-up run, then median of 3 timed
``collect()`` runs (session startup excluded — one session per process).

The stdout line is the COMPACT gate payload only (≈1.5 KB — it must fit
the driver's 2,000-char stdout-tail capture; VERDICT r8 #1). The full
method record (warmup counts, memo state) and per-query ``cold_seconds``
(first build+execute wall, training included) — kept so cross-round
comparisons stay method-honest (ADVICE r5) — are emitted to stderr and
written to ``BENCH_DETAIL.json`` beside this file.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# The BASELINE.md suite, by registry id (≙ the "q_*" rows in that file).
HEADLINE = [
    "agg_group_pricing",  # q_pricing_summary (TPC-H Q1 shape)
    "join_star_multiway",  # q_local_supplier_volume (6-way star, Q5 shape)
    "join_inner_equi",  # q_top_unshipped class (c⋈o join + agg)
    "win_topk_group",  # q_window_rank
    "agg_hourly_events",  # q_tumbling_window — BASELINE.md measured the
    # BATCH rendering of the hourly window; the streaming twin
    # (stream_tumbling, full drain w/ checkpoint) stays in the registry
    "stream_tumbling",  # streaming drain, reported alongside
    "agg_count_distinct",  # q_distinct_users
    "fn_json_map",  # q_json_extract
    "fn_split_explode",  # q_wordcount
    "vec_knn_cosine",  # q_knn_cosine
    "text_exact_dedup",  # q_dedup
]

#: Heaviest custom (non-BASELINE) operators, timed and reported the same
#: way so regressions in the dedup/ANN machinery are visible round-over-
#: round. NOT part of the BASELINE comparison (no baseline row exists) —
#: they are appended to "queries" but have no bearing on the M4 gate.
EXTRA_REPORTED = [
    "text_near_dedup_minhash",  # MinHash+LSH banding dedup
    "vec_ann_ivf",  # IVF approximate nearest neighbor (distributed Lloyd)
    "text_ngram_jaccard",  # df-capped shingle-join verification stage
    "tpch_q08",  # heaviest TPC-H addendum join (8-table, 5 broadcasts)
    "tpch_q21",  # EXISTS/NOT-EXISTS rewrite (per-order aggregate + join-back)
    "text_boilerplate_share",  # cross-doc gram DF shuffle + broadcast-back
    "events_funnel",  # chained conditional window minima (1 keyed shuffle)
    "ts_anomaly_zscore",  # decimal rolling moments over bounded frames
    "vec_batch_knn",  # broadcast query block × row-local decimal dots
    "agg_bitmap_distinct",  # exact distinct via mergeable bitmap partials
    "graph_pagerank_links",  # iterative power-iteration loop (3 rounds, checkpointed)
    # round-4 §2.S additions
    "ts_interval_union",  # single-exchange gaps-and-islands uptime ledger
    "ts_counter_increase",  # reset-aware increase() (LAG + agg, one exchange)
    "tpch_q02",  # derived-partsupp min-cost supplier (window over reduced frame)
    "events_anomaly_mad",  # two exact percentile passes + broadcast-back
    "join_fuzzy_blocked",  # vocabulary-reduced blocked levenshtein pairing
    # round-4 §2.T additions (extra-session batch)
    "events_concurrency_peak",  # two-level distributed prefix-sum sweep line
    "events_active_rolling",  # DAU/WAU distinct fan-out on the reduced frame
    "ts_downsample_lttb",  # sequential integer LTTB via applyInPandas
    "text_ngram_novelty",  # gram-keyed first-occurrence window + doc rollup
    # round-6 §2.U scale probes
    "join_skew_aqe",  # AQE skew-split join (materializes inside the call)
    "stress_scale_replicate",  # 10x codegen explode fan-out + map-side collapse
    # round-6 depth additions
    "text_perplexity_unigram",  # unigram-LM quality gate (model join + dratio)
    "vec_mmr_diversify",  # knn shortlist + constant-size greedy re-rank
    "agg_weighted_median",  # two-level prefix sum over the cent frame
    "incremental_join_view",  # bilinear-delta join maintenance (3 delta joins)
    "join_asof_nearest",  # both-direction asof from one union-tag exchange
    "join_pointintime_dim",  # SCD2 point-in-time dim join + rollup
    "graph_knn_triangles",  # label-blocked kNN graph + ordered two-join census
    "vec_pq_encode",  # broadcast codebook, per-subspace argmin
    "sample_weighted_systematic",  # two-level prefix PPS draw
    "sql_recursive_cte",  # Spark 4 recursive CTE (vocab-sized walk)
    "ts_ewma_timedecay",  # minute-reduced libm-free decay fold
    # round-6 continuation (§2.V)
    "events_mttr",  # MTTR/MTBF: two window passes + agg on ONE exchange
    "agg_sketch_cms",  # relational CMS: bounded-cardinality counter agg
    "vec_hamming_topk",  # sign-signature pure-map scan + decimal re-rank
    "sink_merge_upsert",  # MERGE via broadcast change feed (base unshuffled)
    "agg_key_skew_entropy",  # skew detector: count + totals window + rollup
    # round-8 rework
    "text_ppl_buckets",  # band-census terciles (threshold search in the call)
    # round-11 §2.W registration
    "stream_ann_serve",  # streaming ANN serve drain (per-batch p50/p95 in detail)
    # round-11 §2.X registration (index lifecycle)
    "vec_ivf_index_insert",  # artifact-trained centroids + delta argmax routing
    "vec_index_drift",  # two routed censuses + integer-exact drift flags
    "stream_minhash_index_merge",  # streaming index fold (per-batch walls in detail)
    # round-11 §2.Y registration (monitoring / incremental maintenance)
    "dedup_components_merge",  # star-edge CC fold over delta pairs only
    "stream_index_drift",  # streaming census fold (per-batch walls in detail)
    "text_profile_drift",  # integer-exact bucket census drift (pure JVM)
    # round-11 §2.Z registration (approximation-quality evaluation)
    "vec_ann_recall",  # IVF recall curve: one routing pass + Q-block dots
    "text_minhash_calibration",  # banding S-curve: one scan, 4-row exchange
    "text_filter_agreement",  # three-gate confusion: gate plans + 1 agg
    # round-11 §2.AA registration (retraction & repair)
    "sink_targeted_delete",  # partition-minimal retention+tombstone rewrite
    "dedup_components_retract",  # label splice under deletions
    "vec_ivf_cell_retrain",  # spliced-Lloyd recenter of drifted cells
    # round-12 §2.AB registration (orchestration planning & integrity)
    "plan_incremental_backfill",  # manifest-level backfill work-list
    "plan_compaction",  # time-contiguous prefix-sum packing plan
    "audit_referential_integrity",  # FK orphan census, key-pruned scans
    # round-12 §2.AC registration (frozen-model scoring lifecycle)
    "text_ppl_frozen_score",  # delta scored under the standing-corpus LM
    "quality_gate_drift",  # gate-outcome census drift (4-row exchange)
    "stream_gate_scores",  # streaming frozen scorer (per-batch walls in detail)
    # round-13 §2.AD registration (orchestration apply)
    "sink_backfill_apply",  # partition-minimal backfill rewrite + ledger
    "sink_compaction_apply",  # one-file-per-bin packing rewrite + ledger
    "sink_orphan_quarantine",  # RI verdict: quarantine landing + 2-row ledger
    # round-13 §2.AE registration (ranking quality & community)
    "vec_rank_metrics",  # MRR/NDCG of the served IVF ranking vs exact
    "graph_community_lpa",  # 3 synchronous LPA rounds over the edge artifact
    "stream_serve_recall",  # serving-quality monitor (per-batch walls in detail)
    # round-13 §2.AF registration (streaming ingest hygiene)
    "stream_decontaminate_gate",  # benchmark-overlap gate on the ingest stream
    "stream_pii_gate",  # scrub pass on the ingest stream (per-batch walls)
    "stream_profile_gate",  # corpus-profile monitor on the ingest stream
    # round-13 §2.AG registration (quantization quality)
    "vec_pq_distortion",  # PQ codebook census: assignment counts + exact error
    "vec_pq_recall",  # ADC ranking fidelity vs exact-L2 top-10
    "vec_index_snapshot_diff",  # K×K assignment-churn census between versions
    # round-14 §2.AH registration (tokenizer & representation economics)
    "text_bpe_merge_train",  # BPE induction over the capped word table
    "text_vocab_coverage",  # per-source top-K vocabulary coverage
    "vec_matryoshka_recall",  # prefix-dim recall vs full-dim exact ranking
    # round-14 §2.AI registration (composition integrity)
    "text_source_overlap_matrix",  # S×S distinct-gram overlap census
    "agg_l_diversity",  # diversity floor atop the k-anonymity census
    "pipeline_dedup_rate_curve",  # dedup yield curve over the pair artifact
    # round-14 §2.AJ registration (serving economics & traffic shape)
    "text_bpe_fertility",  # frozen merge table served corpus-wide
    "pipeline_pack_efficiency",  # packing fill census per language
    "events_burstiness_fano",  # exact integer Fano factor per event type
    # round-14 §2.AK registration (ingest-stream monitors)
    "stream_vocab_gate",  # vocabulary gate on the ingest stream
    "stream_fertility_gate",  # fertility gate on the ingest stream
    "stream_fano_fold",  # burstiness fold on the live event stream
]

#: Queries whose work happens inside the callable itself (streaming drain
#: to an in-memory sink) — these must be re-invoked per timed run; for plain
#: batch queries the DataFrame is built once and ``collect()`` re-executes
#: the job (BASELINE.md's method: plan compilation amortized, execution
#: measured — same as DuckDB re-running a prepared statement).
RERUN_FULL = {
    "stream_tumbling",
    # the power-iteration loop materializes during DataFrame construction
    # (localCheckpoint per round) — timing only collect() would measure
    # the final sort, not the iterations
    "graph_pagerank_links",
    # the skew demo materializes under its scoped AQE confs inside the
    # call; collect() on the returned frame is a checkpoint read
    "join_skew_aqe",
    # steady-state refresh = the three delta joins (base partials cached
    # per session by design); rebuild per sample to time that refresh
    "incremental_join_view",
    # the tercile band search (two driver collects) runs during DataFrame
    # construction — timing only collect() would measure the row-local
    # CASE projection, not the quantile work
    "text_ppl_buckets",
    # the serving drain (foreachBatch over the staged query stream) runs
    # inside the call; the returned frame is a materialized local relation
    "stream_ann_serve",
    # the streaming index fold (foreachBatch over the delta doc stream)
    # runs inside the call; the returned frame is a local relation
    "stream_minhash_index_merge",
    # the CC label fold materializes during DataFrame construction
    # (localCheckpoint per round, like pagerank) and records its
    # fold-size identities inside the call
    "dedup_components_merge",
    # the streaming census drain (foreachBatch over the staged vector
    # stream) runs inside the call; the returned frame is a local relation
    "stream_index_drift",
    # the enriched N×Q frame materializes during DataFrame construction
    # (localCheckpoint barrier against the repeated dot pass)
    "vec_ann_recall",
    # the composed tercile gate's threshold search (two driver collects)
    # runs during DataFrame construction, the text_ppl_buckets precedent
    "text_filter_agreement",
    # the rewrite + ledger read-back run inside the call; the returned
    # frame is a local relation
    "sink_targeted_delete",
    # the splice's CC fold materializes during construction
    # (localCheckpoint per round)
    "dedup_components_retract",
    # the drift collect + Lloyd partials pass + reroute run inside the
    # call / during construction
    "vec_ivf_cell_retrain",
    # the streaming scorer drain (foreachBatch over the staged delta doc
    # stream) runs inside the call; the returned frame is a local relation
    "stream_gate_scores",
    # the three applies rewrite + read back inside the call (the
    # sink_targeted_delete precedent); the returned frames are ledgers
    "sink_backfill_apply",
    "sink_compaction_apply",
    "sink_orphan_quarantine",
    # the enriched eval frame materializes during construction
    # (localCheckpoint barrier + the probe-order collect), the
    # vec_ann_recall precedent
    "vec_rank_metrics",
    # the LPA label fold materializes during construction
    # (localCheckpoint per round, the pagerank precedent)
    "graph_community_lpa",
    # the four round-13 drains (foreachBatch over staged streams) run
    # inside the call; the returned frames are local relations
    "stream_serve_recall",
    "stream_decontaminate_gate",
    "stream_pii_gate",
    "stream_profile_gate",
    # r14 optimization MEASUREMENT-METHOD CHANGE (documented in
    # OPTIMIZATION_r14.md): these three drift monitors now collect
    # their bounded census during DataFrame construction and compute
    # the K-row drift tail driver-side (drift_table_local), so the
    # returned frame is a local relation — timing only collect() would
    # measure nothing. Re-run the full lifecycle per sample; their
    # pre-change rows (census + distributed tail timed via collect())
    # are kept in BENCH_r13.json / the r14 round-start BENCH_DETAIL.
    "vec_index_drift",
    "text_profile_drift",
    "quality_gate_drift",
    # the capped-table collect + driver induction run inside the call;
    # the returned merge table is a local relation
    "text_bpe_merge_train",
    # the enriched eval frame materializes during construction
    # (localCheckpoint barrier, the vec_ann_recall precedent)
    "vec_matryoshka_recall",
    # the three round-14 drains (foreachBatch over staged streams) run
    # inside the call; the returned ledgers are local relations
    "stream_vocab_gate",
    "stream_fertility_gate",
    "stream_fano_fold",
}

def _load_family_baselines() -> dict[str, float]:
    """Vanilla-PySpark family baselines (median ms at sf0.1): loaded
    from the committed `BASELINE_R*_FAMILIES.json` sidecars — the SAME
    records BASELINE.md's addenda quote — so re-measured baselines
    update the bench ratios without editing constants (ADVICE r12: the
    hardcoded dict and the sidecars were two sources of truth). Rows
    measured by tools/baseline_r11/r12/r13_families.py: same method and
    parameters, plain renderings, local[8]. bench emits timing/baseline
    ratios for these rows in the detail record so the 2× criterion is
    evaluable per round; sub-100 ms rows are read structurally
    (BASELINE.md noise-floor note)."""
    out: dict[str, float] = {}
    for fname in (
        "BASELINE_R11_FAMILIES.json",
        "BASELINE_R12_FAMILIES.json",
        "BASELINE_R13_FAMILIES.json",
        "BASELINE_R14_FAMILIES.json",
    ):
        path = os.path.join(_REPO, fname)
        if not os.path.exists(path):
            continue  # family not baselined yet — its rows get no ratio
        # a sidecar that EXISTS but can't be parsed is a broken gate,
        # not a missing one — fail loudly instead of silently dropping
        # that family's ratios from BENCH_DETAIL (ADVICE r13)
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.get("rows", {}).items():
            ms = rec.get("median_ms")
            if isinstance(ms, (int, float)) and ms > 0:
                out[name] = float(ms)
    return out


BASELINE_FAMILY_MS = _load_family_baselines()

WARMUPS = 1
#: RERUN_FULL queries re-run their whole lifecycle per sample (streaming
#: drain / iterative loop), and the micro-batch execution path JIT-warms
#: over several query lifecycles (measured fresh-process drain sequence:
#: 0.69, 0.61, 0.62, 0.56, 0.53, ... s) — one warm-up measures the JVM's
#: warm-up, not the operator. Three warm-ups reach the steady state a
#: long-running production query actually operates in; batch queries keep
#: the BASELINE.md 1-warmup method (their plan is already amortized by
#: building the DataFrame once).
WARMUPS_RERUN = 3
RUNS = 3

#: Stdout-line byte budget: the driver records only the LAST 2,000 chars
#: of stdout (trailing newline included) and parses the last JSON line in
#: that window (VERDICT r8 #1). r14's line measured 1,879 bytes and the
#: captured tail ended exactly at its newline, so the real ceiling is
#: 1,999; 1,950 keeps a 49-byte margin for a stray prompt echo while
#: buying back two driver-visible rows the old 1,900 budget trimmed.
STDOUT_LINE_BUDGET = 1950

#: VERDICT r14 #1 — the stdout trim used to drop EXTRA_REPORTED rows
#: NEWEST-first from a budget boundary that moved every time a row was
#: registered, so the driver-compared set silently SHRANK round-over-round
#: (r14: `audit_referential_integrity` vanished from the line and the gate
#: counted it dropped, with 27 further rows hidden). The driver-visible
#: set is now FROZEN in code instead of derived from the budget:
#:
#: * ``STDOUT_CORE`` — every row the driver saw in BENCH_r13/BENCH_r14
#:   plus ``audit_referential_integrity`` (the row the r14 gate flagged).
#:   These are NEVER trimmed; if they alone cannot fit, bench raises
#:   loudly rather than shipping a shrunken set.
#: * ``STDOUT_BONUS`` — extra rows promoted into the remaining budget,
#:   trimmed (newest-first) ONLY under pathological value widths.
#:
#: Full coverage of all 93 timed rows on the line is arithmetically
#: impossible: their names alone total 1,695 bytes and the driver
#: contract forbids renaming existing keys, so with per-row JSON framing
#: the minimal full line is ≈2.6 KB against a ≈2.0 KB capture. Every
#: timed row always survives in BENCH_DETAIL.json / the stderr record.
#: Stdout values are rounded to 3 decimals (1 ms quantization; the
#: sidecar keeps 4) — that is what pays for the restored rows.
STDOUT_CORE: tuple[str, ...] = (
    "audit_referential_integrity",
)
STDOUT_BONUS: tuple[str, ...] = (
    # this round's optimization targets that were invisible to the driver
    # in r14 — community/CC (bucketed-edge work) and the PQ family ratio
    # row the r14 judge asked to re-baseline (#8)
    "graph_community_lpa",
    "vec_pq_recall",
)


def _stdout_rows(timings: dict[str, float]) -> dict[str, float]:
    """The driver-visible ``queries`` map: the frozen r13/r14-visible set
    + STDOUT_CORE + STDOUT_BONUS, in HEADLINE/registration order, values
    rounded to 3 decimals. Never derived from the byte budget, so adding
    a registration can never evict an existing driver-compared row."""
    visible = set(STDOUT_CORE) | set(STDOUT_BONUS)
    visible.update(n for n in EXTRA_REPORTED if n not in _R14_HIDDEN)
    return {
        n: round(timings[n], 3)
        for n in HEADLINE + EXTRA_REPORTED
        if n in timings and (n in HEADLINE or n in visible)
    }


#: The 28 rows the r14 budget boundary hid from the driver (everything
#: registered after §2.AB's first two rows). Frozen as a literal so the
#: visible set is a code-reviewable constant, not a runtime artifact of
#: timing widths; STDOUT_CORE/STDOUT_BONUS promote rows back OUT of this
#: set. tests/test_fast_smoke.py pins visible ⊇ BENCH_r14's line.
_R14_HIDDEN: frozenset[str] = frozenset(
    {
        "audit_referential_integrity",
        "text_ppl_frozen_score",
        "quality_gate_drift",
        "stream_gate_scores",
        "sink_backfill_apply",
        "sink_compaction_apply",
        "sink_orphan_quarantine",
        "vec_rank_metrics",
        "graph_community_lpa",
        "stream_serve_recall",
        "stream_decontaminate_gate",
        "stream_pii_gate",
        "stream_profile_gate",
        "vec_pq_distortion",
        "vec_pq_recall",
        "vec_index_snapshot_diff",
        "text_bpe_merge_train",
        "text_vocab_coverage",
        "vec_matryoshka_recall",
        "text_source_overlap_matrix",
        "agg_l_diversity",
        "pipeline_dedup_rate_curve",
        "text_bpe_fertility",
        "pipeline_pack_efficiency",
        "events_burstiness_fano",
        "stream_vocab_gate",
        "stream_fertility_gate",
        "stream_fano_fold",
    }
    - set(STDOUT_CORE)
    - set(STDOUT_BONUS)
)


def _fit_stdout_line(compact: dict) -> tuple[str, bool]:
    """Serialize the gate payload; under pathological value widths drop
    STDOUT_BONUS rows (newest first) — the HEADLINE gate rows, the frozen
    r13/r14-visible set and STDOUT_CORE must never shrink (VERDICT r14
    #1: a budget-derived trim made the driver-compared set depend on
    registration count). The full queries map always survives in the
    sidecar/stderr detail record. The caller's dict is never mutated
    (ADVICE r9), and a line that still exceeds the budget after every
    bonus row is dropped raises rather than emitting a payload the
    driver would truncate mid-object. Returns (line, was_trimmed)."""
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) <= STDOUT_LINE_BUDGET:
        return line, False
    payload = dict(compact)
    trimmed = dict(payload["queries"])
    for name in reversed(STDOUT_BONUS):
        trimmed.pop(name, None)
        payload["queries"] = trimmed
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= STDOUT_LINE_BUDGET:
            return line, True
    raise RuntimeError(
        f"bench stdout line is {len(line)} bytes even with every "
        f"STDOUT_BONUS row dropped (budget {STDOUT_LINE_BUDGET}); the "
        "frozen driver-visible set has outgrown the driver's tail "
        "capture — it must never shrink, so shorten the framing instead"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from storm_netmonitor_spark import registry
    from storm_netmonitor_spark.session import get_spark

    from storm_netmonitor_spark.session import quiet_expected_warnings

    # session-start decomposition (VERDICT r11 #8): the ~9 s fresh-process
    # cold is JVM spawn + SparkSession build, not op cost — record it as
    # its own method row each round so op-level colds stay attributable
    # (import/registry wall and the first-query warmup are separate rows)
    t0 = time.perf_counter()
    registry.load_all()
    registry_load_seconds = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    spark = get_spark(app_name="nm-bench")
    session_start_seconds = round(time.perf_counter() - t0, 4)
    # keep the bench tail free of the audited expected-noise WARN lines
    # (reduced-frame WindowExec, streaming-AQE notices — see session.py)
    quiet_expected_warnings(spark)

    from storm_netmonitor_spark.io import _SESSION_MEMO, artifact_root

    # method honesty (r10): cold_seconds depend on whether the trained-
    # artifact store is populated — a fresh host re-trains, a warm one
    # reads. Record the store state so cross-round cold comparisons are
    # interpretable.
    art_root = artifact_root()
    art_entries_at_start = len(os.listdir(art_root))
    memo_at_start = len(_SESSION_MEMO)

    # host-load proxy (VERDICT r10 #3): the driver's r10 line read +12.6%
    # while an idle-host re-run of the same tree read +1.8% — a noisy run
    # must be distinguishable from a real regression WITHOUT diffing git
    # history. Two signals, both machine-readable in the detail record:
    # loadavg brackets the run, and a FIXED-WORK calibration query (pure
    # JVM codegen over an in-memory range — no IO, no shuffle, constant
    # work regardless of sf) is timed with the same median-of-3 method at
    # start AND end. A loaded host inflates the calibration wall by the
    # same contention factor it inflates the suite, so
    # suite/calibration-normalized comparisons cancel host load.
    def _calibrate() -> dict:
        """Fixed-work walls under the CURRENT host load: a Spark codegen
        query (multi-core, measures what contention does to the suite)
        and a pure-Python loop (single-core, JIT-free after its own
        warm-up — the cleaner cross-round constant). Both warmed before
        timing; cross-round comparisons should prefer the END record
        (the suite's thousands of jobs deepen shared-JVM JIT state in a
        way the start record cannot reproduce — measured: the same query
        reads ~0.07 s at suite start and ~0.03 s at suite end on an
        idle host)."""
        cal = spark.range(0, 20_000_000, 1, 8).selectExpr("sum(id * 3 + 7) AS s")
        for _ in range(3):
            cal.collect()
        spark_samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            cal.collect()
            spark_samples.append(time.perf_counter() - t0)

        def pyloop() -> float:
            t0 = time.perf_counter()
            s = 0
            for i in range(2_000_000):
                s += i * i
            return time.perf_counter() - t0

        for _ in range(3):
            pyloop()
        py_samples = [pyloop() for _ in range(5)]
        return {
            "spark": round(statistics.median(spark_samples), 4),
            "python": round(statistics.median(py_samples), 4),
        }

    load_at_start = [round(v, 2) for v in os.getloadavg()]
    # dedicated session warm-up (VERDICT r10 #4): the suite's FIRST op used
    # to absorb all JVM/session warm-up into its cold_seconds row
    # (agg_group_pricing read 9.2 s cold — mostly session start, not op
    # cost). One throwaway pass through the parquet-scan + shuffle +
    # codegen paths, recorded as its own method row, keeps every
    # cold_seconds row an OP cost.
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).groupBy(
        "n_regionkey"
    ).count().collect()
    session_warmup = round(time.perf_counter() - t0, 4)
    calibration_start = _calibrate()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE + EXTRA_REPORTED:
        fn = registry.QUERIES[name]
        rerun = name in RERUN_FULL
        # cold = build + FIRST execution, including plan analysis and any
        # session-memo training — recorded per query so the steady-state
        # medians below are method-honest across rounds (ADVICE r5: the
        # memos move training cost out of the samples; this keeps it
        # visible instead of invisible)
        t0 = time.perf_counter()
        df = None if rerun else fn(spark, sf_dir)
        for i in range(WARMUPS_RERUN if rerun else WARMUPS):
            (fn(spark, sf_dir) if rerun else df).collect()
            if i == 0:
                cold[name] = round(time.perf_counter() - t0, 4)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            (fn(spark, sf_dir) if rerun else df).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    # serving and streaming-fold are LATENCY claims (VERDICT r10 #6):
    # per-micro-batch walls of the final drains, p50/p95 over the
    # committed batches
    from storm_netmonitor_spark.operators import extensions6 as _e6
    from storm_netmonitor_spark.operators import extensions7 as _e7
    from storm_netmonitor_spark.operators import extensions8 as _e8

    def _latency_record(walls):
        walls = sorted(walls)
        if not walls:
            return None
        return {
            "batches": len(walls),
            "p50_ms": round(statistics.median(walls) * 1000, 1),
            # nearest-rank p95 (ceil(0.95 n) - 1): monotone in rank, never
            # below the median, equals max for n < 20
            "p95_ms": round(
                walls[min(len(walls) - 1, -(-95 * len(walls) // 100) - 1)]
                * 1000,
                1,
            ),
            "max_ms": round(walls[-1] * 1000, 1),
        }

    from storm_netmonitor_spark.operators import extensions12 as _e12
    from storm_netmonitor_spark.operators import extensions14 as _e14
    from storm_netmonitor_spark.operators import extensions15 as _e15

    serve_latency = _latency_record(_e6.LAST_SERVE_BATCH_WALLS)
    merge_latency = _latency_record(_e7.LAST_MERGE_BATCH_WALLS)
    drift_latency = _latency_record(_e8.LAST_DRIFT_BATCH_WALLS)
    gate_latency = _latency_record(_e12.LAST_GATE_BATCH_WALLS)
    serve_recall_latency = _latency_record(_e14.LAST_SERVE_RECALL_WALLS)
    decon_latency = _latency_record(_e15.LAST_DECON_BATCH_WALLS)
    pii_latency = _latency_record(_e15.LAST_PII_BATCH_WALLS)
    profile_latency = _latency_record(_e15.LAST_PROFILE_BATCH_WALLS)
    calibration_end = _calibrate()
    load_at_end = [round(v, 2) for v in os.getloadavg()]

    # STDOUT SIZE MATTERS (VERDICT r8 #1): the driver records a bounded
    # 2,000-char TAIL of stdout and parses the last JSON line it finds.
    # r7 fixed key ORDER but the full line (method + cold + queries) is
    # ~3.1 KB, so the captured tail started MID-OBJECT and never parsed
    # (BENCH_r01–r08 all have "parsed": null). The contract line printed
    # to stdout is therefore the COMPACT gate payload only —
    # {"metric","unit","sf","queries","value"} ≈ 1.5 KB — with the gate
    # "value" last so even a partial tail keeps it. The measurement-method
    # record (ADVICE r5) and the cold first-call walls move to stderr and
    # to the BENCH_DETAIL.json sidecar, where truncation cannot eat the
    # gate.
    compact = {
        "metric": "suite_wall_seconds",
        "unit": "sec",
        "sf": sf,
        # one-word host-load bracket (VERDICT r13 #4): the driver-archived
        # BENCH_r*.json line is self-describing about contention — r13's
        # driver capture ran at 1-min loadavg 5.68 while the builder's
        # committed run was quiet, and the ambiguity cost a bisect.
        # Bracketed on loadavg AT START (pre-suite: the suite's own work
        # hasn't polluted the 1-min average yet); ≥ 3.0 on this 32-cpu
        # host = some other process is competing. The raw triples stay in
        # the sidecar's method record; the fixed-work calibration medians
        # there remain the quantitative cross-round normalizer.
        "load": "loaded" if load_at_start[0] >= 3.0 else "quiet",
        "queries": _stdout_rows(timings),
        # the BASELINE-comparable total: headline queries only —
        # EXTRA_REPORTED timings are informational rows in
        # "queries" and must not inflate the gate metric
        "value": round(sum(timings[n] for n in HEADLINE), 4),
    }
    detail = dict(
        compact,
        # the sidecar keeps EVERY timed row at full 4-decimal precision —
        # the stdout map is the frozen driver-visible subset at 3 decimals
        queries=timings,
        # measurement-method record (ADVICE r5): cross-round comparisons
        # need the warmup counts and memo/cache state that produced the
        # steady-state numbers, plus the cold first-call walls those
        # warmups amortized away
        method={
            "warmups_batch": WARMUPS,
            "warmups_rerun": WARMUPS_RERUN,
            "timed_runs": RUNS,
            "sample_stat": "median",
            "session_memo_entries_at_start": memo_at_start,
            "session_memo_entries_at_end": len(_SESSION_MEMO),
            "artifact_store_entries_at_start": art_entries_at_start,
            "artifact_store_entries_at_end": len(os.listdir(art_root)),
            # host-load proxy (VERDICT r10 #3): fixed-work calibration
            # medians bracket the suite — compare value/calibration across
            # rounds to cancel host contention; loadavg is the raw signal
            "registry_load_seconds": registry_load_seconds,
            "session_start_seconds": session_start_seconds,
            "session_warmup_seconds": session_warmup,
            "calibration_start": calibration_start,
            "calibration_end": calibration_end,
            "loadavg_at_start": load_at_start,
            "loadavg_at_end": load_at_end,
        },
        cold_seconds=cold,
        stream_ann_serve_batch_latency=serve_latency,
        stream_minhash_index_merge_batch_latency=merge_latency,
        stream_index_drift_batch_latency=drift_latency,
        stream_gate_scores_batch_latency=gate_latency,
        stream_serve_recall_batch_latency=serve_recall_latency,
        stream_decontaminate_gate_batch_latency=decon_latency,
        stream_pii_gate_batch_latency=pii_latency,
        stream_profile_gate_batch_latency=profile_latency,
        # VERDICT r11 #3: per-op ratio vs the family baselines loaded
        # from the BASELINE_R*_FAMILIES.json sidecars (< 1.0 = faster
        # than vanilla PySpark, criterion is ≤ 2.0). Only meaningful at
        # the baselines' sf0.1.
        baseline_ratios={
            n: round(timings[n] * 1000 / ms, 3)
            for n, ms in BASELINE_FAMILY_MS.items()
            if n in timings
        }
        if sf == 0.1
        else None,
    )
    line, was_trimmed = _fit_stdout_line(compact)
    if was_trimmed:
        print(
            "bench: stdout line trimmed to fit the driver tail capture; "
            "full queries map is in BENCH_DETAIL.json",
            file=sys.stderr,
        )
    # $SPARK_GRAFT_DETAIL_PATH redirects the sidecar: the test suite's
    # end-to-end bench run (tests/test_plans.py, sf0.001) must not clobber
    # the committed sf0.1 round record
    sidecar = os.environ.get(
        "SPARK_GRAFT_DETAIL_PATH", os.path.join(_REPO, "BENCH_DETAIL.json")
    )
    with open(sidecar, "w") as fh:
        json.dump(detail, fh, indent=1)
        fh.write("\n")
    print(json.dumps(detail), file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
