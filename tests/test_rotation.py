"""Driver-window rotation guards (VERDICT r2 action #1).

The driver checks only the first ~50 entries of ``queries()`` per round.
These tests pin, against the CORRECTNESS_r*.json files themselves, that

1. every id the driver has already passed (hash-green, or rows-only by
   design) is in ``registry.DRIVER_VERIFIED`` — so it is rotated to the back;
2. the first 50 entries of ``queries()`` contain NO already-green id — the
   whole window reaches never-checked operators;
3. the streaming flagships land inside the round-3 window (VERDICT r2 #2);
4. registry ordering is a permutation: nothing dropped or duplicated.
"""

from __future__ import annotations

import pytest

import json
from pathlib import Path

import __spark_entry__ as entrymod
from storm_netmonitor_spark import registry

pytestmark = pytest.mark.fast

REPO = Path(entrymod.__file__).resolve().parent
WINDOW = 50


def _driver_passed_ids() -> set[str]:
    """Ids with a conclusive passing driver verdict in any CORRECTNESS file.

    Green = rows+schema+hash all true.  err == 'no_oracle' counts too: the
    driver ran the query (rows-only by design for oracle-less approximate
    ops) — re-checking it buys nothing while other ops have no verdict.
    A crashed or mismatched row is NOT passed and must stay in rotation.
    """
    passed: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, rec in json.loads(path.read_text()).items():
            if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
                passed.add(name)
            elif (
                rec.get("err") == "no_oracle"
                and isinstance(rec.get("spark_rows"), int)
                and rec["spark_rows"] >= 0
            ):
                # 'driver actually ran it' guard: a crashed no-oracle row
                # records spark_rows: None and must stay in rotation.
                passed.add(name)
            else:
                # latest verdict wins: a row that REGRESSED in a later round
                # is red again and must re-enter the window (mirrors
                # registry._fold_verdicts, implemented independently).
                passed.discard(name)
    return passed


def _latest_verdict_round() -> dict[str, int]:
    """Independent re-parse of each id's latest driver-verdict round —
    cross-checks registry._fold_latest_round."""
    latest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        num = int(path.stem.rsplit("_r", 1)[1])
        for name in json.loads(path.read_text()):
            latest[name] = max(num, latest.get(name, 0))
    return latest


def test_back_segment_recycles_oldest_verdicts_first():
    """VERDICT r7 #3: once the backlog is clear the window is pure
    re-verification, so the already-green back segment must be ordered
    oldest-latest-verdict first — otherwise the driver re-checks the
    same registration-order head every round while other verdicts age
    indefinitely (48 ops still predate the round-3 testdata regen)."""
    passed = _driver_passed_ids()
    latest = _latest_verdict_round()
    upgraded_slack = {
        n
        for n in registry.ORACLE_UPGRADED
        if n in registry.QUERIES and n not in registry.DRIVER_HASH_GREEN
    }
    # ops re-prioritized because their code changed AFTER their verdict
    # (VERDICT r14 #3) — independent re-derivation of _touched_stale
    touched_slack = {
        n
        for n, rnd in registry.TOUCHED_SINCE_VERDICT.items()
        if n in registry.QUERIES and latest.get(n, 0) < rnd
    }
    spent = set(registry.RECHECK_FIRST) | upgraded_slack | touched_slack
    back = [n for n in entrymod.queries() if n in passed and n not in spent]
    ages = [latest.get(n, 0) for n in back]
    assert ages == sorted(ages), (
        "back segment not oldest-verdict-first: "
        f"{[(n, latest.get(n, 0)) for n in back[:8]]} ..."
    )
    # derived map agrees with the independent parse
    assert registry.DRIVER_VERDICT_ROUND == latest


def test_touched_ops_front_load_the_reverification_window():
    """VERDICT r14 #4: operators optimized in r14/r15 whose latest driver
    verdict predates the change must land at the FRONT of the
    re-verification segment, inside the driver's 50-slot window, until a
    fresh verdict arrives (then they drop back automatically)."""
    passed = _driver_passed_ids()
    latest = _latest_verdict_round()
    stale_touched = {
        n
        for n, rnd in registry.TOUCHED_SINCE_VERDICT.items()
        if n in registry.QUERIES and latest.get(n, 0) < rnd
    }
    # every touched id must exist; rounds must be plausible
    unknown = set(registry.TOUCHED_SINCE_VERDICT) - set(registry.QUERIES)
    assert not unknown, f"TOUCHED_SINCE_VERDICT names unregistered ids: {unknown}"
    window = list(entrymod.queries())[:WINDOW]
    # stale touched ops fit the window only after red/unverified/upgraded
    # tiers; with those empty (steady state) they must ALL be inside
    ahead = [
        n
        for n in window
        if n not in passed
        or n in registry.RECHECK_FIRST
        or (n in registry.ORACLE_UPGRADED and n not in registry.DRIVER_HASH_GREEN)
    ]
    capacity = WINDOW - len(ahead)
    expect_inside = set(sorted(
        stale_touched,
        key=lambda n: latest.get(n, 0),
    )[:capacity])
    missing = expect_inside - set(window)
    assert not missing, (
        f"touched-since-verdict ops outside the driver window: {sorted(missing)}"
    )
    # a touched op with a fresh verdict must NOT hold a priority slot
    refreshed = {
        n
        for n, rnd in registry.TOUCHED_SINCE_VERDICT.items()
        if n in registry.QUERIES and latest.get(n, 0) >= rnd
    }
    head = set(window[: len(stale_touched)])
    # (only check when the steady-state assumption holds: no red/unverified)
    if not ahead:
        assert head == stale_touched or stale_touched <= set(window), (
            "stale touched set not front-loaded"
        )
        for n in refreshed & head:
            assert n in stale_touched, (
                f"{n} has a fresh verdict but still spends a window slot"
            )


def test_correctness_files_exist():
    assert list(REPO.glob("CORRECTNESS_r*.json")), "driver correctness files missing"


def test_driver_verified_covers_all_green_rows():
    passed = _driver_passed_ids()
    missing = passed - registry.DRIVER_VERIFIED
    assert not missing, (
        f"DRIVER_VERIFIED is stale — add these driver-passed ids so the "
        f"window rotates past them: {sorted(missing)}"
    )


def test_driver_verified_has_no_phantom_ids():
    # Everything we claim verified must actually have a passing verdict —
    # otherwise we'd rotate a never-checked or failed op out of the window.
    passed = _driver_passed_ids()
    phantom = registry.DRIVER_VERIFIED - passed
    assert not phantom, f"claimed verified but no passing driver verdict: {sorted(phantom)}"


def test_window_contains_no_already_green_id():
    # Only the first min(WINDOW, #unverified) slots can be fresh; once the
    # backlog drops below the window size the tail slots NECESSARILY hold
    # already-green ids (driver_ordered still pushes them last).
    passed = _driver_passed_ids()
    unverified_total = len([n for n in registry.QUERIES if n not in passed])
    window = list(entrymod.queries())[: min(WINDOW, unverified_total)]
    stale = [n for n in window if n in passed and n not in registry.RECHECK_FIRST]
    assert not stale, f"already-green ids wasting window slots: {stale}"


def test_recheck_first_only_holds_red_rows():
    # RECHECK_FIRST re-spends window slots; only genuinely red rows belong.
    stale = [n for n in registry.RECHECK_FIRST if n in _driver_passed_ids()]
    assert not stale, f"RECHECK_FIRST holds already-green ids: {stale}"


def test_round4_flagships_inside_window():
    # VERDICT r3 action #2: NM-core streaming, flagship dedup/vector ops and
    # the whole TPC-H suite must land inside round 4's window; governance /
    # novelty scalars are the chosen 17-op overflow to round 5.
    window = set(list(entrymod.queries())[:WINDOW])
    # The 15 TPC-H queries registered when VERDICT r3 named the window; the
    # five §2.S completions (q02/q11/q12/q16/q20) arrived AFTER the round-4
    # window was frozen and preflighted, and are deliberate round-5 backlog.
    tpch_r3 = {
        "tpch_q03", "tpch_q04", "tpch_q06", "tpch_q07", "tpch_q08",
        "tpch_q09", "tpch_q10", "tpch_q13", "tpch_q14", "tpch_q15",
        "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
    }
    flagships = {
        "stream_gap_alert", "stream_incremental_rollup", "sink_cdc_apply",
        "stream_progress_audit", "graph_pagerank_links", "vec_kmeans_assign",
        "ts_sla_gap_detect", "dedup_latest_per_key", "agg_bitmap_distinct",
        "source_stream_custom",
    } | tpch_r3
    missing = flagships - window - _driver_passed_ids()
    assert not missing, f"round-4 flagships outside the driver window: {sorted(missing)}"


def test_window_holds_only_unverified_priority_ops():
    # Until the backlog is clear, every window slot must go to an op from
    # PRIORITY_FIRST or (once those run out) the oldest-registered
    # unverified ops — never to an op that already has a verdict.
    passed = _driver_passed_ids()
    window = list(entrymod.queries())[:WINDOW]
    unverified_total = len([n for n in registry.QUERIES if n not in passed])
    expect = min(WINDOW, unverified_total)
    fresh = [n for n in window[:expect] if n not in passed]
    assert len(fresh) == expect, (
        f"window wastes slots on verified ops: "
        f"{[n for n in window[:expect] if n in passed]}"
    )


def test_driver_ordered_is_a_permutation():
    q = entrymod.queries()
    assert list(sorted(q)) == sorted(registry.QUERIES)
    o = entrymod.oracle_sql()
    assert list(sorted(o)) == sorted(registry.ORACLES)


def test_priority_first_ids_exist():
    unknown = [n for n in registry.PRIORITY_FIRST if n not in registry.QUERIES]
    assert not unknown, f"PRIORITY_FIRST names unregistered ids: {unknown}"


def test_fold_verdicts_latest_wins_and_classifies_records():
    """The derived rotation state: green and rows-only records pass,
    crashed/mismatched records are red, and the LATEST round's verdict
    overrides earlier ones in both directions."""
    from storm_netmonitor_spark.registry import _fold_verdicts, _verdict_passes

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 10, "oracle_rows": None, "err": "no_oracle"}
    mismatch = {"rows_match": True, "schema_match": True, "hash_match": False,
                "spark_rows": 5, "oracle_rows": 5, "err": None}
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "oracle_rows": None, "err": "boom"}
    assert _verdict_passes(green) and _verdict_passes(rows_only)
    assert not _verdict_passes(mismatch) and not _verdict_passes(crashed)

    r1 = {"a": green, "b": mismatch, "c": green, "d": rows_only}
    r2 = {"b": green, "c": crashed}
    passed, red = _fold_verdicts([r1, r2])
    assert passed == {"a", "b", "d"}   # b healed in r2
    assert red == ("c",)               # c regressed in r2 -> recheck first


def test_derived_state_matches_r1_r3_snapshot():
    """Folding EXACTLY the round-1..3 verdict files reproduces the
    hand-maintained snapshot the derivation replaced — pinned against the
    frozen historical files, so later rounds' verdicts can land without
    re-breaking this test (ADVICE r4)."""
    from storm_netmonitor_spark.registry import (
        _DRIVER_VERIFIED_SNAPSHOT_R1_R3,
        _fold_verdicts,
    )

    rounds = [
        json.loads((REPO / f"CORRECTNESS_r0{n}.json").read_text())
        for n in (1, 2, 3)
    ]
    passed, red = _fold_verdicts(rounds)
    assert passed == _DRIVER_VERIFIED_SNAPSHOT_R1_R3
    assert red == ()


def test_oracle_upgraded_ops_fill_window_slack():
    """Rows-only ops upgraded to a full hash oracle (VERDICT r4 #5) spend
    the window slots left over after every never-checked op is placed —
    ahead of plain already-green rows — and each actually HAS an oracle
    now (otherwise the slot re-buys a rows-only check)."""
    passed = _driver_passed_ids()
    unverified_total = len([n for n in registry.QUERIES if n not in passed])
    window = list(entrymod.queries())[:WINDOW]
    slack = window[unverified_total:WINDOW]
    expect = [
        n for n in registry.ORACLE_UPGRADED
        if n in registry.QUERIES and n not in registry.DRIVER_HASH_GREEN
    ][: max(0, WINDOW - unverified_total)]
    assert slack[: len(expect)] == expect, (slack, expect)
    missing_oracle = [n for n in registry.ORACLE_UPGRADED if n not in registry.ORACLES]
    assert not missing_oracle, f"ORACLE_UPGRADED without an oracle: {missing_oracle}"


def test_fold_hash_green_excludes_rows_only_and_respects_latest():
    """DRIVER_HASH_GREEN must hold only ids whose LATEST verdict is a full
    hash pass: rows-only passes don't count (they are exactly what the
    oracle upgrade re-checks), and a later rows-only/red verdict evicts an
    earlier hash pass."""
    from storm_netmonitor_spark.registry import _fold_hash_green

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 10, "oracle_rows": None, "err": "no_oracle"}
    r1 = {"a": green, "b": rows_only, "c": green}
    r2 = {"c": rows_only, "b": green}
    assert _fold_hash_green([r1, r2]) == {"a", "b"}


def test_verdict_passes_tolerates_null_spark_rows():
    """A crashed no-oracle record in the real driver format carries
    spark_rows: None — it must classify red, not raise (ADVICE r4)."""
    from storm_netmonitor_spark.registry import _verdict_passes

    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": "no_oracle"}
    assert not _verdict_passes(crashed)


def test_round6_window_recomposes_after_r5_lands(monkeypatch):
    """Forward simulation of the next round's first session: once a
    CORRECTNESS_r05 with hash-green verdicts for the three in-window
    upgraded ops lands, the slack must move on to the REMAINING
    oracle-upgraded ops instead of re-spending slots on the verified
    ones, and with zero backlog the window starts with them."""
    upgraded = list(registry.ORACLE_UPGRADED)
    mapping = {n: object() for n in registry.QUERIES}

    # simulate: everything verified; first three upgraded now hash-green
    monkeypatch.setattr(
        registry, "DRIVER_VERIFIED", frozenset(registry.QUERIES)
    )
    monkeypatch.setattr(registry, "RECHECK_FIRST", ())
    monkeypatch.setattr(
        registry, "DRIVER_HASH_GREEN", frozenset(upgraded[:3])
    )
    window = list(registry.driver_ordered(mapping))[:WINDOW]
    remaining = [n for n in upgraded[3:] if n in mapping]
    assert window[: len(remaining)] == remaining, window[:12]
    assert not set(upgraded[:3]) & set(window[: len(remaining)])
