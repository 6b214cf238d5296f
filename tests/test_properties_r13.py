"""Hypothesis cross-checks for the round-13 staged kernels (the r11/r12
staging precedent: every staged batch's decision arithmetic gets a
pure-python reference driven over arbitrary inputs BEFORE registration,
so the DuckDB parity tests verify engine agreement and these verify the
algorithm itself).

Covered kernels: `compaction_bin_map` (extensions11 — the §2.AD apply
packs with it), `ri_edge_audit` (extensions11 — the §2.AD quarantine
executes its verdict class), `lpa_rounds` and `rank_metrics_over`
(extensions14).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

_SPARK = None


def _spark():
    from pyspark.sql import SparkSession

    global _SPARK
    if _SPARK is None:
        _SPARK = SparkSession.builder.master("local[4]").getOrCreate()
        _SPARK.sparkContext.setLogLevel("ERROR")
    return _SPARK


# ---------------------------------------------------------------------------
# compaction_bin_map == sequential prefix-sum packer
# ---------------------------------------------------------------------------


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_compaction_bins_match_sequential_packer(data):
    """bin = (rows before the hour, in hour order) div target — checked
    against a literal sequential fold over arbitrary (date, hour, rows)
    inventories."""
    from storm_netmonitor_spark.operators.extensions11 import (
        _CPT_TARGET_ROWS,
        compaction_bin_map,
    )

    inv = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(["d1", "d2", "d3"]),
                st.integers(0, 23),
                st.integers(1, 3 * _CPT_TARGET_ROWS),
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    spark = _spark()
    rows = [(d, h) for d, h, n in inv for _ in range(1)]
    # the kernel takes EVENT rows (one per record); expand n per file
    events = [(d, h) for d, h, n in inv for _ in range(n)]
    e = spark.createDataFrame(events, "event_date string, hr int")
    got = {
        (r["event_date"], r["hr"]): r["bin_id"]
        for r in compaction_bin_map(e).collect()
    }
    want = {}
    for date in {d for d, _, _ in inv}:
        run = 0
        for d, h, n in sorted(inv, key=lambda t: (t[0], t[1])):
            if d != date:
                continue
            want[(d, h)] = run // _CPT_TARGET_ROWS
            run += n
    assert got == want


# ---------------------------------------------------------------------------
# ri_edge_audit == brute-force membership counting (NULLs included)
# ---------------------------------------------------------------------------


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_ri_edge_audit_matches_bruteforce(data):
    from storm_netmonitor_spark.operators.extensions11 import ri_edge_audit

    child = data.draw(
        st.lists(st.one_of(st.none(), st.integers(0, 20)), max_size=30)
    )
    parent = data.draw(
        st.lists(st.one_of(st.none(), st.integers(0, 20)), max_size=15)
    )
    spark = _spark()
    c = spark.createDataFrame([(x,) for x in child], "k bigint")
    p = spark.createDataFrame([(x,) for x in parent], "pk bigint")
    r = ri_edge_audit(c, "k", p, "pk", "e", "p").collect()[0]
    pset = {x for x in parent if x is not None}
    n_null = sum(1 for x in child if x is None)
    n_orph = sum(1 for x in child if x is not None and x not in pset)
    assert r["n_child"] == len(child)
    assert r["n_null"] == n_null
    assert r["n_orphan"] == n_orph
    if child:
        # dratio: exact rational rounded half-away at 6 decimals
        assert abs(r["orphan_pct"] - n_orph / len(child)) <= 5e-7
    else:
        assert r["orphan_pct"] == 0.0


# ---------------------------------------------------------------------------
# lpa_rounds == pure-python synchronous majority propagation
# ---------------------------------------------------------------------------


def _py_lpa(nodes, edges, rounds):
    # edges are DIRECTED label-flow pairs (a -> b); callers pass the
    # symmetrized set, matching the kernel's contract
    nb = {}
    for a, b in edges:
        nb.setdefault(b, []).append(a)
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            if n not in nb:
                new[n] = lab[n]
                continue
            counts = {}
            for m in nb[n]:
                l = lab[m]
                counts[l] = counts.get(l, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            # ties to the SMALLEST label at the max count
            top = best[1]
            new[n] = min(l for l, c in counts.items() if c == top)
        lab = new
    return lab


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_lpa_rounds_match_python_reference(data):
    from storm_netmonitor_spark.operators.extensions14 import lpa_rounds

    nodes = data.draw(
        st.lists(st.integers(0, 100), min_size=1, max_size=16, unique=True)
    )
    und = data.draw(
        st.lists(
            st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)),
            max_size=24,
        )
    )
    und = list({(min(a, b), max(a, b)) for a, b in und if a != b})
    bi = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    rounds = data.draw(st.integers(1, 3))
    spark = _spark()
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    bi_df = (
        spark.createDataFrame(bi, "doc_a long, doc_b long")
        if bi
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    got = {
        r["doc_id"]: r["community"]
        for r in lpa_rounds(nodes_df, bi_df, rounds).collect()
    }
    assert got == _py_lpa(nodes, bi, rounds)


# ---------------------------------------------------------------------------
# rank_metrics_over == pure-python MRR/NDCG with the same gain table
# ---------------------------------------------------------------------------


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_rank_metrics_match_python_reference(data):
    from storm_netmonitor_spark.operators.extensions14 import (
        _RM_GAINS_E6,
        _RM_IDCG_E6,
        rank_metrics_over,
    )

    qids = data.draw(
        st.lists(st.integers(0, 9), min_size=1, max_size=4, unique=True)
    )
    spark = _spark()
    approx_rows, exact_rows, expect = [], [], {}
    for q in qids:
        k = data.draw(st.integers(0, len(_RM_GAINS_E6)))
        served = list(range(100, 100 + k))
        hits = data.draw(
            st.lists(st.sampled_from(served), unique=True, max_size=k)
            if served
            else st.just([])
        )
        approx_rows += [(q, v, i + 1) for i, v in enumerate(served)]
        exact_rows += [(q, v) for v in hits]
        # extra relevant items never served (must not affect DCG)
        exact_rows += [(q, 999), (q, 998)]
        hitset = set(hits)
        dcg = sum(
            g for i, g in enumerate(_RM_GAINS_E6[:k]) if served[i] in hitset
        )
        first = next(
            (i + 1 for i, v in enumerate(served) if v in hitset), 0
        )
        expect[q] = (
            len(hits),
            first,
            0.0 if first == 0 else round(1 / first, 6),
            round(dcg / _RM_IDCG_E6 + 1e-12, 6),
        )
    qf = spark.createDataFrame([(q,) for q in qids], "q_id long")
    af = (
        spark.createDataFrame(approx_rows, "q_id long, vec_id long, rn int")
        if approx_rows
        else spark.createDataFrame([], "q_id long, vec_id long, rn int")
    )
    ef = spark.createDataFrame(exact_rows, "q_id long, vec_id long")
    got = {
        r["q_id"]: (r["n_hits"], r["first_hit_rank"], r["mrr"], r["ndcg"])
        for r in rank_metrics_over(qf, af, ef).collect()
    }
    for q in qids:
        gn, gf, gm, gd = got[q]
        en, ef_, em, ed = expect[q]
        assert (gn, gf) == (en, ef_), (q, got[q], expect[q])
        assert abs(gm - em) <= 1e-6 and abs(gd - ed) <= 1e-6, (
            q,
            got[q],
            expect[q],
        )


# ---------------------------------------------------------------------------
# profile_cells == pure-python bucketing
# ---------------------------------------------------------------------------


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab X.9 "), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=12,
    )
)
def test_profile_cells_match_python_reference(texts):
    from storm_netmonitor_spark.operators.extensions8 import (
        _PROFILE_LOG2_CAP,
        profile_cells,
    )

    spark = _spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["cid"] for r in profile_cells(docs).collect()}
    want = {}
    for i, t in enumerate(texts):
        tok = len([w for w in t.split(" ") if w != ""])
        al = sum(1 for ch in t if ch.isascii() and ch.isalpha())
        tot = len(t)
        band = min(_PROFILE_LOG2_CAP, max(1, tok.bit_length()))
        # Spark's bin(0) = "0" (length 1), matching bit_length floor 1
        if tok == 0:
            band = 1
        dec = min(9, al * 10 // tot) if tot > 0 else 0
        want[i] = band * 10 + dec
    assert got == want


# ---------------------------------------------------------------------------
# pii_report == python re on the same planted line
# ---------------------------------------------------------------------------


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 99999),
            st.text(
                alphabet=st.sampled_from(
                    "abz0.@- +report me at bob@x.io or +1-234-5678 "
                ),
                max_size=80,
            ),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_pii_report_matches_python_re(docs):
    import re as _re

    from storm_netmonitor_spark.operators.corpus import (
        _EMAIL_RE,
        _PHONE_RE,
        pii_report,
    )

    spark = _spark()
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_report(frame).collect()}
    for doc_id, text in docs:
        synth = (
            f"reach u{doc_id}@mail.example.com or +1-555-"
            f"{doc_id % 10000:04d} re: {text}"
        )
        n_e = len(_re.findall(_EMAIL_RE, synth))
        n_p = len(_re.findall(_PHONE_RE, synth))
        red = _re.sub(
            _PHONE_RE, "<PHONE>", _re.sub(_EMAIL_RE, "<EMAIL>", synth)
        )
        r = got[doc_id]
        assert r["n_emails"] == n_e and r["n_phones"] == n_p, (synth, dict(
            n_emails=r["n_emails"], n_phones=r["n_phones"], e=n_e, p=n_p))
        assert r["redacted_len"] == len(red)
