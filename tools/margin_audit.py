#!/usr/bin/env python
"""Margin audit for the float-vs-SQL decision margins the round-5 oracle
upgrades rest on (vec_ann_lsh / vec_ann_ivf / vec_semantic_dedup /
text_near_dedup_minhash / text_near_dedup_simhash).

Those operators compute with float accumulation (numpy / double folds)
while their DuckDB twins use SQL double/decimal sums — DIFFERENT
summation orders, whose results agree only because every decision the
pipelines take (cluster argmax, probe choice, sign bit, threshold
crossing) clears the ~1e-13 relative accumulation error by many orders.
This script re-measures those margins against the CURRENT testdata with
exact numpy replicas, so a driver-side testdata regeneration can be
audited in seconds instead of debugging a hash mismatch.

Usage:
    python tools/margin_audit.py [SF_DIR ...]   # default: sf0.01 sf0.1

Exit non-zero if any margin falls under the safety floor (1e-9 — still
four orders above float error, chosen so a pass here guarantees the
oracles stay valid).
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_netmonitor_spark.operators.corpus import (  # noqa: E402
    SEMDEDUP_CLUSTER_TARGET,
    SEMDEDUP_ITERS,
    SEMDEDUP_K_MIN,
    SEMDEDUP_TAU,
)
from storm_netmonitor_spark.operators.vectors import (  # noqa: E402
    IVF_ITERS,
    IVF_K,
    IVF_NPROBE,
    _lsh_hyperplanes,
)

FLOOR = 1e-9


def _lloyd(emb: np.ndarray, seeds: np.ndarray, iters: int):
    """Exact replica of _lloyd_round: argmax assignment, L2-normalized
    means, empty-cluster carryover. Returns (final cents, min margin)."""
    cents = seeds.copy()
    k_n = len(cents)
    margin = math.inf
    for _ in range(iters):
        dots = emb @ cents.T
        part = np.partition(dots, -2, axis=1)
        margin = min(margin, float((part[:, -1] - part[:, -2]).min()))
        ks = np.argmax(dots, axis=1)
        nxt = []
        for k in range(k_n):
            sel = emb[ks == k]
            if len(sel) == 0:
                nxt.append(cents[k])
                continue
            m = sel.mean(axis=0)
            nrm = math.sqrt(float(m @ m)) or 1.0
            nxt.append(m / nrm)
        cents = np.array(nxt)
    dots = emb @ cents.T
    part = np.partition(dots, -2, axis=1)
    margin = min(margin, float((part[:, -1] - part[:, -2]).min()))
    return cents, margin


def audit(sf_dir: str) -> list[tuple[str, str, float]]:
    rows: list[tuple[str, str, float]] = []
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.array(t.column("vec_id").to_pylist())
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    dim = emb.shape[1]

    # --- vec_ann_lsh: sign-bit margin -------------------------------------
    planes = _lsh_hyperplanes(dim)
    rows.append(("vec_ann_lsh", "min |plane·v| (sign margin)",
                 float(np.abs(emb @ planes.T).min())))

    # --- vec_ann_ivf: assignment / probe / shortlist margins --------------
    mask = ids != 0
    corpus, cids = emb[mask], ids[mask]
    qvec = emb[ids == 0][0]
    seeds = np.array([corpus[cids == i][0] for i in range(1, IVF_K + 1)])
    cents, am = _lloyd(corpus, seeds, IVF_ITERS)
    rows.append(("vec_ann_ivf", "min assignment margin (all rounds)", am))
    cd = cents @ qvec
    sc = sorted(zip(cd, -np.arange(IVF_K)), reverse=True)
    rows.append(("vec_ann_ivf", "probe cut margin (nprobe-th vs next)",
                 float(sc[IVF_NPROBE - 1][0] - sc[IVF_NPROBE][0])))
    probe = [-nk for _, nk in sc[:IVF_NPROBE]]
    ks = np.argmax(corpus @ cents.T, axis=1)
    fs = corpus[np.isin(ks, probe)] @ qvec
    o = np.sort(fs)[::-1]
    if len(o) > 40:
        rows.append(("vec_ann_ivf", "float shortlist cut (40th vs 41st)",
                     float(o[39] - o[40])))
    rows.append(("vec_ann_ivf", "top-10 cut margin", float(o[9] - o[10])))

    # --- vec_semantic_dedup: assignment + tau margins ---------------------
    k = max(SEMDEDUP_K_MIN, len(ids) // SEMDEDUP_CLUSTER_TARGET)
    seeds = np.array([emb[ids == i][0] for i in range(1, k + 1)])
    cents, am = _lloyd(emb, seeds, SEMDEDUP_ITERS)
    rows.append(("vec_semantic_dedup", "min assignment margin (all rounds)", am))
    ks = np.argmax(emb @ cents.T, axis=1)
    tau_m = math.inf
    for kk in range(k):
        m = emb[ks == kk]
        if len(m) < 2:
            continue
        cc = (m @ m.T)[np.triu_indices(len(m), 1)]
        tau_m = min(tau_m, float(np.abs(cc - SEMDEDUP_TAU).min()))
    rows.append(("vec_semantic_dedup", "min |cos - tau| in-cluster", tau_m))

    # --- agg_heavy_hitters_approx: candidate completeness precondition ----
    from storm_netmonitor_spark.operators.aggregations import _MG_CAPACITY

    te = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["user_id"])
    n_users = len(set(te.column("user_id").to_pylist()))
    rows.append(("agg_heavy_hitters_approx",
                 f"MG capacity headroom (capacity {_MG_CAPACITY} / distinct "
                 f"users {n_users}; <1 means eviction regime — exact-top-5 "
                 "oracle then needs the pigeonhole bound re-checked)",
                 _MG_CAPACITY / max(1, n_users)))

    # --- text near-dedup preconditions ------------------------------------
    td = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    texts = td.column("text").to_pylist()
    non_ascii = sum(1 for x in texts if len(x.encode()) != len(x))
    odd_ws = sum(1 for x in texts if ("\t" in x or "\n" in x or "  " in x))
    rows.append(("text_near_dedup_*", "docs violating ASCII/space-tokenizer "
                 "preconditions (must be 0; margin=1 means none)",
                 0.0 if (non_ascii or odd_ws) else 1.0))
    # minhash oracle precondition: every true pair must sit at J where the
    # 4-band/2-row LSH is total; audit the GAP between the weakest true
    # pair and the 0.5 threshold (pairs at 0.9+ are deterministic catches)
    shingle_sets = []
    for x in texts:
        tk = [w for w in x.lower().split(" ") if w]
        n = max(1, len(tk) - 2)
        shingle_sets.append({" ".join(tk[i:i + 3]) for i in range(n)})
    weakest = math.inf
    for i in range(len(texts)):
        a = shingle_sets[i]
        for j in range(i + 1, len(texts)):
            b = shingle_sets[j]
            inter = len(a & b)
            if not inter:
                continue
            jac = inter / (len(a) + len(b) - inter)
            if jac >= 0.5:
                weakest = min(weakest, jac)
    rows.append(("text_near_dedup_minhash",
                 "weakest true pair's Jaccard (want ≥ ~0.9 for total "
                 "banding recall)", 0.0 if weakest is math.inf else weakest))
    return rows


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    bad = False
    for d in dirs:
        print(f"== {d}")
        for op, what, margin in audit(d):
            flag = ""
            if margin < FLOOR:
                flag = "  <-- UNDER FLOOR, oracle validity at risk"
                bad = True
            elif op == "text_near_dedup_minhash" and 0 < margin < 0.8:
                flag = "  <-- mid-range pair: banding recall no longer total"
                bad = True
            print(f"  {op:24s} {what:55s} {margin:.3e}{flag}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
