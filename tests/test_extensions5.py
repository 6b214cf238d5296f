"""Semantic + plan-shape tests for the round-6 continuation operators
(operators/extensions5.py, streaming stream_sketch_cms).

Parity vs DuckDB is covered registry-wide by test_parity_batch; these
tests pin semantics against INDEPENDENT Python references computed
straight from the parquet files (no SQL engine at all), plus the plan
shapes the docstrings claim."""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq

from storm_netmonitor_spark.registry import QUERIES

from .conftest import SF_CORRECT, SF_SMOKE
from .test_plans import plan


def _events(sf_dir, columns):
    return pq.read_table(f"{sf_dir}/events.parquet", columns=columns).to_pylist()


# ---------------------------------------------------------------------------
# events_mttr — Python reference for one user
# ---------------------------------------------------------------------------


def test_mttr_matches_python_reference(spark):
    out = {
        r["user_id"]: r
        for r in QUERIES["events_mttr"](spark, SF_SMOKE).collect()
    }
    rows = _events(SF_SMOKE, ["user_id", "event_type", "ts", "event_id"])
    uid = min(out)
    seq = sorted(
        (r for r in rows if r["user_id"] == uid),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    repairs, gaps, err_ts = [], [], []
    for i, r in enumerate(seq):
        if r["event_type"] != "error":
            continue
        err_ts.append(r["ts"])
        nxt = next(
            (s for s in seq[i + 1 :] if s["event_type"] != "error"), None
        )
        if nxt is not None:
            repairs.append((nxt["ts"] - r["ts"]).total_seconds())
    gaps = [
        (b - a).total_seconds() for a, b in zip(err_ts, err_ts[1:])
    ]
    got = out[uid]
    assert got["n_errors"] == len(err_ts)
    assert got["n_repaired"] == len(repairs)
    assert abs(got["mttr_s"] - sum(repairs) / len(repairs)) < 1e-5
    assert abs(got["mtbf_s"] - sum(gaps) / len(gaps)) < 1e-5


# ---------------------------------------------------------------------------
# events_ab_lift — exact integer chi-square cross-check
# ---------------------------------------------------------------------------


def test_ab_lift_chi_square_is_exact_integer_decision(spark):
    row = QUERIES["events_ab_lift"](spark, SF_CORRECT).collect()[0]
    rows = _events(SF_CORRECT, ["user_id", "event_type"])
    conv = {}
    for r in rows:
        conv.setdefault(r["user_id"], False)
        if r["event_type"] == "purchase":
            conv[r["user_id"]] = True
    a = sum(1 for u, c in conv.items() if u % 2 == 0 and c)
    b = sum(1 for u, c in conv.items() if u % 2 == 0 and not c)
    c = sum(1 for u, c2 in conv.items() if u % 2 == 1 and c2)
    d = sum(1 for u, c2 in conv.items() if u % 2 == 1 and not c2)
    assert (row["n_a"], row["n_b"]) == (a + b, c + d)
    assert (row["conv_a"], row["conv_b"]) == (a, c)
    n = a + b + c + d
    det = a * d - c * b
    expect = n * det * det * 1000 > 3841 * (a + b) * (c + d) * (a + c) * (b + d)
    assert row["significant"] == expect
    assert 0.0 <= row["rate_a"] <= 1.0 and 0.0 <= row["rate_b"] <= 1.0


# ---------------------------------------------------------------------------
# agg_sketch_cms (+ live twin) — Python re-build of the sketch
# ---------------------------------------------------------------------------


def _cms_reference(sf_dir):
    import hashlib

    rows = _events(sf_dir, ["event_type"])
    sketch = Counter()
    exact = Counter()
    for r in rows:
        k = r["event_type"]
        exact[k] += 1
        for i in range(4):
            b = int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[:2], 16)
            sketch[(i, b)] += 1
    est = {
        k: min(
            sketch[
                (i, int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[:2], 16))
            ]
            for i in range(4)
        )
        for k in exact
    }
    return exact, est


def test_cms_matches_python_sketch(spark):
    exact, est = _cms_reference(SF_CORRECT)
    for r in QUERIES["agg_sketch_cms"](spark, SF_CORRECT).collect():
        k = r["event_type"]
        assert r["n_exact"] == exact[k]
        assert r["cms_est"] == est[k]
        assert r["lower_bound_ok"] and r["cms_est"] >= r["n_exact"]


def test_stream_cms_converges_to_batch(spark):
    batch = sorted(
        map(tuple, QUERIES["agg_sketch_cms"](spark, SF_SMOKE).collect())
    )
    live = sorted(
        map(tuple, QUERIES["stream_sketch_cms"](spark, SF_SMOKE).collect())
    )
    assert batch == live


# ---------------------------------------------------------------------------
# vec_hamming_topk — signature + hamming recomputed with numpy
# ---------------------------------------------------------------------------


def test_hamming_topk_matches_numpy(spark):
    import numpy as np

    t = pq.read_table(f"{SF_CORRECT}/embeddings.parquet").to_pylist()
    sigs = {}
    for r in t:
        bits = np.array(r["embedding"], dtype=np.float32) >= 0
        sigs[r["vec_id"]] = sum(1 << i for i, b in enumerate(bits) if b)
    q = sigs[0]
    ham = sorted(
        ((bin(s ^ q).count("1"), vid) for vid, s in sigs.items() if vid != 0)
    )[:10]
    got = [
        (r["hamming"], r["vec_id"])
        for r in QUERIES["vec_hamming_topk"](spark, SF_CORRECT).collect()
    ]
    assert sorted(got) == ham


# ---------------------------------------------------------------------------
# sink_merge_upsert — row-count conservation law
# ---------------------------------------------------------------------------


def test_merge_upsert_conserves_rows(spark):
    rows = QUERIES["sink_merge_upsert"](spark, SF_CORRECT).collect()
    keys = pq.read_table(
        f"{SF_CORRECT}/orders.parquet", columns=["o_orderkey"]
    ).column("o_orderkey").to_pylist()
    base = len(keys)
    dels = sum(1 for k in keys if 10 <= k % 100 < 12)
    ins = sum(1 for k in keys if 12 <= k % 100 < 14)
    assert sum(r["n_rows"] for r in rows) == base - dels + ins
    n_status = {r["o_orderstatus"]: r["n_rows"] for r in rows}
    assert n_status["N"] == ins  # every insert lands in the new status


# ---------------------------------------------------------------------------
# win_rolling_median — Python reference for one user
# ---------------------------------------------------------------------------


def test_rolling_median_matches_python_reference(spark):
    out = QUERIES["win_rolling_median"](spark, SF_SMOKE).collect()
    rows = _events(SF_SMOKE, ["user_id", "event_type", "ts", "event_id", "value"])
    uid = min(r["user_id"] for r in rows)
    seq = sorted(
        (r for r in rows if r["user_id"] == uid),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    got = {r["event_id"]: r["roll_med"] for r in out if r["user_id"] == uid}
    for i, r in enumerate(seq):
        win = sorted(x["value"] for x in seq[max(0, i - 6) : i + 1])
        assert got[r["event_id"]] == win[(len(win) + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# text_ppl_buckets — tercile structure
# ---------------------------------------------------------------------------


def test_ppl_buckets_are_ordered_terciles(spark):
    rows = QUERIES["text_ppl_buckets"](spark, SF_CORRECT).collect()
    by = {}
    for r in rows:
        by.setdefault(r["bucket"], []).append(r["xent"])
    assert set(by) == {"head", "middle", "tail"}
    assert max(by["head"]) <= min(by["middle"]) <= max(by["middle"]) <= min(
        by["tail"]
    )
    n = len(rows)
    for b in by.values():  # thirds up to value ties at the boundary
        assert abs(len(b) - n / 3) <= 2


def test_ppl_buckets_census_is_flat_under_scale(spark):
    """The round-8 band-census rework's scale claim: a 10× corpus (500
    docs at sf0.001 → 5000 at sf0.1) must NOT grow the tercile-search
    census ~10× the way the old distinct-xent census did — band count is
    bounded by the xent value range (≤ ~20 nats × 64 bands/nat),
    independent of corpus size."""
    from storm_netmonitor_spark.operators.corpus2 import (
        text_perplexity_unigram,
    )
    from storm_netmonitor_spark.operators.extensions5 import (
        _PPL_BANDS_PER_NAT,
    )

    import pyspark.sql.functions as F

    sf_big = "/root/testdata/sf0.1"  # 10× the sf0.001 document count
    stats = {}
    for sf in (SF_SMOKE, sf_big):
        base = text_perplexity_unigram(spark, sf).select("xent")
        row = base.agg(
            F.countDistinct("xent").alias("distinct_xent"),
            F.countDistinct(
                F.floor(F.col("xent") * _PPL_BANDS_PER_NAT)
            ).alias("bands"),
            F.count(F.lit(1)).alias("docs"),
        ).collect()[0]
        stats[sf] = row
    small, big = stats[SF_SMOKE], stats[sf_big]
    assert big["docs"] >= 10 * small["docs"]
    # the OLD census was corpus-proportional: distinct xent tracks docs
    assert big["distinct_xent"] >= 5 * small["distinct_xent"]
    # the NEW census is flat: hard absolute bound at any SF, and 10× the
    # docs must not even double the band count
    for row in (small, big):
        assert row["bands"] <= 20 * _PPL_BANDS_PER_NAT, row
    assert big["bands"] <= 2 * small["bands"], (small, big)


# ---------------------------------------------------------------------------
# vec_pq_adc_topk — ADC recomputed with numpy for the returned rows
# ---------------------------------------------------------------------------


def test_pq_adc_matches_numpy(spark):
    import numpy as np

    t = pq.read_table(f"{SF_CORRECT}/embeddings.parquet").to_pylist()
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in t}
    q = emb[0]
    codes = {}
    for vid, v in emb.items():
        for s in range(8):
            sub = v[s * 8 : (s + 1) * 8]
            d2 = [
                round(float(((sub - emb[c][s * 8 : (s + 1) * 8]) ** 2).sum()), 6)
                for c in range(1, 17)
            ]
            best = min(range(16), key=lambda i: (d2[i], i + 1)) + 1
            codes[(vid, s)] = (best, d2[best - 1])
    got = QUERIES["vec_pq_adc_topk"](spark, SF_CORRECT).collect()
    for r in got:
        adc = round(
            sum(
                round(
                    float(
                        (
                            (
                                q[s * 8 : (s + 1) * 8]
                                - emb[codes[(r["vec_id"], s)][0]][
                                    s * 8 : (s + 1) * 8
                                ]
                            )
                            ** 2
                        ).sum()
                    ),
                    6,
                )
                for s in range(8)
            ),
            6,
        )
        assert abs(r["adc_d2"] - adc) < 2e-6
        exact = round(float(((q - emb[r["vec_id"]]) ** 2).sum()), 6)
        assert abs(r["exact_d2"] - exact) < 2e-6
        assert r["exact_d2"] >= 0.0 and r["adc_d2"] >= 0.0


# ---------------------------------------------------------------------------
# agg_key_skew_entropy — entropy bounds + Python reference
# ---------------------------------------------------------------------------


def test_key_skew_entropy_reference_and_bounds(spark):
    rows = QUERIES["agg_key_skew_entropy"](spark, SF_CORRECT).collect()
    ev = _events(SF_CORRECT, ["event_type", "user_id"])
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], Counter())[r["user_id"]] += 1
    for r in rows:
        cnt = by_type[r["event_type"]]
        n = sum(cnt.values())
        h = sum(c * math.log(n / c) for c in cnt.values()) / n
        assert r["n_events"] == n and r["n_keys"] == len(cnt)
        assert abs(r["entropy_nats"] - h) < 1e-5
        assert 0.0 <= r["entropy_nats"] <= math.log(r["n_keys"]) + 1e-9
        assert abs(r["top_share"] - max(cnt.values()) / n) < 1e-5


# ---------------------------------------------------------------------------
# plan shapes (the docstring claims, pinned)
# ---------------------------------------------------------------------------


def test_extensions5_plan_shapes(spark):
    shapes = {
        # one user-keyed exchange serves both window passes + the agg
        "events_mttr": dict(max_hash_ex=1, win=2),
        # window exchange + tiny campaign rollup
        "events_attribution": dict(max_hash_ex=2, win=1),
        # per-user agg + 1-row cell collapse
        "events_ab_lift": dict(max_hash_ex=1),
        # counter agg + key distinct + final join; sketch/keys broadcast
        "agg_sketch_cms": dict(max_hash_ex=3, min_bhj=2),
        # scan is a pure map (inlined query signature) + shortlist joins
        "vec_hamming_topk": dict(max_hash_ex=1, min_bhj=2, take=True),
        # change feed broadcast both ways: base never shuffles, the one
        # exchange is the final census
        "sink_merge_upsert": dict(max_hash_ex=1, min_bhj=2),
        "win_rolling_median": dict(max_hash_ex=1, win=1),
        # count exchange + totals window + reduced agg, no join
        "agg_key_skew_entropy": dict(max_hash_ex=2, win=1),
    }
    for name, want in shapes.items():
        p = plan(QUERIES[name](spark, SF_CORRECT))
        n_hash = len(re.findall(r"Exchange hashpartitioning", p))
        assert n_hash <= want["max_hash_ex"], f"{name}: {n_hash} exchanges\n{p}"
        if "win" in want:
            n_win = len(re.findall(r"\(\d+\) Window", p))
            assert n_win == want["win"], f"{name}: {n_win} windows\n{p}"
        if want.get("min_bhj"):
            assert p.count("BroadcastHashJoin") >= want["min_bhj"], f"{name}:\n{p}"
        if want.get("take"):
            assert "TakeOrderedAndProject" in p, f"{name}:\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        assert "BroadcastNestedLoopJoin" not in p, f"{name}:\n{p}"
        assert "rangepartitioning" not in p, f"{name}:\n{p}"
