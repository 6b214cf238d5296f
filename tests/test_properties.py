"""Property-based tests (hypothesis): invariants that example-based tests
can't pin — component resolution on arbitrary graphs, and the
partition-order independence the decimal-accumulation discipline exists
to guarantee (SURVEY §7.4.1).

Each example runs Spark jobs, so example counts are deliberately small;
deadline=None because JVM scheduling jitter would otherwise flake."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from storm_netmonitor_spark.functions.stable import dsum
from storm_netmonitor_spark.operators.corpus import connected_components

_SPARK = None


def _spark():
    # reuse the session-scoped fixture session if conftest built one;
    # hypothesis calls the test body many times inside ONE pytest test, so
    # we grab the active session lazily instead of taking the fixture.
    from pyspark.sql import SparkSession

    global _SPARK
    if _SPARK is None:
        _SPARK = SparkSession.builder.master("local[4]").getOrCreate()
    return _SPARK


def _union_find(nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    return {n: find(n) for n in nodes}


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_connected_components_matches_union_find(data):
    """Spark min-label propagation == sequential union-find on any graph
    (random node sets up to 24 nodes, random edge subsets)."""
    nodes = data.draw(
        st.lists(st.integers(0, 200), min_size=1, max_size=24, unique=True)
    )
    edges = data.draw(
        st.lists(
            st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)),
            max_size=30,
        )
    )
    edges = [(a, b) for a, b in edges if a != b]
    spark = _spark()
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    if edges:
        edges_df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    else:
        edges_df = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.component
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == _union_find(nodes, edges)


@settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    xs=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    )
)
def test_dsum_is_partition_order_independent(xs):
    """The decimal-accumulation sum must be BIT-identical regardless of row
    order and partitioning — the property that makes results reproducible
    when 1000 executors merge partials in arbitrary order."""
    spark = _spark()
    a = spark.createDataFrame([(x,) for x in xs], "v double").repartition(7)
    b = spark.createDataFrame(
        [(x,) for x in reversed(xs)], "v double"
    ).repartition(3)
    ra = a.agg(dsum("v", 6).alias("s")).collect()[0]["s"]
    rb = b.agg(dsum("v", 6).alias("s")).collect()[0]["s"]
    assert ra == rb and repr(ra) == repr(rb)


def test_round3_op_invariants(spark):
    """Structural invariants of the round-3 operators on the real
    testdata — cheap cross-checks the hash oracle can't express:

    - histogram counts re-sum to the table row count;
    - transition probabilities sum to 1 per from_type;
    - Pareto cumulative share is strictly increasing and the LAST kept row
      is the first to reach >= 50% (minimality + sufficiency);
    - shard assignment is total (docs re-sum) and uses every shard;
    - the batch kNN ranks are consistent: per query, sims are
      non-increasing in rank.
    """
    from storm_netmonitor_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    n_events = 10_000

    hist = QUERIES["agg_histogram_fixed"](spark, SF_CORRECT).collect()
    assert sum(r.n_samples for r in hist) == n_events

    trans = QUERIES["events_transition_matrix"](spark, SF_CORRECT).collect()
    by_from: dict[str, float] = {}
    for r in trans:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p_transition
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 1e-4, (ft, s)

    pareto = sorted(
        QUERIES["agg_pareto_talkers"](spark, SF_CORRECT).collect(),
        key=lambda r: r.rnk,
    )
    shares = [r.cum_share for r in pareto]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert shares[-1] >= 0.5, "kept set does not reach half the traffic"
    assert shares[-2] < 0.5 if len(shares) > 1 else True, "kept set not minimal"

    shards = QUERIES["pipeline_shard_assignment"](spark, SF_CORRECT).collect()
    assert sum(r.n_docs for r in shards) == 500
    assert len(shards) == 16, "some shard received no documents"

    knn = QUERIES["vec_batch_knn"](spark, SF_CORRECT).collect()
    per_q: dict[int, list[float]] = {}
    for r in sorted(knn, key=lambda r: (r.q_id, -r.sim)):
        per_q.setdefault(r.q_id, []).append(r.sim)
    assert len(per_q) == 10
    for q_id, sims in per_q.items():
        assert len(sims) == 3 and sims == sorted(sims, reverse=True), (q_id, sims)


def test_matryoshka_head_norm_concentration(spark):
    """On random unit vectors the 16-of-64 head carries ~sqrt(16/64)=0.5 of
    the norm on average — the sanity bound that the slice really is a
    norm-preserving prefix (MRL-trained embeddings would concentrate
    more)."""
    from storm_netmonitor_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    rows = QUERIES["vec_matryoshka_truncate"](spark, SF_CORRECT).collect()
    assert len(rows) == 500 and all(r.dim == 16 for r in rows)
    mean = sum(r.head_norm for r in rows) / len(rows)
    assert 0.35 < mean < 0.65, mean
    assert all(0.0 <= r.head_norm <= 1.000001 for r in rows)


def test_epoch_shuffle_orders_decorrelate(spark):
    """Each epoch must be a permutation within its shard, and the two
    epoch orders must genuinely differ (not a relabeling)."""
    from storm_netmonitor_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    rows = QUERIES["pipeline_epoch_shuffle"](spark, SF_CORRECT).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    moved = 0
    for shard, rs in by_shard.items():
        n = len(rs)
        assert sorted(r.epoch1_pos for r in rs) == list(range(1, n + 1))
        assert sorted(r.epoch2_pos for r in rs) == list(range(1, n + 1))
        moved += sum(1 for r in rs if r.epoch1_pos != r.epoch2_pos)
    assert moved > len(rows) * 0.8, f"only {moved} of {len(rows)} docs moved"


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_fused_lloyd_matches_numpy_reference(data):
    """The fused mapInPandas Lloyd round must equal a straight-line numpy
    reference: same argmax routing (first-max tie-break), same normalized
    means, emptied clusters keep their previous centroid — independent of
    how rows are partitioned."""
    import numpy as np

    from storm_netmonitor_spark.operators.vectors import (
        _assign_rowlocal,
        _lloyd_round,
    )

    dim = data.draw(st.integers(min_value=2, max_value=5))
    n = data.draw(st.integers(min_value=3, max_value=12))
    k = data.draw(st.integers(min_value=1, max_value=3))
    vals = data.draw(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-4, max_value=4,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=dim, max_size=dim,
            ),
            min_size=n, max_size=n,
        )
    )
    cents = data.draw(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-4, max_value=4,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=dim, max_size=dim,
            ),
            min_size=k, max_size=k,
        )
    )
    spark = _spark()
    parts = data.draw(st.integers(min_value=1, max_value=4))
    e = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)

    m = np.array(vals)
    cm = np.array(cents)
    ref_ks = np.argmax(m @ cm.T, axis=1)
    got = {r["vec_id"]: r["k"] for r in _assign_rowlocal(e, cents).collect()}
    assert got == {i: int(ref_ks[i]) for i in range(n)}

    out = _lloyd_round(spark, e, cents)
    for kk in range(k):
        mask = ref_ks == kk
        if not mask.any():
            assert out[kk] == cents[kk]  # emptied cluster
            continue
        mean = m[mask].mean(axis=0)
        nrm = np.sqrt(mean @ mean) or 1.0
        assert np.allclose(out[kk], mean / nrm, rtol=0, atol=1e-9)


@settings(max_examples=25, deadline=None)
@given(
    start=st.one_of(st.none(), st.integers(min_value=0, max_value=10**7)),
    ts=st.lists(st.integers(min_value=0, max_value=10**8), max_size=30),
)
def test_gap_fn_matches_scalar_reference(start, ts):
    """The vectorized in-batch gap scan must equal the original per-row
    loop: stragglers older than the incoming state max are skipped without
    alerting or regressing state; every other adjacent gap >= the
    threshold alerts once."""
    import numpy as np

    from storm_netmonitor_spark.streaming import alerts as A

    thr = A._GAP_US
    # scale some gaps up so alerts actually occur
    ts = sorted(t * (thr // 10**6) for t in ts)

    # scalar reference (the pre-round-4 loop)
    last = start
    ref = []
    for us in ts:
        if last is None:
            last = us
            continue
        if us < last:
            continue
        if us - last >= thr:
            ref.append((last, us, (us - last) // 60_000_000))
        last = us
    ref_state = last

    # vectorized path (mirror of _gap_fn's numpy core)
    us_arr = np.array(ts, dtype=np.int64)
    last_v = start
    got = []
    if len(us_arr):
        if last_v is not None:
            kept = us_arr[us_arr >= last_v]
            vals = np.concatenate(([last_v], kept))
        else:
            vals = us_arr
        if len(vals):
            gaps = np.diff(vals)
            idx = np.nonzero(gaps >= thr)[0]
            got = [
                (int(vals[i]), int(vals[i + 1]), int(gaps[i] // 60_000_000))
                for i in idx
            ]
            last_v = int(vals[-1])
    assert got == ref
    assert last_v == ref_state


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_interval_union_matches_sequential_merge(data):
    """Spark gaps-and-islands interval union == sequential sweep-line merge
    on arbitrary interval sets (random starts, random widths, ties and
    nested/touching intervals included)."""
    from storm_netmonitor_spark.operators.events_analytics import (
        interval_union_islands,
    )

    rows = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 2),          # user_id
                st.integers(0, 1000),       # start
                st.integers(0, 300),        # width (0 = degenerate point)
            ),
            min_size=1,
            max_size=25,
        )
    )
    recs = [
        (uid, i, s, s + wd) for i, (uid, s, wd) in enumerate(rows)
    ]
    spark = _spark()
    df = spark.createDataFrame(
        recs, "user_id long, event_id long, s long, e long"
    )
    got = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in interval_union_islands(df).collect()
    }

    expect = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for uid, _i, s, e in recs:
        by_user.setdefault(uid, []).append((s, e))
    for uid, ivs in by_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expect[uid] = (len(merged), sum(e - s for s, e in merged))
    assert got == expect


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_counter_increase_matches_scalar_reference(data):
    """Spark reset-aware increase == a sequential scalar loop over each
    user's ordered samples (integral values so the reference sum is exact)."""
    from storm_netmonitor_spark.operators.events_analytics import (
        counter_increase_by_key,
    )

    rows = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 2),      # user_id
                st.integers(0, 100),    # ts (duplicates allowed)
                st.integers(0, 500),    # counter reading (integral doubles)
            ),
            min_size=1,
            max_size=25,
        )
    )
    recs = [
        (uid, ts, i, float(v)) for i, (uid, ts, v) in enumerate(rows)
    ]
    spark = _spark()
    df = spark.createDataFrame(
        recs, "user_id long, ts long, event_id long, value double"
    )
    got = {
        r.user_id: (r.n_deltas, r.n_resets, r.total_increase)
        for r in counter_increase_by_key(df).collect()
    }

    expect = {}
    by_user: dict[int, list[tuple[int, int, float]]] = {}
    for uid, ts, i, v in recs:
        by_user.setdefault(uid, []).append((ts, i, v))
    for uid, samples in by_user.items():
        samples.sort()
        n_deltas = n_resets = 0
        total = 0.0
        for (_, _, prev), (_, _, cur) in zip(samples, samples[1:]):
            d = cur - prev
            n_deltas += 1
            if d < 0:
                n_resets += 1
                total += cur
            else:
                total += d
        if n_deltas:
            expect[uid] = (n_deltas, n_resets, round(total, 2))
    assert got == expect


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_gini_matches_pairwise_definition(data):
    """Rank-formula Gini (with distinct integer ranks on ties) == the
    O(n²) mean-absolute-difference definition G = Σᵢⱼ|xᵢ−xⱼ| / (2n²µ) —
    they coincide for any multiset, ties included, which pins both the
    formula and the tie-handling."""
    from storm_netmonitor_spark.operators.events_analytics import gini_over

    xs = data.draw(
        st.lists(st.integers(1, 10_000), min_size=2, max_size=20)
    )
    spark = _spark()
    # x carries 2-decimal totals like the production frame (cents / 100)
    rows = [("t", i, cents / 100.0) for i, cents in enumerate(xs)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, x double")
    got = gini_over(df).collect()[0]
    n = len(xs)
    mu = sum(xs) / n
    pairwise = sum(abs(a - b) for a in xs for b in xs) / (2 * n * n * mu)
    assert got.n_sources == n
    # dround routes through decimal(28,6), so 6 decimals survive
    assert abs(got.gini - pairwise) < 1e-6


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_changepoint_matches_every_split_scan(data):
    """Prefix-sum changepoint == the O(H²) every-split scan (recompute
    both segment means per candidate) on arbitrary series, including the
    min-segment guard and the earliest-hour tiebreak."""
    from storm_netmonitor_spark.operators.events_analytics import (
        step_changepoint_over,
    )

    min_seg = 3
    vals = data.draw(
        st.lists(st.integers(0, 50_000), min_size=2 * min_seg, max_size=24)
    )
    spark = _spark()
    rows = [("t", h, cents / 100.0) for h, cents in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, hnum long, v double")
    got = step_changepoint_over(df, min_seg=min_seg).collect()
    assert len(got) == 1
    got = got[0]

    xs = [cents / 100.0 for cents in vals]
    n = len(xs)
    best = None
    for k in range(min_seg, n - min_seg + 1):
        before = sum(xs[:k]) / k
        after = sum(xs[k:]) / (n - k)
        shift = abs(after - before)
        if best is None or shift > best[1] + 1e-9:
            best = (k, shift)
    k, shift = best
    assert got.n_before == k and got.n_after == n - k
    assert got.change_hour == k - 1  # hnum of the last point before the split
    assert abs(got.mean_shift - shift) < 1e-6


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_fuzzy_pairs_match_bruteforce_within_blocks(data):
    """Blocked fuzzy pairing == brute-force levenshtein over all ordered
    pairs sharing a block, on arbitrary small vocabularies."""
    from storm_netmonitor_spark.operators.surface import fuzzy_pairs_over

    def lev(s1: str, s2: str) -> int:
        if len(s1) < len(s2):
            s1, s2 = s2, s1
        prev = list(range(len(s2) + 1))
        for i, c1 in enumerate(s1):
            cur = [i + 1]
            for j, c2 in enumerate(s2):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
            prev = cur
        return prev[-1]

    word = st.text(alphabet="abc", min_size=1, max_size=5)
    block = st.sampled_from(["x", "y"])
    rows = data.draw(
        st.lists(st.tuples(word, block), min_size=1, max_size=12, unique=True)
    )
    spark = _spark()
    df = spark.createDataFrame(
        [(w, i + 1, blk) for i, (w, blk) in enumerate(rows)],
        "p_name string, n_parts long, block string",
    )
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs_over(df, max_dist=2).collect()
    }
    expect = {
        (a, b, lev(a, b))
        for (a, ba), (b, bb) in (
            (p, q) for p in rows for q in rows
        )
        if ba == bb and a < b and lev(a, b) <= 2
    }
    assert got == expect


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_bpe_pairs_match_counter_reference(data):
    """Vocabulary-reduced pair counting == a plain Python Counter over
    every token occurrence (the two orders of reduction must agree)."""
    from collections import Counter

    from storm_netmonitor_spark.operators.corpus2 import bpe_pairs_over

    word = st.text(alphabet="abz", min_size=1, max_size=6)
    texts = data.draw(
        st.lists(
            st.lists(word, min_size=0, max_size=6).map(" ".join),
            min_size=1,
            max_size=8,
        )
    )
    spark = _spark()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r.pair: r.n for r in bpe_pairs_over(df).collect()}

    ref: Counter = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    ref[w[i : i + 2]] += 1
    assert got == dict(ref)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_holt_fold_matches_scalar_reference(data):
    """The distributed Holt fold == a straight-line Python recursion over
    each series in bucket order, bit-for-bit (same expression shapes),
    for arbitrary series and multiple interleaved types."""
    from storm_netmonitor_spark.operators.events_analytics import holt_fold_over

    series = data.draw(
        st.dictionaries(
            st.sampled_from(["p", "q"]),
            st.lists(st.integers(0, 100_000), min_size=1, max_size=15),
            min_size=1,
            max_size=2,
        )
    )
    rows = [
        (t, h, cents / 100.0)
        for t, vals in series.items()
        for h, cents in enumerate(vals)
    ]
    spark = _spark()
    df = spark.createDataFrame(rows, "event_type string, hnum long, v double")
    got = {r.event_type: r for r in holt_fold_over(df).collect()}

    a, be = 0.5, 0.3
    for t, vals in series.items():
        xs = [c / 100.0 for c in vals]
        lvl, tr = xs[0], 0.0
        for v in xs[1:]:
            new_l = a * v + (1.0 - a) * (lvl + tr)
            tr = be * (new_l - lvl) + (1.0 - be) * tr
            lvl = new_l
        r = got[t]
        assert r.n_buckets == len(xs)
        assert abs(r.level - lvl) < 1e-6
        assert abs(r.trend - tr) < 1e-6
        assert abs(r.forecast_3 - (lvl + 3 * tr)) < 1e-6


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_concurrency_scan_matches_scalar_sweep(data):
    """The two-level prefix sum (within-bucket window + cross-bucket
    carry) equals a scalar one-pass sweep for ARBITRARY interval sets —
    including duplicate instants, equal start/end collisions, and
    intervals spanning many (possibly empty) buckets."""
    from storm_netmonitor_spark.operators.extensions4 import (
        _CONC_BUCKET_US,
        concurrency_over,
    )

    B = _CONC_BUCKET_US
    n = data.draw(st.integers(min_value=1, max_value=25))
    starts = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=5 * B),
            min_size=n, max_size=n,
        )
    )
    durs = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=3 * B),
            min_size=n, max_size=n,
        )
    )
    deltas = []
    for i, (s, d) in enumerate(zip(starts, durs)):
        deltas.append((s, 1, i))
        deltas.append((s + d, -1, i))
    df = _spark().createDataFrame(
        deltas, "t_us long, delta int, event_id long"
    )
    got = {
        (r["t_us"], r["delta"], r["event_id"]): r["conc"]
        for r in concurrency_over(df).select(
            "t_us", "delta", "event_id", "conc"
        ).collect()
    }
    running, want = 0, {}
    for t, d, i in sorted(deltas, key=lambda x: (x[0], x[1], x[2])):
        running += d
        want[(t, d, i)] = running
    assert got == want
    assert running == 0  # every interval closed


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_lttb_matches_rational_reference(data):
    """The count-scaled integer LTTB kernel selects the same points as an
    independent straight-from-the-paper implementation using TRUE bucket
    means and unscaled triangle areas in exact rational arithmetic — the
    scaling is area-order preserving (including on exact ties), not an
    approximation."""
    from fractions import Fraction

    from storm_netmonitor_spark.operators.extensions4 import _lttb_select

    n = data.draw(st.integers(min_value=3, max_value=120))
    m = data.draw(st.integers(min_value=3, max_value=20))
    # small magnitudes -> every float product below is exact in f64
    xs = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=5000),
                min_size=n, max_size=n, unique=True,
            )
        )
    )
    ys = data.draw(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=n, max_size=n,
        )
    )

    def rational_ref():
        if n <= m:
            return list(range(n))
        bucket = [0] + [
            1 + ((i - 1) * (m - 2)) // (n - 2) for i in range(1, n - 1)
        ] + [m - 1]
        members: dict[int, list[int]] = {}
        for i, b in enumerate(bucket):
            members.setdefault(b, []).append(i)
        sel = [0]
        for k in range(1, m):
            cands = members[k]
            if len(cands) == 1:
                sel.append(cands[0])
                continue
            p = sel[-1]
            nxt = members[k + 1]
            ax = Fraction(sum(xs[j] for j in nxt), len(nxt))
            ay = Fraction(sum(ys[j] for j in nxt), len(nxt))
            best, best_a = None, Fraction(-1)
            for c in cands:  # x order; strict > keeps the smaller x on ties
                a = abs(
                    (xs[p] - ax) * (ys[c] - ys[p])
                    - (xs[p] - xs[c]) * (ay - ys[p])
                )
                if a > best_a:
                    best, best_a = c, a
            sel.append(best)
        return sel

    assert _lttb_select(xs, ys, m=m) == rational_ref()


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_dwell_matches_scalar_reference(data):
    """Per-type dwell totals equal a scalar per-source walk for arbitrary
    interleaved sequences (including equal timestamps resolved by
    event_id)."""
    import datetime as dt

    from storm_netmonitor_spark.operators.extensions4 import dwell_by_type

    t0 = dt.datetime(2024, 1, 1)
    n = data.draw(st.integers(min_value=2, max_value=30))
    rows = []
    for i in range(n):
        rows.append(
            (
                data.draw(st.integers(min_value=1, max_value=3)),  # user
                t0
                + dt.timedelta(
                    seconds=data.draw(st.integers(min_value=0, max_value=10_000))
                ),
                i,
                data.draw(st.sampled_from(["A", "B", "C"])),
            )
        )
    df = _spark().createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        r["event_type"]: (r["n_dwell"], r["total_dwell_us"])
        for r in dwell_by_type(df).collect()
    }
    want: dict[str, list[int]] = {}
    by_user: dict[int, list] = {}
    for u, ts, eid, et in rows:
        by_user.setdefault(u, []).append((ts, eid, et))
    for seq in by_user.values():
        seq.sort()
        for (ts1, _, et), (ts2, _, _) in zip(seq, seq[1:]):
            w = want.setdefault(et, [0, 0])
            w[0] += 1
            w[1] += int((ts2 - ts1).total_seconds() * 1_000_000)
    assert got == {k: tuple(v) for k, v in want.items()}


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_burn_windows_match_scalar_trailing_ratio(data):
    """The trailing-6 RANGE frame over integer hour keys equals a scalar
    'hours within [h-5, h]' computation for arbitrary sparse hour sets —
    missing buckets contribute nothing (never zero-filled rows)."""
    from storm_netmonitor_spark.operators.extensions4 import burn_windows_over

    hours = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=40),
            min_size=1, max_size=15, unique=True,
        )
    )
    rows = []
    for h in hours:
        n = data.draw(st.integers(min_value=1, max_value=20))
        e = data.draw(st.integers(min_value=0, max_value=n))
        rows.append((h, n, e))
    df = _spark().createDataFrame(rows, "hour_num long, n_events long, n_errors long")
    got = {
        r["hour_num"]: (r["n_events"], r["n_errors"], r["slow_ratio"])
        for r in burn_windows_over(df).collect()
    }
    for h, n, e in rows:
        win = [(n2, e2) for h2, n2, e2 in rows if h - 5 <= h2 <= h]
        sn, se = sum(n2 for n2, _ in win), sum(e2 for _, e2 in win)
        want = round(float(se) / float(sn), 6)
        assert got[h][0] == n and got[h][1] == e
        assert abs(got[h][2] - want) < 1e-9, (h, got[h], want)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_rolling_actives_match_scalar_reference(data):
    """DAU/WAU over arbitrary sparse (day, user) activity equals the
    scalar 'distinct users in [d-6, d]' definition on every OBSERVED day,
    and no unobserved day reports."""
    import datetime as dt

    from storm_netmonitor_spark.operators.extensions4 import rolling_actives_over

    d0 = dt.date(2024, 1, 1)
    pairs = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=20),
                st.integers(min_value=1, max_value=6),
            ),
            min_size=1, max_size=40, unique=True,
        )
    )
    du = _spark().createDataFrame(
        [(d0 + dt.timedelta(days=d), u) for d, u in pairs], "d date, user_id long"
    )
    got = {
        r["day"]: (r["dau"], r["wau_7d"])
        for r in rolling_actives_over(du).collect()
    }
    days = sorted({d for d, _ in pairs})
    assert set(got) == {
        (d0 + dt.timedelta(days=d)).strftime("%Y-%m-%d") for d in days
    }
    for d in days:
        dau = len({u for dd, u in pairs if dd == d})
        wau = len({u for dd, u in pairs if d - 6 <= dd <= d})
        assert got[(d0 + dt.timedelta(days=d)).strftime("%Y-%m-%d")] == (dau, wau)


def _simhash_ref(texts: list[str]) -> list[int]:
    """Scalar reference of _simhash_batch: md5 token hashes (bit i of the
    big-endian first-8-bytes integer), ±1 votes over token OCCURRENCES,
    sign-packed 64-bit signature."""
    import hashlib

    sigs = []
    for t in texts:
        votes = [0] * 64
        for tok in [w for w in t.lower().split(" ") if w]:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sig = 0
        for i in range(64):
            if votes[i] > 0:
                sig |= 1 << i
        sigs.append(sig)
    return sigs


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_simhash_banding_is_lossless_on_random_corpora(data):
    """The 7-band layout's pigeonhole guarantee, adversarially: on random
    small corpora (tiny vocabulary → many near-identical docs → many
    pairs at every hamming distance) the operator's output must EQUAL the
    brute-force all-pairs hamming ≤ 6 set — the property the all-pairs
    SQL oracle relies on, which the old 4×16 banding violated (missed
    17/78 pairs on the real corpus)."""
    from storm_netmonitor_spark.operators.text import (
        SIMHASH_MAX_HAMMING,
        near_dup_simhash_pairs,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    n_docs = data.draw(st.integers(min_value=2, max_value=14))
    texts = [
        " ".join(
            data.draw(
                st.lists(st.sampled_from(vocab), min_size=1, max_size=8)
            )
        )
        for _ in range(n_docs)
    ]
    spark = _spark()
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in near_dup_simhash_pairs(d).collect()
    }
    sigs = _simhash_ref(texts)
    want = set()
    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            hm = bin(sigs[i] ^ sigs[j]).count("1")
            if hm <= SIMHASH_MAX_HAMMING:
                want.add((i, j, hm))
    assert got == want


# ---------------------------------------------------------------------------
# dratio: exact half-away decimal-ratio rounding (stable.py QUOTIENT hazard)
# ---------------------------------------------------------------------------


def _half_away_ref(n_scaled: int, den: int, round_to: int, in_scale: int) -> float:
    """Straight-line reference: round-half-away-from-zero of the exact
    rational (n_scaled·10^-in_scale)/den at round_to decimals, in exact
    integer arithmetic via Fraction."""
    from fractions import Fraction

    q = Fraction(abs(n_scaled), den * 10 ** (in_scale - round_to))
    whole, rem = divmod(q.numerator, q.denominator)
    if 2 * rem >= q.denominator:
        whole += 1
    sign = -1 if n_scaled < 0 else 1
    return sign * whole / 10**round_to


@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**13), max_value=10**13),
            st.integers(min_value=1, max_value=10**7),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_dratio_matches_exact_rational(pairs, round_to):
    """dratio (Spark) and dratio_sql (DuckDB) both equal the exact
    Fraction-based half-away reference — INCLUDING planted .5-boundary
    cases, where rounding the double quotient diverges between engines
    (the doc-147 bug this helper exists to kill)."""
    import duckdb

    from storm_netmonitor_spark.functions.stable import dratio, dratio_sql

    # plant an exact boundary case alongside the random ones:
    # N ≡ den/2 (mod den) with even den → quotient scaled lands on x.5
    pairs = list(pairs) + [(3397428 * 84 + 42, 84), (-(3397428 * 84 + 42), 84)]

    spark = _spark()
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(pairs)], "i long, n long, d long"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", dratio(F.col("n"), F.col("d"), round_to).alias("out")
        ).collect()
    }
    con = duckdb.connect()
    for i, (n, d) in enumerate(pairs):
        want = _half_away_ref(n, d, round_to, 6)
        assert got[i] == want, f"spark dratio({n},{d},{round_to}): {got[i]} != {want}"
        (duck,) = con.execute(
            f"SELECT {dratio_sql(str(n), str(d), round_to)}"
        ).fetchone()
        assert duck == want, f"duck dratio({n},{d},{round_to}): {duck} != {want}"
    con.close()


def test_dratio_doc147_regression():
    """The measured round-6 divergence: sum_nll=285.383994 over 84 tokens
    scales to exactly 3397428.5 — DuckDB's double→DECIMAL cast said
    3.397429 while Spark's string-path cast said 3.397428. dratio must
    give the half-away answer 3.397429 in BOTH engines."""
    import duckdb

    from storm_netmonitor_spark.functions.stable import dratio, dratio_sql

    spark = _spark()
    df = spark.createDataFrame([(285383994, 84)], "n long, d long")
    (row,) = df.select(dratio(F.col("n"), F.col("d"), 6).alias("x")).collect()
    assert row["x"] == 3.397429
    con = duckdb.connect()
    (duck,) = con.execute(f"SELECT {dratio_sql('285383994', '84', 6)}").fetchone()
    con.close()
    assert duck == 3.397429


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50_000),  # minute number
            st.floats(
                min_value=-1e4, max_value=1e4, allow_nan=False, width=64
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ewma_fold_matches_scalar_reference(points):
    """ewma_fold_over equals a straight-line scalar recurrence — exact
    equality, because the fold is libm-free (powers of two only)."""
    from storm_netmonitor_spark.operators.events_analytics import (
        _EWMA_HALF_LIFE_MIN,
        _EWMA_KMAX,
        ewma_fold_over,
    )

    # dedupe minutes (reduce step guarantees unique mnum per key), 2 keys
    series = {}
    for i, (mn, v) in enumerate(points):
        series.setdefault(("a" if i % 2 else "b"), {})[mn] = round(v, 2)

    rows, want = [], {}
    for key, pts in series.items():
        s = v = 0.0
        last = None
        for mn in sorted(pts):
            v = pts[mn]
            rows.append((key, mn, v))
            if last is None:
                s = v
            else:
                k = min((mn - last) // _EWMA_HALF_LIFE_MIN, _EWMA_KMAX)
                u = 0.75 / (1 << k)
                s = u * s + (1.0 - u) * v
            last = mn
        want[key] = (len(pts), last, s, v)

    spark = _spark()
    m = spark.createDataFrame(rows, "event_type string, mnum long, v double")
    got = {
        r["event_type"]: (r["n_points"], r["last_minute"], r["ewma"], r["last_v"])
        for r in ewma_fold_over(m).collect()
    }
    for key, (n, last, s, v) in want.items():
        gn, gl, gs, gv = got[key]
        assert (gn, gl) == (n, last)
        assert gs == round(s, 6) or abs(gs - s) < 1e-6, (key, gs, s)
        assert abs(gv - v) < 1e-9


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.data())
def test_mmr_kernel_matches_greedy_reference(data):
    """mmr_diversify_over equals a straight-line greedy MMR over exact
    6-decimal rel/sim values computed from the same embeddings."""
    import numpy as np
    from decimal import Decimal, ROUND_HALF_UP

    from storm_netmonitor_spark.operators.vectors import mmr_diversify_over

    n = data.draw(st.integers(min_value=4, max_value=12))
    dim = 8
    rng_ints = data.draw(
        st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=(n + 1) * dim,
            max_size=(n + 1) * dim,
        )
    )
    vecs = np.array(rng_ints, dtype=np.float64).reshape(n + 1, dim)
    # unit-normalize (zero rows nudged) so cosine == dot, like the corpus
    for i in range(n + 1):
        nrm = float(np.sqrt(vecs[i] @ vecs[i]))
        vecs[i] = vecs[i] / (nrm or 1.0)

    def d6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    rel = {i: d6(float(vecs[i] @ vecs[0])) for i in range(1, n + 1)}
    n_cand = min(6, n)
    shortlist = sorted(rel, key=lambda i: (-rel[i], i))[:n_cand]
    sim = {
        (a, b): d6(float(vecs[a] @ vecs[b]))
        for a in shortlist
        for b in shortlist
        if a != b
    }
    want = []
    remaining = {i: rel[i] for i in shortlist}
    selected = []
    n_pick = min(4, n_cand)
    while remaining and len(selected) < n_pick:
        best, bs = None, None
        for c in sorted(remaining):
            if not selected:
                sc = remaining[c]
            else:
                sc = 0.75 * remaining[c] - 0.25 * max(
                    sim[(c, s)] for s in selected
                )
            if bs is None or sc > bs:
                best, bs = c, sc
        selected.append(best)
        want.append((len(selected), best, rel[best], bs))
        del remaining[best]

    spark = _spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n + 1)],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: recompute reference rel/sim from the float32 cast
    import pandas as pd  # noqa: F401
    f32 = np.array([np.array(v, dtype=np.float32) for v in vecs])
    rel = {i: d6(float(np.float64(f32[i]) @ np.float64(f32[0]))) for i in range(1, n + 1)}
    shortlist = sorted(rel, key=lambda i: (-rel[i], i))[:n_cand]
    sim = {
        (a, b): d6(float(np.float64(f32[a]) @ np.float64(f32[b])))
        for a in shortlist for b in shortlist if a != b
    }
    want = []
    remaining = {i: rel[i] for i in shortlist}
    selected = []
    while remaining and len(selected) < n_pick:
        best, bs = None, None
        for c in sorted(remaining):
            if not selected:
                sc = remaining[c]
            else:
                sc = 0.75 * remaining[c] - 0.25 * max(
                    sim[(c, s)] for s in selected
                )
            if bs is None or sc > bs:
                best, bs = c, sc
        selected.append(best)
        want.append((len(selected), best, rel[best], bs))
        del remaining[best]

    got = [
        (r["pick_order"], r["vec_id"], r["rel"], r["mmr_score"])
        for r in mmr_diversify_over(df, 0, n_cand, n_pick)
        .orderBy("pick_order")
        .collect()
    ]
    assert [(o, v) for o, v, _, _ in got] == [(o, v) for o, v, _, _ in want]
    for (_, _, gr, gs), (_, _, wr, ws) in zip(got, want):
        assert abs(gr - wr) < 2e-6 and abs(gs - ws) < 2e-6


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=1, max_value=500_000),  # cents
            st.integers(min_value=1, max_value=40),  # weight
        ),
        min_size=1,
        max_size=60,
    )
)
def test_weighted_median_kernel_matches_scalar_reference(rows):
    """weighted_median_over equals the textbook definition: smallest value
    whose cumulative weight reaches half the total — including values that
    straddle band boundaries of the two-level prefix sum."""
    from collections import defaultdict

    from storm_netmonitor_spark.operators.aggregations import (
        weighted_median_over,
    )

    agg = defaultdict(lambda: defaultdict(int))
    for f, c, w in rows:
        agg[f][c] += w
    want = {}
    for f, cw in agg.items():
        tot = sum(cw.values())
        run = 0
        med = None
        for c in sorted(cw):
            run += cw[c]
            if 2 * run >= tot and med is None:
                med = c
        n_bands = len({c // 100_000 for c in cw})
        want[f] = (med, tot, n_bands)

    spark = _spark()
    # feed RAW rows (duplicate cents included) — the kernel owns the reduce
    wp = spark.createDataFrame(
        list(rows), "flag string, cents long, w long"
    )
    got = {
        r["flag"]: (r["median_cents"], r["tot"], r["n_bands"])
        for r in weighted_median_over(wp).collect()
    }
    assert got == want


@settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_kernel_matches_bruteforce(raw_edges):
    """triangle_count_over equals the O(n³) brute-force census on random
    multigraphs (self-loops and duplicate edges dropped, as the op's
    edge-derivation stage guarantees)."""
    from itertools import combinations

    from storm_netmonitor_spark.operators.vectors import triangle_count_over

    graphs: dict[str, set] = {}
    for g, u, v in raw_edges:
        if u != v:
            graphs.setdefault(g, set()).add((min(u, v), max(u, v)))
    want = {}
    for g, es in graphs.items():
        nodes = sorted({x for e in es for x in e})
        n = sum(
            1
            for a, b, c in combinations(nodes, 3)
            if (a, b) in es and (b, c) in es and (a, c) in es
        )
        if n:
            want[g] = n

    spark = _spark()
    rows = [(g, lo, hi) for g, es in graphs.items() for lo, hi in es]
    if not rows:
        return
    edges = spark.createDataFrame(rows, "label string, lo long, hi long")
    got = {
        r["label"]: r["n_triangles"]
        for r in triangle_count_over(edges).collect()
    }
    assert got == want


def test_pq_encode_matches_numpy_argmin(spark):
    """vec_pq_encode's code assignment equals a numpy per-subspace
    squared-distance argmin with the same (d2, code) tiebreak."""
    import numpy as np
    import pyarrow.parquet as pq

    from storm_netmonitor_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    seeds = np.stack([emb[ids == c][0] for c in range(1, 17)])
    want = {}
    for i, vid in enumerate(ids):
        for sub in range(8):
            sl = slice(sub * 8, sub * 8 + 8)
            d2 = np.round(
                ((emb[i, sl][None, :] - seeds[:, sl]) ** 2).sum(axis=1), 6
            )
            # (d2, code) tiebreak: argmin over lexicographic order
            best = min(range(16), key=lambda c: (d2[c], c + 1)) + 1
            want[(int(vid), sub)] = best
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in QUERIES["vec_pq_encode"](spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=60,
    )
)
def test_cms_counters_merge_and_lower_bound(keys):
    """The relational CMS on arbitrary key streams: (1) counters over a
    split input merged by addition equal counters over the whole input
    (the mergeability the streaming twin relies on); (2) every point
    estimate is ≥ the true count (one-sided guarantee)."""
    from collections import Counter

    from storm_netmonitor_spark.operators.extensions5 import (
        cms_counters,
        cms_point_estimates,
    )

    spark = _spark()
    df = spark.createDataFrame([(k,) for k in keys], "event_type string")
    half = len(keys) // 2
    d1 = spark.createDataFrame(
        [(k,) for k in keys[:half]] or [("__none__",)], "event_type string"
    )
    d2 = spark.createDataFrame(
        [(k,) for k in keys[half:]] or [("__none__",)], "event_type string"
    )
    whole = {
        (r["row_i"], r["bucket"]): r["c"]
        for r in cms_counters(df).collect()
    }
    merged: dict = {}
    for part in (d1, d2):
        for r in cms_counters(part).collect():
            merged[(r["row_i"], r["bucket"])] = (
                merged.get((r["row_i"], r["bucket"]), 0) + r["c"]
            )
    if half and half < len(keys):
        assert merged == whole
    exact = Counter(keys)
    est = {
        r["event_type"]: r["cms_est"]
        for r in cms_point_estimates(
            cms_counters(df), df.distinct()
        ).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=30,
    )
)
def test_rolling_median_kernel_matches_scalar_reference(values):
    """rolling_median_over equals the scalar lower-median walk on one
    synthetic key (bounded 7-row frame, order statistic semantics)."""
    import datetime as dt

    from storm_netmonitor_spark.operators.extensions5 import (
        rolling_median_over,
    )

    spark = _spark()
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["roll_med"]
        for r in rolling_median_over(df).collect()
    }
    for i in range(len(values)):
        win = sorted(float(v) for v in values[max(0, i - 6) : i + 1])
        assert got[i] == win[(len(win) + 1) // 2 - 1]


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_hamming_topk_kernel_matches_bruteforce(vecs):
    """hamming_topk equals the scalar sign-signature walk on arbitrary
    small frames: same hamming distances, same (hamming, id) order."""
    from storm_netmonitor_spark.operators.extensions5 import hamming_topk

    spark = _spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    import numpy as np

    sigs = {
        i: sum(
            1 << p
            for p, x in enumerate(np.array(v, dtype=np.float32))
            if x >= 0
        )
        for i, v in enumerate(vecs)
    }
    want = sorted(
        (bin(s ^ sigs[0]).count("1"), i)
        for i, s in sigs.items()
        if i != 0
    )[:10]
    got = sorted(
        (r["hamming"], r["vec_id"])
        for r in hamming_topk(df).collect()
    )
    assert got == want


def test_knn_candidates_cover_bruteforce_topk(spark):
    """_knn_candidates (the triangle census's BLAS prefilter) must contain
    the exact float top-k neighbors of every node in its shortlist on the
    real testdata — the containment the margin audit's gap row certifies
    analytically, checked directly here."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from storm_netmonitor_spark.operators.vectors import (
        _TRI_K,
        _TRI_SHORTLIST,
        _knn_candidates,
    )

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet").to_pylist()
    by_label: dict = {}
    for r in t:
        by_label.setdefault(r["label"], []).append(r)
    for lb, rows in sorted(by_label.items())[:3]:
        pdf = pd.DataFrame(
            {
                "label": [lb] * len(rows),
                "vec_id": [r["vec_id"] for r in rows],
                "embedding": [r["embedding"] for r in rows],
            }
        )
        cand = _knn_candidates(pdf, _TRI_SHORTLIST)
        cand_set = set(zip(cand["a_id"], cand["b_id"]))
        ids = sorted(r["vec_id"] for r in rows)
        m = np.array(
            [r["embedding"] for r in sorted(rows, key=lambda x: x["vec_id"])],
            dtype=np.float64,
        )
        g = m @ m.T
        np.fill_diagonal(g, -np.inf)
        for i, a in enumerate(ids):
            top = np.argsort(-g[i], kind="stable")[:_TRI_K]
            for j in top:
                assert (a, ids[j]) in cand_set


# ---------------------------------------------------------------------------
# Band-census quantile family — degenerate distributions (VERDICT r8 #6).
# The 10×-corpus test pins growth; these pin adversarial SHAPE: all-equal
# scores (one band holds the whole corpus), n < 3, and non-finite values.


def _ref_tercile_buckets(scores: list[float | None]) -> list[str]:
    """Pure-Python mirror of the oracle's exact integer rank formula:
    t1 = k1-th order statistic of the FINITE scores (k1 = (n+2)//3),
    t2 = k2-th (k2 = (2n+2)//3); bucket by value comparison, where any
    comparison involving NaN/NULL is false (→ tail) and -inf ≤ t1 → head."""
    finite = sorted(v for v in scores if v is not None and math.isfinite(v))
    n = len(finite)
    t1 = finite[(n + 2) // 3 - 1] if n else None
    t2 = finite[(2 * n + 2) // 3 - 1] if n else None

    def bucket(v):
        if v is None or t1 is None or math.isnan(v):
            return "tail"
        if v <= t1:
            return "head"
        if v <= t2:
            return "middle"
        return "tail"

    return [bucket(v) for v in scores]


_score_lists = st.one_of(
    # all-equal: one band holds the whole corpus
    st.tuples(
        st.floats(
            min_value=-30.0, max_value=30.0, allow_nan=False, allow_infinity=False
        ),
        st.integers(min_value=1, max_value=25),
    ).map(lambda t: [t[0]] * t[1]),
    # tiny corpora: n in {0, 1, 2}
    st.lists(
        st.floats(
            min_value=0.0, max_value=25.0, allow_nan=False, allow_infinity=False
        ),
        min_size=0,
        max_size=2,
    ),
    # general, WITH non-finite injections and sub-band spreads
    st.lists(
        st.one_of(
            st.floats(
                min_value=0.0,
                max_value=25.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            # spread far below 1/64 nat: many distinct values, one band
            st.floats(min_value=5.0, max_value=5.0078125),
            st.sampled_from(
                [float("nan"), float("inf"), float("-inf"), None, 1e300]
            ),
        ),
        min_size=1,
        max_size=30,
    ),
)


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(scores=_score_lists)
def test_ppl_tercile_buckets_degenerate_shapes(scores):
    """ppl_tercile_buckets_over matches the oracle rank formula on
    degenerate distributions: all-equal scores (the whole corpus in ONE
    band — the in-band pass must still terminate via the per-value
    census), n < 3 docs, sub-band spreads (< 1/64 nat), and NaN/±inf/
    NULL/overflow-magnitude scores (excluded from the threshold search,
    bucketed tail except -inf → head)."""
    from storm_netmonitor_spark.kernels import ppl_tercile_buckets_over

    spark = _spark()
    df = spark.createDataFrame(
        [(i, 1, v) for i, v in enumerate(scores)],
        "doc_id long, n_tokens long, xent double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in ppl_tercile_buckets_over(df).collect()
    }
    want = dict(enumerate(_ref_tercile_buckets(scores)))
    assert got == want


def test_weighted_median_degenerate_shapes():
    """weighted_median_over on the shapes hypothesis rarely lands on:
    every row identical (one band, one distinct value), a single row,
    and all mass on one band boundary."""
    from storm_netmonitor_spark.operators.aggregations import (
        weighted_median_over,
    )

    spark = _spark()
    cases = {
        # all-equal: median IS the value, one band
        "allequal": ([("A", 7, 3)] * 20, ("A", 7, 60, 1)),
        # single row
        "single": ([("B", 123456, 1)], ("B", 123456, 1, 1)),
        # exact band boundary value (cents = band width)
        "boundary": ([("C", 100_000, 2), ("C", 99_999, 1)], ("C", 100_000, 3, 2)),
    }
    for label, (rows, (flag, med, tot, n_bands)) in cases.items():
        got = {
            r["flag"]: (r["median_cents"], r["tot"], r["n_bands"])
            for r in weighted_median_over(
                spark.createDataFrame(rows, "flag string, cents long, w long")
            ).collect()
        }
        assert got == {flag: (med, tot, n_bands)}, (label, got)


# ---------------------------------------------------------------------------
# pagerank_over — iterate-to-tolerance kernel vs a fixed-point reference
# (VERDICT r8 #7; the registry op stays pinned at 3 iterations for the
# unrolled SQL oracle — this pins the production facade's convergence).


def _ref_pagerank(
    edges: list[tuple[int, int]],
    damp: float,
    teleport: float,
    tol: float | None,
    max_iter: int,
) -> tuple[dict[int, float], int]:
    """Pure-Python mirror of the kernel's EXACT arithmetic: per-node
    fixed-point weight floor(rank·1e18/d) (Python float IS the same IEEE
    double), integer contribution sums, damped double recombination,
    max|Δrank| stop rule."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = sorted(deg)
    n = float(len(nodes))
    scale = 1e18
    ranks = {v: 1.0 / n for v in nodes}
    iters = 0
    for i in range(max_iter):
        w = {v: math.floor(ranks[v] * scale / deg[v]) for v in nodes}
        contrib = defaultdict(int)
        for s, d in edges:
            contrib[d] += w[s]
        new = {
            v: teleport / n + damp * (float(contrib.get(v, 0)) / scale)
            for v in nodes
        }
        iters = i + 1
        delta = max(abs(new[v] - ranks[v]) for v in nodes)
        ranks = new
        if tol is not None and delta <= tol:
            break
    return ranks, iters


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_pagerank_over_matches_fixed_point_reference(data):
    """pagerank_over (tol-driven) returns bit-identical ranks AND the
    same iteration count as the sequential fixed-point reference, on
    arbitrary small symmetric graphs; tol=None runs exactly max_iter."""
    from storm_netmonitor_spark.operators.extensions3 import pagerank_over

    n_nodes = data.draw(st.integers(min_value=2, max_value=12))
    pairs = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n_nodes - 1),
                st.integers(min_value=0, max_value=n_nodes - 1),
            ).filter(lambda t: t[0] != t[1]),
            min_size=1,
            max_size=30,
        )
    )
    # symmetrize + dedup: every node that appears does so as a src
    edges = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    tol = data.draw(st.sampled_from([None, 1e-4, 1e-7]))
    max_iter = data.draw(st.integers(min_value=1, max_value=8))

    want, want_iters = _ref_pagerank(edges, 0.85, 0.15, tol, max_iter)

    spark = _spark()
    edf = spark.createDataFrame(edges, "src long, dst long")
    ranks, iters = pagerank_over(
        edf, tol=tol, max_iter=max_iter, ckpt_every=2
    )
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert iters == want_iters
    assert set(got) == set(want)
    for v in want:
        assert got[v] == want[v], (v, got[v], want[v])


def test_ppl_tercile_buckets_all_nonfinite():
    """Non-empty frame whose scores are ALL non-finite: the threshold
    search sees an empty census (t1 = t2 = NULL) and every document —
    including -inf, whose ≤-comparison against a NULL threshold is NULL —
    lands in 'tail'. Deterministic pin of the edge hypothesis only
    sometimes generates."""
    from storm_netmonitor_spark.kernels import ppl_tercile_buckets_over

    spark = _spark()
    df = spark.createDataFrame(
        [
            (0, 1, float("nan")),
            (1, 1, float("inf")),
            (2, 1, float("-inf")),
            (3, 1, None),
        ],
        "doc_id long, n_tokens long, xent double",
    )
    got = {
        r["doc_id"]: r["bucket"] for r in ppl_tercile_buckets_over(df).collect()
    }
    assert got == {0: "tail", 1: "tail", 2: "tail", 3: "tail"}


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_frozen_ppl_score_matches_scalar_reference(data):
    """Third-implementation cross-check for the §2.AC frozen scorer:
    Spark's rollup+join+dratio pipeline == a plain-Python scalar scorer
    on arbitrary tiny corpora and vocabularies — OOV pseudo-count, token
    counts, and the exact-rational xent rounding all replicated
    independently."""
    import math

    from storm_netmonitor_spark.operators.extensions12 import (
        frozen_ppl_score,
    )

    vocab = data.draw(
        st.lists(
            st.sampled_from("abcdefg"), min_size=1, max_size=5, unique=True
        )
    )
    counts = {
        w: data.draw(st.integers(1, 9), label=f"cw_{w}") for w in vocab
    }
    total = sum(counts.values())
    docs = data.draw(
        st.lists(
            st.lists(
                st.sampled_from("abcdefghij"), min_size=1, max_size=12
            ),
            min_size=1,
            max_size=6,
        )
    )
    spark = _spark()
    lm_df = spark.createDataFrame(
        [(w, c, total) for w, c in counts.items()],
        "w string, cw long, total long",
    )
    docs_df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_tokens"], r["xent"])
        for r in frozen_ppl_score(docs_df, lm_df).collect()
    }
    from collections import Counter

    for i, toks in enumerate(docs):
        n = len(toks)
        oov = sum(1 for t in toks if t not in counts)
        # scalar reference mirrors the engine's term granularity: ONE
        # term per DISTINCT word, c·(−ln p), decimal-6 rounded per term
        # (dec_scaled's cast), summed; then dratio's exact half-away
        # rational over n — floor((2N + D) / (2D))
        nll_e6 = sum(
            round(c * -math.log(counts.get(t, 1) / total) * 1e6)
            for t, c in Counter(toks).items()
        )
        N, D = abs(nll_e6), n
        q6 = (2 * N + D) // (2 * D)
        xent_ref = q6 / 1e6
        assert got[i][0] == n
        assert got[i][1] == oov
        assert abs(got[i][2] - xent_ref) < 1e-12, (i, got[i][2], xent_ref)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_compaction_packing_matches_sequential_reference(data):
    """Third-implementation cross-check for the §2.AB compaction
    planner's window arithmetic: the prefix-sum bin assignment over an
    arbitrary (date, hour, rows) inventory == a sequential scalar
    packer walking hours in order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators.extensions11 import (
        _CPT_TARGET_ROWS,
    )

    dates = data.draw(
        st.lists(st.sampled_from(["d1", "d2", "d3"]), min_size=1,
                 max_size=3, unique=True)
    )
    inv = []
    for d in dates:
        hrs = data.draw(
            st.lists(st.integers(0, 23), min_size=1, max_size=12,
                     unique=True),
            label=f"hrs_{d}",
        )
        for h in sorted(hrs):
            inv.append(
                (d, h, data.draw(st.integers(1, 900), label=f"n_{d}_{h}"))
            )
    spark = _spark()
    files = spark.createDataFrame(
        inv, "event_date string, hr int, n_rows long"
    )
    w = (
        Window.partitionBy("event_date")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        (r["event_date"], r["hr"]): r["bin_id"]
        for r in files.select(
            "event_date",
            "hr",
            (
                F.coalesce(F.sum("n_rows").over(w), F.lit(0))
                / F.lit(_CPT_TARGET_ROWS)
            )
            .cast("long")
            .alias("bin_id"),
        ).collect()
    }
    # sequential reference: walk hours in order, bin = rows-before DIV T
    ref = {}
    for d in dates:
        run = 0
        for dd, h, n in sorted(x for x in inv if x[0] == d):
            ref[(d, h)] = run // _CPT_TARGET_ROWS
            run += n
    assert got == ref


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(data=st.data())
def test_ri_edge_audit_matches_scalar_reference(data):
    """Third-implementation cross-check for the §2.AB RI kernel: the
    join+conditional-aggregate census == a plain-Python set-membership
    count on arbitrary child/parent key multisets (NULLs, duplicates on
    both sides, empty-overlap cases all drawn)."""
    from storm_netmonitor_spark.operators.extensions11 import ri_edge_audit

    child = data.draw(
        st.lists(
            st.one_of(st.none(), st.integers(0, 12)),
            min_size=1,
            max_size=25,
        )
    )
    parent = data.draw(st.lists(st.integers(0, 12), max_size=15))
    spark = _spark()
    cdf = spark.createDataFrame([(k,) for k in child], "k bigint")
    if parent:
        pdf = spark.createDataFrame([(k,) for k in parent], "pk bigint")
    else:
        pdf = spark.createDataFrame([], "pk bigint")
    out = ri_edge_audit(cdf, "k", pdf, "pk", "c.k", "p.pk").collect()[0]
    pset = set(parent)
    n_null = sum(1 for k in child if k is None)
    n_orphan = sum(1 for k in child if k is not None and k not in pset)
    assert out["n_child"] == len(child)
    assert out["n_null"] == n_null
    assert out["n_orphan"] == n_orphan
    # exact half-away share: floor((2N + D) / (2D)) at 6 decimals
    N, D = n_orphan * 10**6, len(child)
    q6 = (2 * N + D) // (2 * D)
    assert abs(out["orphan_pct"] - q6 / 1e6) < 1e-12
