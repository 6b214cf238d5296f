"""Scale-behavior probe tests (VERDICT r5 #3): the AQE skew split must
actually HAPPEN (the hash oracle only proves it changed no answer), the
demo's tuning must not leak into the session, and the 10× replication
stress must scale every group count exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_netmonitor_spark.operators.scale_probes import (
    SKEW_DEMO_CONFS,
    STRESS_REPLICAS,
    scoped_confs,
    skew_demo_frame,
)
from storm_netmonitor_spark.registry import QUERIES

from .conftest import SF_CORRECT, SF_SMOKE


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_join_aqe_splits_hot_partition(spark):
    """Under the demo confs the executed (adaptive) plan must show the
    hot partition detected and split: SortMergeJoin(skew=true) fed by a
    skewed AQEShuffleRead — the runtime alternative to manual salting."""
    with scoped_confs(spark, SKEW_DEMO_CONFS):
        df = skew_demo_frame(spark, SF_CORRECT)
        rows = df.collect()
        p = _executed(df)
    assert "skew=true" in p, f"AQE never split the planted hot key:\n{p}"
    assert "skewed" in p, p  # the AQEShuffleRead marker on the fact side
    assert len(rows) == 7  # grp = skew_key % 7


def test_skew_demo_confs_do_not_leak(spark):
    """join_skew_aqe materializes under scoped confs; afterwards the
    session must be back on its previous AQE sizing (a 64 KB advisory
    partition size would shatter every later query's coalescing)."""
    before = {}
    for k in SKEW_DEMO_CONFS:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    QUERIES["join_skew_aqe"](spark, SF_CORRECT).collect()
    for k, want in before.items():
        try:
            got = spark.conf.get(k)
        except Exception:
            got = None
        assert got == want, f"{k} leaked: {want!r} -> {got!r}"


def test_skew_demo_result_is_checkpoint_materialized(spark):
    """The returned frame must already be materialized (its plan is an
    RDD scan, not the lazy join): collecting it twice must not re-run
    the skewed join, and must be deterministic."""
    df = QUERIES["join_skew_aqe"](spark, SF_CORRECT)
    p = df._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in p, p
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b


def test_stress_replicate_scales_groups_exactly(spark):
    """Every (returnflag, linestatus) group of the replicated rollup must
    carry exactly STRESS_REPLICAS × the base table's rows — the
    scaling-curve claim as an arithmetic identity."""
    out = {
        (r.l_returnflag, r.l_linestatus): r.n_rows
        for r in QUERIES["stress_scale_replicate"](spark, SF_SMOKE).collect()
    }
    base = {
        (r.l_returnflag, r.l_linestatus): r.n
        for r in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(base)
    for k, n in base.items():
        assert out[k] == n * STRESS_REPLICAS, (k, out[k], n)


def test_dpp_plants_dynamic_pruning_subquery(spark):
    """The fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — runtime pruning from the filtered dim's broadcast
    — and, executed, actually read only the 3 of 30 date directories the
    dim selects."""
    import contextlib
    import io

    df = QUERIES["join_dpp_prune"](spark, SF_CORRECT)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "dynamicpruning" in p.lower(), p
    rows = df.collect()
    assert len(rows) == 3  # days 3, 13, 23 of the 30-day window
    # the executed adaptive plan keeps the pruning expression on the scan
    pe = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in pe.lower(), pe


def test_resume_checkpoint_is_repeatable_in_one_session(spark):
    """Each call runs its own two-lifecycle drain against a fresh
    checkpoint (the staged halves are shared): back-to-back calls must
    agree exactly — decimal sums make the restored-state totals
    order-independent."""
    fn = QUERIES["stream_resume_checkpoint"]
    a = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    assert a == b
    assert len(a) >= 1


def test_stress_replicate_fans_out_in_codegen(spark):
    """The replication must be a row-local Generate (explode) inside the
    scan's codegen span — no join of any kind, and the partial
    aggregation must sit below the final exchange so the 10× blow-up
    collapses map-side before anything shuffles."""
    import contextlib
    import io

    df = QUERIES["stress_scale_replicate"](spark, SF_CORRECT)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Generate" in p and "explode" in p, p
    assert "Join" not in p, p
    assert p.count("HashAggregate") >= 2, p


def test_bloom_runtime_filter_is_injected(spark):
    """Under the demo confs the executed plan must show row-level runtime
    semi-join reduction: a bloom_filter_agg build on the dim side and a
    might_contain filter applied to the fact scan BEFORE its exchange."""
    from storm_netmonitor_spark.operators.scale_probes import (
        BLOOM_DEMO_CONFS,
        bloom_demo_frame,
    )

    with scoped_confs(spark, BLOOM_DEMO_CONFS):
        df = bloom_demo_frame(spark, SF_CORRECT)
        rows = df.collect()
        p = _executed(df)
    assert "might_contain" in p, f"no runtime bloom filter on the fact side:\n{p}"
    assert "bloom_filter_agg" in p, p
    assert 0 < len(rows) <= 27  # brands present in the p_size=1 slice


def test_bloom_demo_confs_do_not_leak(spark):
    """join_bloom_runtime materializes under scoped confs; afterwards the
    session must be back on its previous broadcast threshold (a -1
    autoBroadcastJoinThreshold would un-broadcast every later dim join)."""
    from storm_netmonitor_spark.operators.scale_probes import BLOOM_DEMO_CONFS

    before = {}
    for k in BLOOM_DEMO_CONFS:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    QUERIES["join_bloom_runtime"](spark, SF_CORRECT).collect()
    for k, want in before.items():
        try:
            got = spark.conf.get(k)
        except Exception:
            got = None
        assert got == want, f"{k} leaked: {want!r} -> {got!r}"
