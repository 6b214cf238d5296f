"""Scale-behavior probes (VERDICT r5 #3): operators whose POINT is the
100 TB execution strategy, registered so the driver's correctness gate
pins them every round alongside the capability operators.

``join_skew_aqe`` demonstrates Spark's adaptive skew-join split on a
PLANTED skewed key — the runtime complement to the manually-salted
``join_salted_skew`` (aggregations.py): at cluster scale you prefer AQE
to detect and split the hot partition rather than salting every join by
hand. ``stress_scale_replicate`` runs the flagship pricing-summary
aggregation over a 10× synthetic replication of lineitem, pinning the
scaling-curve claim (docs/SCALING.md) to a driver-hash-checked query:
the replicated groups must aggregate to exactly 10× the row counts with
identical group keys at any SF.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dsum, dsum_sql
from ..io import load_table, scatter
from ..registry import query
from .scans import partitioned_events_path

#: Scoped AQE skew tuning for the planted-skew demo. Spark's defaults
#: (256 MB skewed-partition threshold, 64 MB advisory size) are sized for
#: cluster-scale shuffles; the testdata shuffle is a few MB, so the demo
#: scales the knobs down by the same ~1000× the data is scaled down.
#: DETECTION threshold stays at 64 KB (any partition past it is a split
#: candidate); the SPLIT advisory size is 256 KB — the hot partition
#: still splits at BOTH test scales (≥2 chunks needs advisory < the
#: ~1.3 MB sf0.01 hot partition; skew=true pinned in
#: tests/test_scale_probes.py) without drowning a local run in hundreds
#: of 64 KB reduce tasks (measured r11 at sf0.1: 1.53 → 1.35 s median).
#: These are SET-AND-RESTORED around the materialization inside the
#: operator — a session running 50 other queries must not inherit a
#: KB-scale advisory partition size.
SKEW_DEMO_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
}

def _skew_key():
    """3 of every 4 lineitem rows collapse onto skew key 0 (the "one hot
    device" shape of a netmonitor rollup); the rest spread over 1..999.
    Built lazily — Column construction needs an active session."""
    return F.when(F.col("l_orderkey") % 4 != 0, F.lit(0)).otherwise(
        F.col("l_orderkey") % 1000
    )


_SKEW_KEY_SQL = (
    "CASE WHEN l_orderkey % 4 <> 0 THEN 0 ELSE l_orderkey % 1000 END"
)


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Set runtime confs, restore (or unset) on exit — the demo's tuning
    must not leak into the rest of the session's queries."""
    prev: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def skew_demo_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy plan of the planted-skew join + rollup (shared by the
    operator and the plan test).

    Scale notes baked into the shape:
    - ``scatter(fact, 8)``: AQE splits a skewed REDUCE partition at map-
      output granularity — a single-row-group parquet scan yields ONE map
      task, which cannot be subdivided, so the demo (like any real
      multi-file scan) must arrive at the keyed exchange from multiple
      mappers. On a real corpus the scan is already parallel and this
      round-robin exchange moves nothing extra.
    - ``hint("merge")``: the dim is broadcast-sized here; at 100 TB both
      sides of a skewed join shuffle, which is the regime being
      demonstrated, so the broadcast shortcut is explicitly disabled.
    - payload columns ride the shuffle (price, discount): skew detection
      is BYTE-based; the realistic revenue payload is what makes the hot
      partition heavy.
    - the rollup groups by a DIFFERENT key (``grp``), so splitting the
      join's hot partition adds no extra exchange — the agg needed its
      own shuffle anyway.
    """
    li = load_table(spark, sf_dir, "lineitem")
    fact = scatter(
        li.select(
            _skew_key().alias("skew_key"), "l_extendedprice", "l_discount"
        ),
        8,
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("skew_key"), (F.col("id") % 7).alias("grp")
    )
    return (
        fact.hint("merge")
        .join(dim, "skew_key")
        .groupBy("grp")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "join_skew_aqe",
    oracle=f"""
SELECT d.grp,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_rows
FROM (SELECT {_SKEW_KEY_SQL} AS skew_key, l_extendedprice, l_discount
      FROM lineitem) f
JOIN (SELECT r AS skew_key, r % 7 AS grp FROM range(0, 1000) t(r)) d
  USING (skew_key)
GROUP BY d.grp
""",
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join demonstration on a planted hot key (VERDICT r5 #3).

    The skew tuning is scoped: the frame is MATERIALIZED (localCheckpoint)
    while the confs are active — AQE reads them at execution, so a lazy
    return would either leak the tuning into the whole session or lose it
    before the driver collects. The returned frame is the 7-row rollup.
    tests/test_plans.py asserts the executed plan actually shows
    ``SortMergeJoin(skew=true)`` — the demo is the PLAN, the hash oracle
    only proves the split changed no answer."""
    with scoped_confs(spark, SKEW_DEMO_CONFS):
        out = skew_demo_frame(spark, sf_dir).localCheckpoint()
    return out


@query(
    "join_dpp_prune",
    oracle=f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM events
WHERE day(CAST(ts AS DATE)) % 10 = 3
GROUP BY 1
""",
)
def join_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning probe: at 100 TB, "query only the
    partitions a dimension predicate selects" is the difference between
    scanning 3 directories and 3000 — and unlike the STATIC pruning of
    ``sink_parquet_partitioned`` (a literal date range, pruned at plan
    time), the interesting dates here are only known at RUNTIME, from a
    filtered dim. Catalyst plants a ``DynamicPruningSubquery`` on the
    fact scan's partition column, reusing the dim's broadcast: the
    executed plan's fact FileScan shows ``dynamicpruningexpression`` in
    PartitionFilters (asserted in tests/test_scale_probes.py), so only
    the 3 of 30 date directories the dim selects are ever listed/read.

    Fact: the date-partitioned events layout (staged once, shared with
    the sink op). Dim: distinct event dates with a selective predicate
    (day-of-month ≡ 3 mod 10) — derived from the source, as a real
    dimension table would be, so the set of surviving dates is a runtime
    artifact the planner cannot constant-fold."""
    from .scans import partitioned_events_frame

    fact = partitioned_events_frame(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
        .filter(F.dayofmonth("event_date") % 10 == 3)
    )
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy(
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


#: Synthetic replication factor for the stress probe.
STRESS_REPLICAS = 10


def replicate_rows(df: DataFrame, n: int, col: str = "replica") -> DataFrame:
    """Generic n× row replication as a codegen ``explode(sequence)`` —
    the kernel behind ``stress_scale_replicate``, reusable for synthetic
    scale-up of ANY frame (load testing, skew planting, oversampling).
    Row-local: no join, no shuffle; each input row emits ``n`` rows
    tagged 0..n-1 in ``col`` inside the scan's codegen span."""
    return df.withColumn(col, F.explode(F.sequence(F.lit(0), F.lit(n - 1))))


@query(
    "stress_scale_replicate",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql("l_quantity")} AS sum_qty,
       {dsum_sql("l_extendedprice")} AS sum_base_price,
       COUNT(*) AS n_rows
FROM lineitem CROSS JOIN range(0, {STRESS_REPLICAS})
GROUP BY l_returnflag, l_linestatus
""",
)
def stress_scale_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing rollup over a {STRESS_REPLICAS}× synthetic
    replication of lineitem — the scaling-curve claim as a hash-checked
    query: group keys identical, counts exactly 10× at every SF.

    Shape at scale: the replication is ``explode(sequence(0, 9))`` — a
    row-local Generate inside whole-stage codegen, never a join (a
    broadcast-nested-loop cross join computes the same rows 2.4× slower
    on the wide path; measured sf0.1). ``scatter`` first: the decimal
    partial aggregation over the 10×-fanned rows is the dominant cost,
    and the single-row-group testdata scan would otherwise pin all 6M
    rows to 3 tasks (measured 4.1 → 1.2 s at 32 cores; a real multi-file
    scan is already this parallel). The partial agg collapses the
    blow-up to one row per group per task before anything shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    return (
        replicate_rows(scatter(li), STRESS_REPLICAS)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


#: Scoped tuning for the runtime bloom-filter probe. The feature's
#: defaults are cluster-sized (application side must scan ≥ 10 GB before
#: Catalyst considers a bloom filter worth building), so the demo scales
#: the application-side floor down to testdata size — the same ~1000×
#: the data is scaled down. Broadcast is disabled for the probe join:
#: a broadcast-hash join already sees every dim key on every task, so
#: Catalyst (correctly) never injects a bloom filter under it; the
#: 100 TB regime being demonstrated is the one where BOTH sides shuffle.
BLOOM_DEMO_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_demo_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy plan of the bloom-pruned join + rollup (shared by the
    operator and the plan-assertion test): lineitem against a SELECTIVE
    part slice (p_size = 1 keeps ~2% of parts), revenue per brand.

    What Catalyst injects under BLOOM_DEMO_CONFS: the dim side's
    ``bloom_filter_agg(xxhash64(p_partkey))`` runs once, and the fact
    scan gains ``might_contain(...)`` BEFORE its shuffle — ~98% of
    lineitem rows are dropped at the map side instead of riding the
    exchange to die in the join. Row-level runtime semi-join reduction:
    the third member of the runtime-pruning family next to
    ``join_dpp_prune`` (partition-level, needs a partitioned layout) and
    ``join_skew_aqe`` (post-shuffle re-plan) — this one needs no layout
    at all, which at 100 TB is the difference between shuffling 100 TB
    and shuffling 2 TB when the dim predicate is selective."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    dim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select("p_partkey", "p_brand")
    )
    return (
        li.join(dim, li.l_partkey == dim.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "join_bloom_runtime",
    oracle=f"""
SELECT p_brand,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size = 1) p
  ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning on a selective dim slice.

    Scoped-conf protocol identical to ``join_skew_aqe``: the bloom
    injection happens at (re)planning, so the frame is MATERIALIZED
    (localCheckpoint) while the confs are active and the 25-row rollup
    is returned inert. tests/test_scale_probes.py asserts the executed
    plan carries ``might_contain`` on the fact side and a
    ``bloom_filter_agg`` build on the dim side — the demo is the PLAN;
    the hash oracle proves the pruning changed no answer."""
    with scoped_confs(spark, BLOOM_DEMO_CONFS):
        out = bloom_demo_frame(spark, sf_dir).localCheckpoint()
    return out
