"""Property-based tests (SURVEY §5.2 tier 5, hypothesis): algebraic
invariants that must hold for ANY input, on small generated frames.

Few examples per property (Spark jobs are expensive); the value is in the
generator finding shapes hand-written tests miss — empty frames, all-equal
keys, duplicate rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window, functions as F

rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-3, 3)), min_size=0, max_size=12
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data or [(0, 0)], "k int, v int").limit(
        len(data)
    )


@given(a=rows, b=rows)
@settings(**_SETTINGS)
def test_union_all_cardinality(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionByName(db).count() == len(a) + len(b)


@given(a=rows, b=rows)
@settings(**_SETTINGS)
def test_bag_partition_identity(spark, a, b):
    """Multiset identity: intersectAll(A,B) + exceptAll(A,B) == A."""
    da, db = _df(spark, a), _df(spark, b)
    n_inter = da.intersectAll(db).count()
    n_exc = da.exceptAll(db).count()
    assert n_inter + n_exc == len(a)


@given(a=rows)
@settings(**_SETTINGS)
def test_row_number_is_partition_permutation(spark, a):
    """row_number over any partition/order is exactly 1..n per key."""
    da = _df(spark, a)
    w = Window.partitionBy("k").orderBy("v", "k")
    rn = da.withColumn("rn", F.row_number().over(w))
    per_key = (
        rn.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rn").alias("lo"),
            F.max("rn").alias("hi"),
            F.countDistinct("rn").alias("d"),
        )
        .collect()
    )
    for r in per_key:
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n)


@given(a=rows)
@settings(**_SETTINGS)
def test_salted_agg_equals_direct(spark, a):
    """The salted two-phase aggregation shape is identity-preserving for
    exact types, whatever the data."""
    da = _df(spark, a)
    direct = {
        (r.k): (r.n, r.s)
        for r in da.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = (
        da.withColumn("salt", F.pmod(F.col("v"), F.lit(4)))
        .groupBy("k", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps"))
        .groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
    )
    assert {(r.k): (r.n, r.s) for r in salted.collect()} == direct
