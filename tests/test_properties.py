"""Property-based tests (hypothesis): invariants that example-based tests
can't pin — component resolution on arbitrary graphs, and the
partition-order independence the decimal-accumulation discipline exists
to guarantee (SURVEY §7.4.1).

Each example runs Spark jobs, so example counts are deliberately small;
deadline=None because JVM scheduling jitter would otherwise flake."""

from __future__ import annotations

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
