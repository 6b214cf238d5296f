"""Sorts, limits, top-k (SURVEY §2.F).

Netmonitor anchor: top-k heavy hitters (the hosts/flows moving the most
bytes). Global top-k compiles to TakeOrderedAndProject — per-partition heap
+ driver merge, no full sort: exactly the 100 TB-safe shape.

Determinism: every ORDER BY ... LIMIT carries a unique tiebreaker column so
both engines pick the same rows (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import query


@query(
    "sort_multicol",
    oracle="""
SELECT c_custkey, c_mktsegment, NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null, c_acctbal
FROM customer
ORDER BY seg_or_null NULLS FIRST, c_acctbal DESC, c_custkey
""",
)
def sort_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS FIRST (nulls manufactured via NULLIF).
    The driver hash is order-insensitive, so the sort keys are part of the
    output; total order is pinned by the unique c_custkey tiebreaker."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        "c_acctbal",
    ).orderBy(
        F.col("seg_or_null").asc_nulls_first(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )


@query(
    "limit_global_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def limit_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 orders by price — TakeOrderedAndProject (heap per
    partition, merge of k·p candidates at the driver; never a full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )
