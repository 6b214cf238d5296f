"""Projections, filters, predicates (SURVEY §2.B).

Netmonitor anchor: selecting/deriving sample fields and windowing them by
value/time predicates before aggregation. All expressions stay inside
whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dround, dround_sql
from ..io import load_table
from ..registry import query


@query(
    "project_alias",
    oracle="""
SELECT c_custkey AS id, c_mktsegment AS segment, c_name AS customer_name
FROM customer
""",
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + rename + reorder."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("customer_name"),
    )


@query(
    "project_computed",
    oracle=f"""
SELECT
  l_orderkey,
  l_linenumber,
  {dround_sql('l_extendedprice * (1 - l_discount)')} AS net_price,
  CASE
    WHEN l_quantity >= 40 THEN 'BULK'
    WHEN l_quantity >= 15 THEN 'MEDIUM'
    ELSE 'SMALL'
  END AS qty_class,
  l_linenumber % 2 = 0 AS even_line
FROM lineitem
""",
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + CASE WHEN derived columns (netmonitor: derive normalized
    rate / traffic-class fields per sample). Row-level double arithmetic is
    identical IEEE on identical inputs → only the final value is rounded."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.when(F.col("l_quantity") >= 40, "BULK")
        .when(F.col("l_quantity") >= 15, "MEDIUM")
        .otherwise("SMALL")
        .alias("qty_class"),
        (F.col("l_linenumber") % 2 == 0).alias("even_line"),
    )


@query(
    "filter_compare",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 150000
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
""",
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<, >, BETWEEN on numbers and timestamps (netmonitor: sample-window
    selection by time range and value band)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000, 150000)
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice")


@query(
    "filter_in_like",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_type IN ('PROMO', 'ECONOMY') AND p_name LIKE '%bolt%'
""",
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE pattern filters."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").isin("PROMO", "ECONOMY") & F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "filter_null_3vl",
    oracle="""
WITH t AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null, o_totalprice
  FROM orders
)
SELECT
  COUNT(*) AS n_total,
  COUNT(status_or_null) AS n_not_null,
  COUNT(CASE WHEN status_or_null IS NULL THEN 1 END) AS n_null,
  COUNT(CASE WHEN status_or_null = 'F' THEN 1 END) AS n_f,
  COUNT(CASE WHEN status_or_null IS NOT DISTINCT FROM NULL THEN 1 END) AS n_nullsafe_null
FROM t
""",
)
def filter_null_3vl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / three-valued logic / null-safe equality. The testdata has
    no NULLs, so they are manufactured with NULLIF — the 3VL behavior under
    test is engine semantics, not data."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("status_or_null").alias("n_not_null"),
        F.count(F.when(F.col("status_or_null").isNull(), 1)).alias("n_null"),
        F.count(F.when(F.col("status_or_null") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("status_or_null").eqNullSafe(F.lit(None).cast("string")), 1)).alias(
            "n_nullsafe_null"
        ),
    )


@query(
    "filter_bool",
    oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE (l_returnflag = 'R' OR l_linestatus = 'O')
  AND NOT (l_discount > 0.08)
  AND l_quantity > 48
""",
)
def filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "O"))
        & ~(F.col("l_discount") > 0.08)
        & (F.col("l_quantity") > 48)
    ).select("l_orderkey", "l_linenumber")
