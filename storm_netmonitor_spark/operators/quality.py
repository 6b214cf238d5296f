"""Data-quality and privacy-audit operators (round-6 additions): the
expectation-gate and re-identification-risk capability classes a
production pipeline runs BEFORE publishing a table (Deequ / Great
Expectations / dbt-test analog, re-expressed as one-pass Spark aggs).

Registered LAST (operators/__init__ note): new modules must not displace
operators still awaiting a driver verdict from the capped check window.

Reference citations: /root/reference is empty this round (SURVEY §0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import query

#: expectations evaluated against orders — each is (name, violation
#: predicate rendered in both engines). Constants chosen so the testdata
#: exercises BOTH pass and fail outcomes at every SF.
_EXP_PRICE_MAX = 300_000.0
_EXP_STATUSES = ("O", "F", "P")


@query(
    "pipeline_expectations_gate",
    oracle=f"""
WITH stats AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_custkey,
    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey,
    CAST(COUNT(CASE WHEN o_totalprice <= 0.0
                      OR o_totalprice > {_EXP_PRICE_MAX!r} THEN 1 END)
         AS BIGINT) AS price_out_of_range,
    CAST(COUNT(CASE WHEN o_orderstatus NOT IN
                    {_EXP_STATUSES!r} THEN 1 END)
         AS BIGINT) AS bad_status,
    CAST(COUNT(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                      OR o_orderdate >= TIMESTAMP '2030-01-01' THEN 1 END)
         AS BIGINT) AS date_out_of_range
  FROM orders
)
SELECT exp.name AS expectation, exp.v AS n_violations, stats.n_rows AS n_checked,
       exp.v = 0 AS passed
FROM stats, LATERAL (VALUES
  ('not_null:o_custkey', null_custkey),
  ('unique:o_orderkey', dup_orderkey),
  ('range:o_totalprice', price_out_of_range),
  ('in_set:o_orderstatus', bad_status),
  ('range:o_orderdate', date_out_of_range)
) AS exp(name, v)
""",
)
def pipeline_expectations_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation gate over ``orders`` (the publish-time
    contract check every production pipeline runs — Deequ / Great
    Expectations class): not-null, uniqueness, numeric range,
    set-membership, and date-sanity expectations evaluated in ONE pass
    and emitted as a violations report, one row per expectation.

    Spark-first shape: the four row-local checks are conditional
    aggregates in one map-side-partial hash-agg; the exact-uniqueness
    check (count − count(DISTINCT)) makes Catalyst split a SECOND
    column-pruned scan for the distinct branch — measured and kept,
    because the alternative single-scan shape (pre-agg on o_orderkey)
    would shuffle the whole near-unique key column, and at 100 TB two
    pruned scans beat one full-table exchange. The report pivot is a
    literal ``stack`` on the 1-row result."""
    o = load_table(spark, sf_dir, "orders")
    st = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "dup_orderkey"
        ),
        F.count(
            F.when(
                (F.col("o_totalprice") <= 0.0)
                | (F.col("o_totalprice") > _EXP_PRICE_MAX),
                1,
            )
        ).alias("price_out_of_range"),
        F.count(
            F.when(~F.col("o_orderstatus").isin(*_EXP_STATUSES), 1)
        ).alias("bad_status"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2030-01-01").cast("timestamp")
                ),
                1,
            )
        ).alias("date_out_of_range"),
    )
    return st.select(
        F.expr(
            "stack(5,"
            " 'not_null:o_custkey', null_custkey,"
            " 'unique:o_orderkey', dup_orderkey,"
            " 'range:o_totalprice', price_out_of_range,"
            " 'in_set:o_orderstatus', bad_status,"
            " 'range:o_orderdate', date_out_of_range)"
        ).alias("expectation", "n_violations"),
        F.col("n_rows").alias("n_checked"),
    ).withColumn("passed", F.col("n_violations") == 0)


#: k-anonymity threshold: a quasi-identifier group smaller than K is a
#: re-identification risk.
_KANON_K = 5


@query(
    "agg_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(COUNT(CASE WHEN grp_n < {_KANON_K} THEN 1 END) AS BIGINT)
    AS groups_below_k,
  CAST(COALESCE(SUM(CASE WHEN grp_n < {_KANON_K} THEN grp_n END), 0)
    AS BIGINT) AS rows_at_risk,
  CAST(MIN(grp_n) AS BIGINT) AS min_group_size,
  CAST(SUM(grp_n) AS BIGINT) AS n_rows
FROM qi
""",
)
def agg_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (c_nationkey, c_mktsegment)
    quasi-identifier (the privacy census run before a table is shared:
    any QI group smaller than k={_KANON_K} re-identifies its members).
    Reports group census, at-risk groups/rows, and the table's actual k
    (min group size). Two hash-aggs back to back — the QI census
    partial-aggregates map-side, the summary folds the O(|QI-space|)
    frame; integer-only outputs, no float discipline needed."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_n")
    )
    below = F.col("grp_n") < _KANON_K
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(below, 1)).alias("groups_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("grp_n"))), F.lit(0)).alias(
            "rows_at_risk"
        ),
        F.min("grp_n").alias("min_group_size"),
        F.sum("grp_n").alias("n_rows"),
    )
