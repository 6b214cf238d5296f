"""Window functions (SURVEY §2.E).

Netmonitor anchor: THE core metric transformations — counter deltas → rates
(lag), cumulative bytes (running sum), smoothing (moving average), trailing
time-window rates (range frame), top-k talkers (ranked partitions).

Determinism rules applied throughout:
- Every window ORDER BY carries a unique tiebreaker (event_id / orderkey).
- Windowed double sums accumulate in DECIMAL (functions/stable): DuckDB's
  segment-tree window aggregation combines in a different order than
  Spark's incremental frames, so double accumulation would drift in ULPs.
- Range frames are expressed over epoch MICROSECONDS on both engines so
  the frame boundaries are integer-exact.

Scale: window shuffles partition on the key (user_id etc.); state per
partition is a sort buffer — spill-safe. No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import DEC, dround, ts_str, ts_str_sql
from ..io import load_table
from ..registry import query


@query(
    "win_topk_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — top-3 orders per customer (top-k talkers per host).
    row_number + filter; o_orderkey breaks price ties deterministically."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_family",
    oracle="""
SELECT
  c_custkey,
  c_mktsegment,
  RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
  NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
""",
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one partition spec (single shuffle +
    sort serves all three — Catalyst collapses same-spec windows)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_delta",
    oracle=f"""
SELECT
  user_id,
  event_id,
  {ts_str_sql('ts')} AS ts_s,
  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_value,
  CAST(
    epoch_us(CAST(ts AS TIMESTAMP))
    - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id)
  AS BIGINT) AS gap_us
FROM events
""",
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NM CORE — per-key delta between consecutive samples (counter→rate).
    value - lag(value) is one IEEE subtraction on identical doubles →
    bit-exact in both engines, no rounding needed."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        ts_str("ts").alias("ts_s"),
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "win_running_sum",
    oracle="""
SELECT
  user_id,
  event_id,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_value
FROM events
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative value per user (cumulative bytes per host). Decimal
    accumulation → exact prefix sums, identical in both engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT
  user_id,
  event_id,
  CAST(ROUND(
    CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
         / COUNT(value) OVER w AS DECIMAL(28,6)),
    6) AS DOUBLE) AS ma3
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
)
""",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sample moving average (rate smoothing): exact decimal frame sum /
    frame count, rounded in decimal space."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    ma = F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.round(ma.cast(DEC), 6).cast("double").alias("ma3"),
    )


@query(
    "win_range_frame",
    oracle="""
SELECT
  user_id,
  event_id,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS trailing_1h_value,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
  ) AS trailing_1h_events
FROM events
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour time-range frame (trailing-window rate). The frame
    is defined over epoch MICROSECONDS (integer) so Spark's rangeBetween
    and DuckDB's RANGE agree exactly; ties in the order key are fine for
    RANGE frames (peers share the frame)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


@query(
    "win_first_last",
    oracle=f"""
SELECT DISTINCT
  o_custkey,
  {ts_str_sql('FIRST_VALUE(o_orderdate) OVER w')} AS first_order_day,
  LAST_VALUE(o_orderkey) OVER w AS latest_orderkey,
  FIRST_VALUE(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value per partition with an explicit full frame (the
    default frame ends at CURRENT ROW — the classic last_value trap)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        ts_str(F.first("o_orderdate").over(w)).alias("first_order_day"),
        F.last("o_orderkey").over(w).alias("latest_orderkey"),
        F.first("o_totalprice").over(w).alias("first_price"),
    ).distinct()


@query(
    "win_distribution",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  CAST(ROUND(CAST(PERCENT_RANK() OVER w AS DECIMAL(28,6)), 6) AS DOUBLE) AS pr,
  CAST(ROUND(CAST(CUME_DIST() OVER w AS DECIMAL(28,6)), 6) AS DOUBLE) AS cd
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist per key
    (netmonitor: where does a sample sit in its host's distribution).
    Deterministic ordering via the (price, orderkey) tie-break; float
    ratios rounded decimal-stably on both sides."""
    from ..functions.stable import dround

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        dround(F.percent_rank().over(w)).alias("pr"),
        dround(F.cume_dist().over(w)).alias("cd"),
    )


@query(
    "win_scd2_history",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       event_type,
       {ts_str_sql('ts')} AS valid_from,
       {ts_str_sql('LEAD(ts) OVER w')} AS valid_to,
       (LEAD(ts) OVER w) IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from a change log (SURVEY
    §2.E addendum; the warehouse-history transform every netmonitor
    config store needs: device attribute changes → versioned validity
    intervals). Treats events as the per-user attribute stream
    (``event_type`` = the tracked attribute): consecutive duplicates
    collapse (a re-assertion of the same value is not a new version),
    then each surviving change opens an interval closed by the next
    change — ``valid_from``/``valid_to`` half-open, ``NULL`` valid_to =
    the current version, ``version`` = per-key change ordinal.

    Shape at scale: both window passes partition on ``user_id`` with the
    SAME (ts, event_id) sort, so Catalyst plans ONE exchange + sort and
    reuses it for the lag filter and the lead/row_number emit; state per
    key is a sort buffer — spill-safe, no driver participation. The
    deterministic (ts, event_id) tiebreak makes the history reproducible
    under any shuffle order."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "event_type",
        ts_str("ts").alias("valid_from"),
        ts_str(F.lead("ts").over(w)).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
