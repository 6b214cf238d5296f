"""Scalar functions: string / regex / date / math / array / map / json /
struct / cast (SURVEY §2.H).

Netmonitor anchor: parsing metric names (regex), bucketing samples by
interval (date fns), tag-map extraction (json), typed casts. All built-in
``pyspark.sql.functions`` — JVM-side, codegen'd, no UDFs.

Cross-engine discipline:
- regex patterns stay in the Java∩RE2 common subset (SURVEY §7.4.5);
- DuckDB CAST(double AS INT) rounds while Spark truncates → casts that
  matter are written explicitly (trunc/floor) on both sides;
- transcendentals (ln/exp/sqrt) round through decimal at 6 dp (libm ULP
  differences are ~1e-16 relative — far below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dround, dround_sql, ts_str, ts_str_sql
from ..io import load_table
from ..registry import query


@query(
    "fn_string",
    oracle="""
SELECT
  c_custkey,
  upper(c_mktsegment) AS seg_upper,
  lower(c_name) AS name_lower,
  trim(concat('  ', c_mktsegment, ' ')) AS seg_trimmed,
  substr(c_name, 10, 9) AS cust_num,
  length(c_name) AS name_len,
  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS id_padded,
  concat(c_mktsegment, '/', CAST(c_nationkey AS VARCHAR)) AS seg_nation
FROM customer
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substr/concat/length/lpad."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("id_padded"),
        F.concat_ws("/", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    )


@query(
    "fn_regexp",
    oracle="""
SELECT
  c_custkey,
  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS extracted_id,
  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
  regexp_matches(c_name, '^Customer#0*[0-9]+$') AS name_valid
FROM customer
""",
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / replace / match in the Java∩RE2 subset (character
    classes, anchors, groups — no lookaround). Netmonitor analog: parsing
    host/port/metric-name strings. NOTE: Spark regexp_replace replaces all
    matches by default; DuckDB needs the 'g' flag."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("extracted_id"),
        F.regexp_replace("c_name", r"[0-9]+", "#").alias("name_masked"),
        F.col("c_name").rlike(r"^Customer#0*[0-9]+$").alias("name_valid"),
    )


@query(
    "fn_split_explode",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
""",
)
def fn_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize documents → word rows → top-20 counts (the wordcount
    flagship shape; NORTH text analysis). Deterministic limit via
    (count desc, word) ordering."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@query(
    "fn_date",
    oracle=f"""
SELECT
  o_orderkey,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  {ts_str_sql("date_trunc('month', o_orderdate)")} AS month_start,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  {ts_str_sql("o_orderdate + INTERVAL 30 DAY")} AS due_date,
  dayofweek(o_orderdate) AS dow
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff/date_add/dayofweek (bucket samples by
    interval). Arg-order traps pinned: Spark datediff(end, start) ↔ DuckDB
    date_diff('day', start, end); Spark dayofweek is 1=Sunday ↔ DuckDB
    dayofweek is 0=Sunday → +1."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        ts_str(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        ts_str(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    )


@query(
    "fn_timestamp",
    oracle=f"""
SELECT
  event_id,
  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
  CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS epoch_us,
  hour(CAST(ts AS TIMESTAMP)) AS hr,
  minute(CAST(ts AS TIMESTAMP)) AS mi,
  {ts_str_sql("date_trunc('hour', CAST(ts AS TIMESTAMP))")} AS hour_bucket
FROM events
""",
)
def fn_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix epoch / hour / minute / hour-bucket on the event stream (UTC on
    both engines). epoch(): DuckDB returns fractional seconds → floor'd
    long on both sides via unix_timestamp (Spark already truncates)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.unix_micros("ts").alias("epoch_us"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        ts_str(F.date_trunc("hour", "ts")).alias("hour_bucket"),
    )


@query(
    "fn_math",
    oracle=f"""
SELECT
  l_orderkey,
  l_linenumber,
  abs(l_extendedprice - 50000) AS abs_dev,
  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
  {dround_sql('sqrt(l_extendedprice)')} AS price_sqrt,
  {dround_sql('ln(l_extendedprice)')} AS price_ln,
  {dround_sql('exp(l_discount)')} AS disc_exp,
  {dround_sql('l_quantity * l_quantity')} AS qty_sq,
  CAST(l_orderkey % 97 AS BIGINT) AS key_mod
FROM lineitem
WHERE l_linenumber = 1
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/exp/mod. pow(x,2) is written as x*x —
    exact multiply on both engines vs pow()'s libm wobble."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        dround(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        dround(F.log(F.col("l_extendedprice"))).alias("price_ln"),
        dround(F.exp("l_discount")).alias("disc_exp"),
        dround(F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT
  s_suppkey,
  coalesce(NULLIF(s_name, 'Supplier#000000000'), '<anonymous>') AS display_name,
  greatest(s_acctbal, 0.0) AS floor_bal,
  least(s_acctbal, 5000.0) AS capped_bal,
  CASE WHEN s_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing
FROM supplier
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least (raw doubles — exact)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("Supplier#000000000")), F.lit("<anonymous>")
        ).alias("display_name"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("floor_bal"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("capped_bal"),
        F.when(F.col("s_acctbal") < 0, "debt").otherwise("credit").alias("standing"),
    )


_MAX_DIM_SQL = "list_aggregate(embedding, 'max')"
_NORM_SQ_SQL = (
    "list_aggregate(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
)


@query(
    "fn_array",
    oracle=f"""
SELECT
  vec_id,
  len(embedding) AS n_dims,
  {dround_sql('embedding[1]')} AS first_dim,
  {dround_sql(_MAX_DIM_SQL)} AS max_dim,
  len(list_filter(embedding, x -> x > 0)) AS n_positive,
  {dround_sql(_NORM_SQ_SQL, 4)} AS norm_sq
FROM embeddings
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size/index/max + higher-order lambdas (transform/filter/
    aggregate) over the embedding vectors (NORTH: vector columns).
    Elementwise float ops are exact; the 64-term norm sum is rounded to 4
    (both engines sum doubles sequentially over the list)."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        dround(F.element_at("embedding", 1)).alias("first_dim"),
        dround(F.array_max("embedding")).alias("max_dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        dround(
            F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("norm_sq"),
    )


@query(
    "fn_json_map",
    oracle="""
SELECT
  CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_bucket,
  COUNT(*) AS n,
  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_min,
  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max
FROM events
GROUP BY 1
""",
)
def fn_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON tag-map extraction (netmonitor: metric tag maps): path extract
    → typed cast → bucket → aggregate."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select(k.alias("k"))
        .groupBy(F.expr("k div 10").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "fn_struct_nested",
    oracle="""
SELECT
  n_name AS nation,
  CAST(cnt AS BIGINT) AS n_suppliers,
  CAST(ROUND(total_bal, 2) AS DOUBLE) AS nation_balance
FROM (
  SELECT
    n_name,
    COUNT(*) AS cnt,
    SUM(CAST(s_acctbal AS DECIMAL(28,6))) AS total_bal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
""",
)
def fn_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct column, operate on its fields, flatten back out
    (NORTH: nested/multimodal column plumbing). The oracle sees only the
    flattened projection — struct round-tripping must be lossless."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    from ..functions.stable import dsum

    agg = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("s_acctbal").alias("total_bal"))
    )
    nested = agg.select(
        F.struct(
            F.col("n_name").alias("nation"),
            F.struct(
                F.col("cnt").alias("n_suppliers"), F.col("total_bal").alias("balance")
            ).alias("stats"),
        ).alias("payload")
    )
    return nested.select(
        F.col("payload.nation").alias("nation"),
        F.col("payload.stats.n_suppliers").alias("n_suppliers"),
        F.col("payload.stats.balance").alias("nation_balance"),
    )


@query(
    "fn_cast",
    oracle="""
SELECT
  o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
  CAST(trunc(o_totalprice) AS BIGINT) AS price_trunc,
  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
  CAST('1995-03-15 12:30:45' AS TIMESTAMP) = TIMESTAMP '1995-03-15 12:30:45' AS ts_parse_ok,
  CAST(o_orderstatus = 'F' AS INTEGER) AS is_final
FROM orders
""",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice: double→decimal(12,2), double→int (explicit trunc —
    DuckDB's bare cast ROUNDS while Spark truncates), int↔string,
    string→timestamp, bool→int. The decimal column is emitted as its
    string rendering ("123.40", trailing zero kept, identical in both
    engines): pandas materializes Spark decimals as Decimal objects but
    DuckDB decimals as float64, which the driver would hash differently."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
        F.col("o_totalprice").cast("long").alias("price_trunc"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        (
            F.lit("1995-03-15 12:30:45").cast("timestamp")
            == F.lit("1995-03-15 12:30:45").cast("timestamp")
        ).alias("ts_parse_ok"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT
  event_id,
  event_id & 255 AS low_byte,
  event_id | 15 AS or_mask,
  xor(event_id, 21845) AS xored,
  event_id << 2 AS shifted_l,
  event_id >> 3 AS shifted_r,
  ~event_id AS inverted
FROM events
WHERE event_id < 512
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (netmonitor: flag masks / subnet math on packed
    fields) — all JVM-side, codegen'd."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 512)
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(15)).alias("or_mask"),
        eid.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(eid, 2).alias("shifted_l"),
        F.shiftright(eid, 3).alias("shifted_r"),
        F.bitwise_not(eid).alias("inverted"),
    )


@query(
    "fn_interval",
    oracle=f"""
SELECT
  o_orderkey,
  {ts_str_sql("o_orderdate + INTERVAL 90 MINUTE")} AS plus_90m,
  {ts_str_sql("o_orderdate - INTERVAL 3 DAY")} AS minus_3d,
  CAST(ROUND(CAST(date_diff('second', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS DECIMAL(28,6)), 6) AS DOUBLE) AS secs_since_95,
  CAST(ROUND(CAST(12 * (year(o_orderdate) - 1995) + (month(o_orderdate) - 1) AS DECIMAL(28,6)), 6) AS DOUBLE) AS months_since_95
FROM orders
WHERE o_orderkey < 500
""",
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic on event time (netmonitor: shifting sample
    windows, ageing thresholds): timestamp ± INTERVAL, exact second
    differences, whole-month distance. month arithmetic is rendered as
    integer year/month math on BOTH sides — Spark's months_between and
    DuckDB's date_diff('month') disagree on partial months, so the oracle
    pins the unambiguous definition."""
    from ..functions.stable import dround

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        ts_str(F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTES")).alias("plus_90m"),
        ts_str(F.col("o_orderdate") - F.expr("INTERVAL 3 DAYS")).alias("minus_3d"),
        dround(
            F.unix_timestamp("o_orderdate")
            - F.unix_timestamp(F.lit("1995-01-01 00:00:00").cast("timestamp"))
        ).alias("secs_since_95"),
        dround(
            12 * (F.year("o_orderdate") - 1995) + (F.month("o_orderdate") - 1)
        ).alias("months_since_95"),
    )
