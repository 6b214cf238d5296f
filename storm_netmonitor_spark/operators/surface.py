"""Round-2 SQL-surface extensions: ORC format, URL functions, VARIANT
semi-structured type, data masking, error-safe arithmetic, regression
aggregates, and mergeable HLL sketches.

Registered AFTER ``tpch`` (see operators/__init__ note): new modules must
not displace operators still awaiting a driver verdict from the capped
per-round check window.

Reference citations: /root/reference is empty this round (SURVEY §0.1);
anchors below cite the driver's north-star contract [L BASELINE.json:6]
and the public Storm metrics model instead (SURVEY §0.3).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dround, dround_sql, dsum, dsum_sql, sketch_ok
from ..io import load_table
from ..registry import query

# ---------------------------------------------------------------------------
# ORC source/sink roundtrip (completes the columnar-format matrix next to
# parquet — SURVEY §2.A; NM: archival exports from other Hadoop tooling)
# ---------------------------------------------------------------------------

_ORC_CACHE: dict[str, str] = {}


@query(
    "source_orc_roundtrip",
    oracle=f"""
SELECT event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
GROUP BY event_type
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read-back (NM: ingest archives written by Hive-era
    tooling): events staged once as ORC, read back and aggregated;
    hash-matched against the parquet batch oracle, proving value fidelity
    through the second columnar format. ORC is a native vectorized Spark
    source — the read-back plan still shows pushed filters and a pruned
    ReadSchema, so the 100 TB scan properties survive the format swap.
    The timestamp column is excluded from the staged projection (ORC
    stores session-local timestamps; the CSV source operator covers
    timestamp round-trip)."""
    key = os.path.abspath(sf_dir)
    if key not in _ORC_CACHE:
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value", "user_id"
        )
        d = tempfile.mkdtemp(prefix="nm_orc_")
        path = os.path.join(d, "events_orc")
        e.write.mode("overwrite").orc(path)
        _ORC_CACHE[key] = path
    back = spark.read.orc(_ORC_CACHE[key])
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
        F.sum("event_id").alias("sum_ids"),
        F.sum("user_id").alias("sum_users"),
    )


# ---------------------------------------------------------------------------
# URL parsing (NM: collectors report REST endpoints / scrape targets;
# NORTH: URL handling is the first step of every web-corpus pipeline)
# ---------------------------------------------------------------------------


@query(
    "fn_url",
    oracle="""
WITH urls AS (
  SELECT 'https://metrics.example.com/' || event_type || '/report?user='
         || user_id || '&seq=' || (event_id % 100) AS url,
         event_id, user_id
  FROM events
)
SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       COUNT(*) AS n_urls,
       CAST(SUM(CAST(regexp_extract(url, 'user=([0-9]+)', 1) AS BIGINT)) AS BIGINT)
         AS sum_user_param,
       CAST(SUM(CAST(regexp_extract(url, 'seq=([0-9]+)', 1) AS BIGINT)) AS BIGINT)
         AS sum_seq_param
FROM urls
GROUP BY host, path
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the built-in ``parse_url`` (JVM-side,
    codegen'd — NOT a Python UDF): deterministic URLs are synthesized from
    event columns, then HOST / PATH / per-key QUERY params are extracted
    and aggregated. The oracle re-derives the same parts with regexes —
    cross-checking Spark's java.net.URI-based parser against a plain
    grammar. Row-local until the final small group-by: at 100 TB this is
    a map-only stage feeding a vocabulary-sized shuffle."""
    e = load_table(spark, sf_dir, "events")
    urls = e.select(
        F.concat(
            F.lit("https://metrics.example.com/"),
            F.col("event_type"),
            F.lit("/report?user="),
            F.col("user_id"),
            F.lit("&seq="),
            F.col("event_id") % 100,
        ).alias("url")
    )
    parsed = urls.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("user"))
        .cast("bigint")
        .alias("user_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("seq"))
        .cast("bigint")
        .alias("seq_param"),
    )
    return parsed.groupBy("host", "path").agg(
        F.count("*").alias("n_urls"),
        F.sum("user_param").alias("sum_user_param"),
        F.sum("seq_param").alias("sum_seq_param"),
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured type (Spark 4; NM: schemaless metric payloads —
# the props JSON column IS the netmonitor DataPoint value blob)
# ---------------------------------------------------------------------------


@query(
    "fn_variant",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                       THEN 1 END) AS BIGINT) AS n_big_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4 ``parse_json`` +
    ``variant_get``): the events ``props`` JSON blob is parsed ONCE into a
    binary variant, then typed fields are extracted with JSON-path
    accessors — the open-schema payload model (a netmonitor DataPoint's
    value map) without a fixed struct schema up front. Missing-path
    extraction must yield NULL, not error. The oracle uses DuckDB's JSON
    extraction over the same blob. Variant decode is row-local JVM work;
    the only shuffle is the final vocabulary-sized group-by."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.missing', 'string')").alias("missing"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.count(F.when(F.col("k") > 50, 1)).alias("n_big_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias("n_missing"),
    )


# ---------------------------------------------------------------------------
# Data masking (NORTH: PII hygiene sibling of text_pii_redact, but on the
# relational path — mask identifiers before exporting metric extracts)
# ---------------------------------------------------------------------------


@query(
    "fn_mask",
    oracle="""
SELECT regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_name,
       regexp_replace(regexp_replace(regexp_replace(
         c_mktsegment, '[A-Z]', '#', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '*', 'g')
         AS masked_segment,
       COUNT(*) AS n_customers
FROM customer
GROUP BY masked_name, masked_segment
""",
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data masking with the built-in ``mask`` function
    (upper→X, lower→x, digit→n, plus a custom-alphabet variant): collapses
    every customer name to its shape pattern, so the masked export leaks
    format but no identity. The oracle reproduces the masking with regex
    chains. Row-local codegen'd work; the group-by output is the tiny set
    of distinct shape patterns — this is also a practical profiling trick
    (pattern histograms) at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    masked = c.select(
        F.mask("c_name").alias("masked_name"),
        F.mask(
            "c_mktsegment",
            F.lit("#"),  # upper-case replacement
            F.lit("x"),  # lower-case replacement
            F.lit("*"),  # digit replacement
        ).alias("masked_segment"),
    )
    return masked.groupBy("masked_name", "masked_segment").agg(
        F.count("*").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Error-safe arithmetic (NM: garbled counter samples must not kill the
# pipeline — NULL-on-error beats job-abort at 100 TB)
# ---------------------------------------------------------------------------


@query(
    "fn_try_arith",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN (o_orderkey % 7) = 0 THEN NULL
                     ELSE CAST(FLOOR(o_totalprice) AS BIGINT) // (o_orderkey % 7)
                END) AS BIGINT) AS sum_safe_div,
       CAST(COUNT(CASE WHEN (o_orderkey % 7) = 0 THEN 1 END) AS BIGINT)
         AS n_div_zero,
       CAST(SUM(TRY_CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS BIGINT))
         AS BIGINT) AS sum_prio_num,
       CAST(SUM(CASE WHEN TRY_CAST(o_orderstatus AS BIGINT) IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_uncastable
FROM orders
GROUP BY o_orderpriority
""",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: ``try_divide`` (NULL on /0 instead
    of error/Inf), ``try_cast`` (NULL on malformed instead of abort) —
    the ANSI-mode-safe operators a 100 TB job needs so one garbled row
    degrades to NULL instead of failing the stage. Integer division is
    rendered via floor() to match the oracle's `//`; try_divide's
    floating division on integer inputs is exact for these magnitudes.
    All row-local, one small group-by."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderpriority",
        F.floor(
            F.try_divide(F.floor("o_totalprice"), F.col("o_orderkey") % 7)
        ).alias("safe_div"),
        (F.col("o_orderkey") % 7 == 0).alias("was_zero"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1)
        .try_cast("bigint")
        .alias("prio_num"),
        F.col("o_orderstatus").try_cast("bigint").isNull().alias("uncastable"),
    )
    return t.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("safe_div").alias("sum_safe_div"),
        F.count(F.when(F.col("was_zero"), 1)).alias("n_div_zero"),
        F.sum("prio_num").alias("sum_prio_num"),
        F.sum(F.when(F.col("uncastable"), 1).otherwise(0)).alias("n_uncastable"),
    )


# ---------------------------------------------------------------------------
# Regression aggregates (NM: trend of a counter over time = the rate the
# monitor alerts on; slope/intercept/correlation per metric class)
# ---------------------------------------------------------------------------

_DEC = "decimal(28,6)"
_DEC_SQL = "DECIMAL(28,6)"


@query(
    "agg_linreg",
    oracle=f"""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(CAST(user_id AS DOUBLE) AS {_DEC_SQL})) AS DOUBLE) AS sx,
         CAST(SUM(CAST(CAST(value   AS DOUBLE) AS {_DEC_SQL})) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(user_id AS DOUBLE) * CAST(value AS DOUBLE)
                       AS {_DEC_SQL})) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)
                       AS {_DEC_SQL})) AS DOUBLE) AS sxx
  FROM events GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       {dround_sql('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 8)} AS slope,
       {dround_sql('(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n', 6)}
         AS intercept
FROM s
""",
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares regression of value on user_id per event type —
    the analytic shape behind 'is this counter trending up'. Built from
    EXACT DECIMAL moment sums (Sx, Sy, Sxy, Sxx) rather than the engine's
    ``regr_slope``: the native regression aggregates accumulate doubles in
    shuffle-merge order and differ across engines in final ULPs (SURVEY
    §7.4.1), while decimal moments are order-independent and the final
    slope/intercept arithmetic is then identical IEEE math on identical
    inputs. One partial-aggregated shuffle, vocabulary-sized output —
    exactly the plan a 100 TB trend scan needs."""
    e = load_table(spark, sf_dir, "events")
    x = F.col("user_id").cast("double")
    y = F.col("value").cast("double")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x.cast(_DEC)).cast("double").alias("sx"),
        F.sum(y.cast(_DEC)).cast("double").alias("sy"),
        F.sum((x * y).cast(_DEC)).cast("double").alias("sxy"),
        F.sum((x * x).cast(_DEC)).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return s.select(
        "event_type",
        F.col("n"),
        dround(slope, 8).alias("slope"),
        dround(intercept, 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketches (NM core: distinct talkers per window at 100 TB —
# the sketch merges across partitions AND across time windows, so daily
# sketches roll up to monthly without re-scanning)
# ---------------------------------------------------------------------------


def hll_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw DataSketches-HLL rollup (the production operator): one sketch
    per event-day via ``hll_sketch_agg``, per-day estimates, plus a
    ``__ALL__`` row whose estimate comes from ``hll_union_agg`` over the
    daily sketches — no raw-row re-scan. Estimates are implementation-
    defined, so the registered QUERY wraps this in a deterministic bounds
    frame the DuckDB oracle can hash."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"),
        F.count("*").alias("n_events"),
    )
    per_day = daily.select(
        F.col("event_date").cast("string").alias("event_date"),
        "n_events",
        F.hll_sketch_estimate("sketch").alias("distinct_users_est"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False))).alias(
            "distinct_users_est"
        ),
        F.sum("n_events").alias("n_events"),
    ).select(
        F.lit("__ALL__").alias("event_date"),
        "n_events",
        "distinct_users_est",
    )
    return per_day.unionByName(merged)


@query(
    "agg_sketch_hll",
    # Deterministic bounds frame (VERDICT r4 #5 — upgraded from rows-only):
    # exact per-day + global distincts computed independently by both
    # engines; the boolean pins every DataSketches estimate (including the
    # union-merged __ALL__ row — the mergeability that is the entire
    # 100 TB point) within max(2, 5%) of exact. The semantic unit test
    # keeps the stricter merged-equals-direct assertion.
    oracle="""
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE)::VARCHAR AS event_date,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       TRUE AS est_ok
FROM events
GROUP BY 1
UNION ALL
SELECT '__ALL__', COUNT(*), COUNT(DISTINCT user_id), TRUE FROM events
""",
)
def agg_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's ``hll_sketch_agg`` / ``hll_union_agg``), verified against the
    exact counts: per-day rows plus the union-merged ``__ALL__`` row, each
    with the exact distinct and ``est_ok`` = estimate within max(2, 5%).
    The raw-estimate path (what production runs — pre-aggregated daily
    sketches roll up to arbitrary ranges with no re-scan, which exact
    ``agg_count_distinct`` cannot do) is ``hll_sketch_estimates``; this
    query joins it to the exact twin so the driver hash-checks the sketch
    machinery end-to-end."""
    est = hll_sketch_estimates(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    exact_day = e.groupBy(F.to_date("ts").cast("string").alias("event_date")).agg(
        F.countDistinct("user_id").alias("n_users")
    )
    exact_all = e.agg(F.countDistinct("user_id").alias("n_users")).select(
        F.lit("__ALL__").alias("event_date"), "n_users"
    )
    exact = exact_day.unionByName(exact_all)
    ok = sketch_ok("distinct_users_est", "n_users")
    return (
        est.join(F.broadcast(exact), "event_date")
        .select("event_date", "n_events", "n_users", ok.alias("est_ok"))
    )


# ---------------------------------------------------------------------------
# Null-aware anti join (the NOT IN trap: SQL's three-valued logic makes
# NOT IN vs a nullable subquery a DIFFERENT operator from NOT EXISTS)
# ---------------------------------------------------------------------------


@query(
    "join_anti_null_aware",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def join_anti_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN anti join (NM: hosts that never reported an urgent-class
    sample): unlike NOT EXISTS (plain left-anti, see join_anti), NOT IN
    must honor three-valued logic — one NULL in the subquery empties the
    result — so Catalyst plans a NULL-AWARE anti join. With a broadcast-
    able single-column build side Spark uses the optimized
    BroadcastHashJoin(NAAJ) form, not a nested loop: the 100 TB-safe
    shape. Expressed via spark.sql so the planner sees the NOT IN
    construct itself."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("nm_naaj_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("nm_naaj_ord")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers,
               SUM(c_custkey) AS sum_keys
        FROM nm_naaj_cust
        WHERE c_custkey NOT IN (SELECT o_custkey FROM nm_naaj_ord
                                WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# Extended string functions (NM: component/host-name munging surface)
# ---------------------------------------------------------------------------


@query(
    "fn_string_distance",
    oracle="""
SELECT event_type,
       levenshtein(event_type, 'click') AS dist_click,
       levenshtein(event_type, reverse(event_type)) AS dist_palindrome,
       translate(event_type, 'aeiou', '*****') AS devoweled,
       repeat(substr(event_type, 1, 2), 3) AS stutter,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance and string-shaping surface: ``levenshtein`` (exact
    dynamic-programming edit distance — both engines implement the same
    well-defined function, so integer outputs match), ``translate``,
    ``repeat`` — the fuzzy-matching toolkit for reconciling near-identical
    host/component names. All row-local codegen'd JVM work collapsed to a
    vocabulary-sized group-by."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count("*").alias("n_events")).select(
        "event_type",
        F.levenshtein("event_type", F.lit("click")).alias("dist_click"),
        F.levenshtein("event_type", F.reverse("event_type")).alias(
            "dist_palindrome"
        ),
        F.translate("event_type", "aeiou", "*****").alias("devoweled"),
        F.repeat(F.substring("event_type", 1, 2), 3).alias("stutter"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Boolean / conditional aggregates (NM: fleet-wide health predicates —
# "did EVERY host stay under threshold", "did ANY host spike")
# ---------------------------------------------------------------------------


@query(
    "agg_bool_countif",
    oracle="""
SELECT event_type,
       CAST(COUNT(CASE WHEN value > 500 THEN 1 END) AS BIGINT) AS n_over_500,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 990) AS any_spike,
       CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_even_users
FROM events
GROUP BY event_type
""",
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: ``count_if`` plus ``bool_and`` /
    ``bool_or`` (SQL: EVERY / ANY) — the alerting predicates a monitor
    evaluates per metric class ("all samples in range?", "any spike?").
    All partial-aggregable: each reduces map-side to (count, bool, bool)
    per group, so the shuffle carries three scalars per key regardless of
    input size."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 500).alias("n_over_500"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 990).alias("any_spike"),
        F.count_if(F.col("user_id") % 2 == 0).alias("n_even_users"),
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy matching (entity resolution: reconcile near-identical names
# without the all-pairs distance matrix)
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 3


@query(
    "join_fuzzy_blocked",
    oracle=f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts,
         split_part(p_name, ' ', 2) AS block
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       a.n_parts AS n_a, b.n_parts AS n_b
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by BLOCKED fuzzy matching (NM: reconciling
    near-identical host/device names across inventories — 'web-01.prod'
    vs 'web01.prod'): name pairs within edit distance 3, candidates
    generated ONLY inside a blocking key (here the name's last token).
    The two scale rules that make this shape survive 100 TB: (1) reduce
    to the DISTINCT name vocabulary (with multiplicities) BEFORE any
    pairing — distances are a property of the vocabulary, not the fact
    rows; (2) the quadratic distance work is confined to equi-join
    blocks, never an all-pairs cross join (the same blocked-self-join
    discipline as text_ngram_jaccard, whose NGRAM_DF_CAP analog here is
    the block-size bound a production blocklist would add). Levenshtein
    is exact integer edit distance in both engines (the fn_string_distance
    equivalence)."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("block", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    return fuzzy_pairs_over(names)


def fuzzy_pairs_over(names: DataFrame, max_dist: int = _FUZZY_MAX_DIST) -> DataFrame:
    """Blocked fuzzy-pair kernel over a name-vocabulary frame ``(p_name,
    n_parts, block)``: distinct name pairs within edit distance
    ``max_dist`` whose blocking keys match. Factored out of
    ``join_fuzzy_blocked`` so the property suite can drive it with
    arbitrary vocabularies against a brute-force all-pairs reference."""
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        F.col("block").alias("block_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        F.col("block").alias("block_b"),
    )
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )
