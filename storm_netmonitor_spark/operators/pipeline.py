"""Training-data pipeline composition operators (SURVEY §2.K/§2.L
extensions): reshaping (pivot/unpivot), deterministic sampling and
splitting, sequence packing, batch sessionization, and an end-to-end
pretraining-corpus assembly pipeline.

These are the stages a large-scale LLM data pipeline runs BETWEEN the
dedup/quality operators (operators/text.py) and the trainer: carve
train/val/test splits, draw stratified samples, pack documents into
token-budget bins, and reshape fact tables for reporting. Everything is
deterministic (content hashes, not RNG) so reruns are reproducible and
each operator hash-matches a DuckDB oracle.

Scale notes (100 TB):
- splits/samples hash each row independently (embarrassingly parallel,
  no shuffle beyond the final aggregate);
- sequence packing is a per-partition running total — one window shuffle
  on the stratum key, state O(1) per row;
- the pivot has a fixed, explicit column list (no driver-side distinct
  scan to discover pivot values — REQUIRED at scale);
- the corpus pipeline composes scan → hash-dedup → filter → split in one
  declarative plan: Catalyst fuses the filters into the scan and the
  single wide shuffle is the dedup groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import davg, davg_sql, dsum_sql, ts_str, ts_str_sql
from ..io import load_table
from ..registry import query

#: Fixed pivot column list — discovering pivot values with a distinct scan
#: is a 100 TB anti-pattern (extra pass + nondeterministic column order).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

def _pivot_cols_sql() -> str:
    parts = []
    for t in EVENT_TYPES:
        cond = f"CASE WHEN event_type = '{t}' THEN value ELSE 0 END"
        parts.append(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}")
        parts.append(f"{dsum_sql(cond)} AS val_{t}")
    return ",\n  ".join(parts)


_PIVOT_COLS_SQL = _pivot_cols_sql()


@query(
    "pivot_events_wide",
    oracle=f"""
SELECT
  CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
  {_PIVOT_COLS_SQL}
FROM events
GROUP BY 1
""",
)
def pivot_events_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-day counters per event type as columns (the
    netmonitor "one column per metric" report shape). Explicit value list
    → single-pass, map-side-combinable aggregation."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.select(F.col("ts").cast("date").cast("string").alias("event_date"),
                 "event_type", "value")
        .groupBy("event_date")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("double").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("val"),
        )
    )
    # Spark names pivot output <value>_<agg-alias>; align to the oracle's
    # n_<type>/val_<type> and make counts 0 (not NULL) for absent cells to
    # match the oracle's COUNT(CASE ...) = 0 rendering
    cols = [F.col("event_date")]
    for t in EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}"))
        cols.append(F.coalesce(F.col(f"{t}_val"), F.lit(0.0)).alias(f"val_{t}"))
    return out.select(*cols)


@query(
    "unpivot_lineitem_long",
    oracle="""
SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS metric_value
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount
FROM lineitem WHERE l_orderkey < 100
""",
)
def unpivot_lineitem_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): one (metric, value) row per measure —
    the shape metric stores and plotting layers want. DataFrame.unpivot
    is a map-side expansion, no shuffle."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    ).withColumn(
        "metric", F.expr("substring(metric, 3)")  # l_quantity → quantity
    )


#: md5-hex first character → split. 12/16 = 75% train, 2/16 val, 2/16 test.
#: Content-hash splitting is the reproducible, join-free way to carve
#: train/val/test at 100 TB: no RNG state, no seed coordination across
#: executors, stable under reruns and repartitioning.
_SPLIT_SQL = """CASE
  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
  ELSE 'test' END"""


def _split_col() -> F.Column:
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        F.when(h.between("0", "b"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    )


@query(
    "sample_split_hash",
    oracle=f"""
SELECT doc_id, lang, {_SPLIT_SQL} AS split
FROM documents
""",
)
def sample_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-hash bucket
    (md5 of the stable doc id) — row-local, no shuffle, reproducible."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", _split_col().alias("split"))


@query(
    "sample_stratified_topk",
    oracle="""
SELECT doc_id, lang, rk
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 20
""",
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: 20 docs per language, chosen by
    md5 rank (a seedless uniform draw). One window shuffle on the stratum
    key; at 100 TB strata are processed partition-parallel."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
    )


#: Characters per packed sequence bin (stand-in for the token budget of a
#: training context window; the BPE-ish token count would multiply by a
#: constant factor).
PACK_BUDGET_CHARS = 4096


@query(
    "pack_sequences",
    oracle=f"""
SELECT doc_id, lang,
       CAST((running - n_chars) // {PACK_BUDGET_CHARS} AS BIGINT) AS bin_id
FROM (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS running
  FROM documents
)
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in stable doc_id order, per
    language) to fixed-budget bins by running character total — the
    contiguous-packing pass that turns a corpus into training batches.
    A bin is the budget-quotient of the doc's START offset, so every doc
    lands in exactly one bin deterministically. One window shuffle; the
    running sum is O(1) state per row."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("doc_id", "lang", "n_chars")
        .withColumn("running", F.sum("n_chars").over(w))
        # integer `div`, not float division: running totals at corpus scale
        # exceed double's 53-bit mantissa
        .withColumn("bin_id", F.expr(f"(running - n_chars) div {PACK_BUDGET_CHARS}"))
        .select("doc_id", "lang", "bin_id")
    )


@query(
    "win_sessionize_batch",
    oracle=f"""
WITH t AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
), marked AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT
  user_id,
  {ts_str_sql('MIN(ts)')} AS session_start,
  {ts_str_sql('MAX(ts)')} AS last_event,
  COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sid
""",
)
def win_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-island sessionization (30-min gap) via lag + running sum
    — the BATCH twin of stream_session's session_window, same semantics
    through a completely different physical path (two windows + groupBy,
    no state store). A gap of exactly 30:00 starts a new session, matching
    session_window's exclusive end."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.withColumn(
        "new_s",
        F.when(gap_s.isNull() | (gap_s >= 30 * 60), 1).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = marked.withColumn("sid", F.sum("new_s").over(wrun))
    return numbered.groupBy("user_id", "sid").agg(
        ts_str(F.min("ts")).alias("session_start"),
        ts_str(F.max("ts")).alias("last_event"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("sid")


#: Corpus quality gate (shared by the Spark plan and the SQL oracle):
#: minimum length and minimum whitespace-token count.
_MIN_CHARS = 100
_MIN_TOKENS = 20
_NTOK_SQL = "len(list_filter(string_split(lower(text), ' '), t -> t <> ''))"


@query(
    "pipeline_pretrain_corpus",
    oracle=f"""
WITH passing AS (
  -- quality gate FIRST: it commutes with dedup-on-content (identical text
  -- has identical n_chars/token count, so the kept representative — the
  -- lowest doc_id among passing copies — is the same either way) and lets
  -- the scan prune failing docs before the expensive hash shuffle
  SELECT doc_id, lang, text, n_chars
  FROM documents
  WHERE n_chars >= {_MIN_CHARS}
    AND {_NTOK_SQL} >= {_MIN_TOKENS}
), ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS dup_rk
  FROM passing
), kept AS (
  SELECT doc_id, lang, n_chars FROM ranked WHERE dup_rk = 1
)
SELECT
  {_SPLIT_SQL} AS split,
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  {davg_sql('n_chars')} AS avg_chars
FROM kept
GROUP BY 1, 2
""",
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP pipeline composition — the canonical pretraining-corpus
    assembly in ONE declarative plan: exact dedup (keep lowest doc_id per
    sha256) → quality gate (length + token floor) → hash split → per
    (split, lang) accounting. Catalyst pushes the quality filters into
    the scan; the only wide shuffle is the dedup window on the content
    hash. At 100 TB each stage is the same shape the standalone operators
    (text_exact_dedup, text_quality_score, sample_split_hash) run."""
    d = load_table(spark, sf_dir, "documents")
    wdup = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    ntok = F.size(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
    # quality gate BEFORE the dedup window: the filter commutes with
    # dedup-on-content (see oracle comment) and Catalyst cannot prove that
    # itself (the predicate is not on the window partition key), so the
    # reorder is done here — it reaches the parquet scan as a pushed filter
    # instead of running after the wide hash shuffle
    passing = d.filter((F.col("n_chars") >= _MIN_CHARS) & (ntok >= _MIN_TOKENS))
    kept = passing.withColumn("dup_rk", F.row_number().over(wdup)).filter(
        F.col("dup_rk") == 1
    )
    return kept.groupBy(_split_col().alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        # davg = dratio exact half-away (matches the davg_sql oracle term;
        # the old round-the-double-quotient form diverges at 1/count-rate
        # boundaries — stable.py QUOTIENT hazard)
        davg("n_chars", 6).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# Weighted systematic sampling (NORTH: "sample documents proportional to
# token count" — the deterministic PPS draw a data recipe reproduces)
# ---------------------------------------------------------------------------

_WSYS_TARGET = 50  # target sample size
_WSYS_BAND = 100  # doc_id band width for the two-level prefix sum


@query(
    "sample_weighted_systematic",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n_tokens) OVER () AS tot
  FROM w
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum,
       CAST(cum // GREATEST(tot // {_WSYS_TARGET}, 1) AS BIGINT) AS pick_idx
FROM c
WHERE cum // GREATEST(tot // {_WSYS_TARGET}, 1)
      > (cum - n_tokens) // GREATEST(tot // {_WSYS_TARGET}, 1)
""",
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (probability-proportional-to-size) sample of
    documents, weight = token count: a fixed stride steps through the
    cumulative-weight line and every document whose weight interval
    contains a stride point is drawn — big documents proportionally more
    often, ALL-INTEGER and fully deterministic, so the draw is
    reproducible from the data alone (no RNG state to version; the
    standard PPS alternative, exponential-key A-ES reservoirs, needs
    log()/pow() whose libm is engine-specific).

    Shape at scale: the global cumulative weight is the two-level prefix
    sum again (events_concurrency_peak discipline) — within-band running
    sums under a doc_id-band keyed window, cross-band carries broadcast
    from the O(bands) census; the total arrives as a broadcast scalar.
    One scan, one tiny shuffle, no global sort or single-partition
    window."""
    d = load_table(spark, sf_dir, "documents")
    toks = "array_remove(split(lower(text), ' '), '')"
    w = d.select(
        "doc_id",
        F.size(F.expr(toks)).cast("long").alias("n_tokens"),
        F.expr(f"doc_id div {_WSYS_BAND}").alias("band"),
    )
    census = w.groupBy("band").agg(F.sum("n_tokens").alias("wb"))
    carry_w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the scalar total rides on the offsets frame (a window over the
    # O(bands) census) — no separate scalar cross join in the plan
    offsets = census.select(
        "band",
        F.coalesce(F.sum("wb").over(carry_w), F.lit(0)).alias("offset"),
        F.sum("wb").over(Window.partitionBy()).alias("tot"),
    )
    win_local = (
        Window.partitionBy("band")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        w.withColumn("run", F.sum("n_tokens").over(win_local))
        .join(F.broadcast(offsets), "band")
        .withColumn("cum", F.col("offset") + F.col("run"))
        .withColumn(
            "step",
            F.greatest(F.expr(f"tot div {_WSYS_TARGET}"), F.lit(1)),
        )
    )
    return cum.filter(
        F.expr("cum div step") > F.expr("(cum - n_tokens) div step")
    ).select(
        "doc_id",
        "n_tokens",
        F.col("cum").cast("long").alias("cum"),
        F.expr("cum div step").cast("long").alias("pick_idx"),
    )
