"""Round-2 incremental-computation extensions: materialized-rollup
maintenance and a custom Python data source (Spark 4 DataSource API).

Registered AFTER ``events_analytics`` (see operators/__init__ note).

Reference citations: /root/reference is empty this round (SURVEY §0.1);
anchors cite the north-star contract [L BASELINE.json:6] and the Storm
metrics model (SURVEY §0.3).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import davg_sql, dratio, dsum_sql
from ..io import load_table
from ..registry import query

# ---------------------------------------------------------------------------
# Incremental rollup maintenance (100 TB core pattern: yesterday's rollup
# is NEVER recomputed — only today's delta touches raw data)
# ---------------------------------------------------------------------------

_DEC = "decimal(28,6)"
_INC_CACHE: dict[str, str] = {}

#: History/delta split point — events span 2024-01; the last week is "new".
_INC_CUTOFF = "2024-01-25"


def _daily_partials(e: DataFrame) -> DataFrame:
    """Per (event_type, day) MERGEABLE partial state: count, exact decimal
    sum, min, max. Everything the final rollup needs re-derives from
    these by pure merge (sum of counts, decimal add, min of mins, max of
    maxes; avg = merged sum / merged count) — the algebraic-aggregate
    property that makes incremental maintenance exact, not approximate."""
    return e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("double").cast(_DEC)).alias("sum_dec"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


@query(
    "agg_incremental_rollup",
    oracle=f"""
SELECT event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value,
       MIN(value) AS min_value, MAX(value) AS max_value,
       {davg_sql('value')} AS avg_value
FROM events
GROUP BY event_type
""",
)
def agg_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup incremental maintenance (NM: the daily network
    report at 100 TB): history partials per (type × day) — count, EXACT
    decimal sum, min, max — are persisted once as a KB-sized parquet
    state; each refresh aggregates ONLY the delta days' raw rows and
    merges them with the stored partials (counts add, decimal sums add
    exactly in any order, min/max fold, avg derives from merged sum and
    count). The oracle is the full-table aggregate — proving the
    incremental path is bit-identical to recomputation, which is exactly
    the property (algebraic aggregates + order-independent decimal sums,
    SURVEY §7.4.1) that lets a production rollup never re-read history.
    The delta scan's day predicate is pushed to the parquet reader."""
    key = os.path.abspath(sf_dir)
    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    if key not in _INC_CACHE:
        d = tempfile.mkdtemp(prefix="nm_rollup_state_")
        path = os.path.join(d, "partials")
        _daily_partials(e.where(day < F.lit(_INC_CUTOFF))).write.mode(
            "overwrite"
        ).parquet(path)
        _INC_CACHE[key] = path
    history = spark.read.parquet(_INC_CACHE[key])
    delta = _daily_partials(e.where(day >= F.lit(_INC_CUTOFF)))
    merged = (
        history.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_v").alias("min_value"),
            F.max("max_v").alias("max_value"),
        )
    )
    return merged.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("sum_dec"), 2).cast("double").alias("total_value"),
        "min_value",
        "max_value",
        # dratio over the EXACT scaled merged sum — matches the davg_sql
        # oracle term; the old round-the-double-quotient form diverges at
        # 1/count-rate boundaries (stable.py QUOTIENT hazard)
        dratio(
            (F.col("sum_dec") * 1000000).cast("long"), F.col("n_events"), 6
        ).alias("avg_value"),
    )
