"""Set operations (SURVEY §2.G).

Netmonitor anchor: comparing host/flow sets between reporting intervals
(which talkers appeared, disappeared, persisted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import query


def _week_users(spark, sf_dir, lo: str, hi: str):
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )
        .select("user_id", "event_type")
    )


_W1 = ("2024-01-01 00:00:00", "2024-01-08 00:00:00")
_W2 = ("2024-01-08 00:00:00", "2024-01-15 00:00:00")

_W1_SQL = f"SELECT user_id, event_type FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_W1[0]}' AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{_W1[1]}'"
_W2_SQL = f"SELECT user_id, event_type FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_W2[0]}' AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{_W2[1]}'"


@query("set_union_all", oracle=f"{_W1_SQL} UNION ALL {_W2_SQL}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (duplicates kept) of week-1 and week-2 activity."""
    return _week_users(spark, sf_dir, *_W1).unionByName(_week_users(spark, sf_dir, *_W2))


@query("set_union_distinct", oracle=f"{_W1_SQL} UNION {_W2_SQL}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — distinct (user, type) pairs active in either week."""
    return (
        _week_users(spark, sf_dir, *_W1)
        .unionByName(_week_users(spark, sf_dir, *_W2))
        .distinct()
    )


@query("set_intersect", oracle=f"{_W1_SQL} INTERSECT {_W2_SQL}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs active in BOTH weeks (distinct semantics, both engines)."""
    return _week_users(spark, sf_dir, *_W1).intersect(_week_users(spark, sf_dir, *_W2))


@query("set_except", oracle=f"{_W1_SQL} EXCEPT {_W2_SQL}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs active in week 1 but not week 2 (churned talkers).
    DuckDB EXCEPT is distinct-semantics, matching Spark subtract()."""
    return _week_users(spark, sf_dir, *_W1).subtract(_week_users(spark, sf_dir, *_W2))
