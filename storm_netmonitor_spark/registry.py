"""Query registry — binds SURVEY §2 operator IDs to (Spark callable, oracle).

Every operator in the engine registers itself here with the ``@query``
decorator; ``__spark_entry__.py`` exposes the two dicts to the driver.

Contract (SURVEY §0.2): a query callable takes ``(spark, sf_dir)`` and
returns a DataFrame; its oracle is ANSI SQL DuckDB runs over views named
after the testdata tables. Column names and value canonicalization (float
rounding, timestamp formatting) must match EXACTLY between the two — the
driver hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as SURVEY §2 operator ``name``.

    ``oracle`` is the DuckDB SQL twin; ``None`` means the operator is not
    SQL-expressible and gets the driver's weaker rows-only check.
    """

    def decorate(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return decorate


def load_all() -> None:
    """Import every operator module so registrations run."""
    from . import operators, streaming  # noqa: F401

    operators.load()
    streaming.load()


#: Names the driver already verified green (or rows-only by design) in
#: CORRECTNESS_r01.json. The driver evaluates only the FIRST ~50 entries of
#: ``queries()`` each round, so ``driver_ordered`` pushes these to the back
#: until every operator has a driver verdict; they remain covered by the
#: local parity suite every round. Update per round as verdicts accumulate.
DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "scan_parquet", "scan_pruned", "scan_filtered",
        "sink_parquet_roundtrip", "sink_csv_json_roundtrip",
        "sink_parquet_partitioned", "sql_interface", "sink_sorted_layout",
        "observe_metrics", "scan_merge_schema", "project_alias",
        "project_computed", "filter_compare", "filter_in_like",
        "filter_null_3vl", "filter_bool", "join_inner_equi",
        "join_star_multiway", "join_left_outer", "join_right_outer",
        "join_full_outer", "join_semi", "join_anti", "join_cross",
        "join_theta", "join_range_interval", "join_asof", "join_broadcast",
        "join_bucketed_colocated", "sub_scalar_correlated", "sub_in_exists",
        "join_lateral", "agg_group_pricing", "agg_global",
        "agg_count_distinct", "agg_approx_distinct", "agg_stats",
        "agg_having", "agg_conditional", "agg_rollup", "agg_cube",
        "agg_grouping_sets", "agg_percentile", "agg_minmax_by",
        "agg_salted_skew", "agg_heavy_hitters_approx", "agg_mode",
        "agg_hourly_events",
    }
)

#: Red/crashed rows from the last driver round, fixed this round — they go
#: FIRST so the fix is re-verified before anything else.
RECHECK_FIRST: tuple[str, ...] = (
    "source_csv_permissive",
    "agg_collect_sorted",
    "vec_centroid_label",
)


def driver_ordered(mapping: dict) -> dict:
    """Reorder ``mapping`` for the driver's capped per-round check window:
    fixed-red rows first, never-driver-checked next (registration order),
    already-verified last."""
    front = [n for n in RECHECK_FIRST if n in mapping]
    mid = [
        n for n in mapping if n not in DRIVER_VERIFIED and n not in RECHECK_FIRST
    ]
    back = [
        n for n in mapping if n in DRIVER_VERIFIED and n not in RECHECK_FIRST
    ]
    return {n: mapping[n] for n in front + mid + back}
