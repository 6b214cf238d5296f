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
