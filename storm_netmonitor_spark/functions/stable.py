"""Oracle-stable numerics — make float aggregates BIT-IDENTICAL across engines.

Problem (SURVEY §7.4.1): double summation is order-dependent; Spark's shuffle
merge order and DuckDB's scan order differ, so ``SUM(double)`` disagrees in
final ULPs and a value-hash comparison fails. Rounding the double result is
NOT safe either: Spark's ``round(double, n)`` rounds the shortest decimal
string repr (Java ``BigDecimal.valueOf``) while DuckDB rounds the binary
value, so inputs like the double nearest 2.675 round differently.

Solution: accumulate in DECIMAL. ``CAST(x AS DECIMAL(s, p))`` is
deterministic (round-half-up to p fractional digits; decimal boundaries
ending in 5 are never exactly representable in binary, so both engines see
the same side of the boundary), decimal addition is exact and associative
(order-independent), and decimal→double is exact. Both engines therefore
produce the SAME double, bit for bit. Derived quantities (avg, variance)
are then identical IEEE arithmetic on identical inputs.

The same helpers exist in two renderings — a Spark ``Column`` and a DuckDB
SQL string — kept adjacent so they cannot drift.

FLOAT32 hazard (measured): Spark casts float→decimal via the float's
SHORTEST STRING ("0.2903225" → 0.290323) while DuckDB rounds the binary
value (0.29032249… → 0.290322). Every helper therefore widens to DOUBLE
first: a double's 17-significant-digit shortest repr makes the string and
binary paths agree except on reprs ending in a bare '5' exactly at the
rounding position (~1e-9 of values).

Scale note: decimal aggregation is ~2× slower than double aggregation but
still whole-stage-codegen'd JVM work; it is used only on final reported
aggregates, never inside joins/filters.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Precision 38 is the max in both engines. Scale 6 handles all testdata
# magnitudes (prices ≤ 1e5, sums ≤ 1e10 at sf0.1 → 16 integer digits spare).
DEC = "decimal(28,6)"
DEC_SQL = "DECIMAL(28,6)"


def dsum(col: Column | str, round_to: int = 2) -> Column:
    """Exact decimal sum of a double column, rounded in decimal space,
    returned as double. Deterministic across engines and across runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("double").cast(DEC)), round_to).cast("double")


def dsum_sql(expr: str, round_to: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST(CAST({expr} AS DOUBLE) AS {DEC_SQL})), {round_to}) AS DOUBLE)"


def davg(col: Column | str, round_to: int = 6) -> Column:
    """avg = exact-decimal sum (as double) / count: identical IEEE division
    on identical inputs → identical result; rounded in decimal space."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.sum(c.cast("double").cast(DEC)).cast("double") / F.count(c)
    return F.round(raw.cast(DEC), round_to).cast("double")


def davg_sql(expr: str, round_to: int = 6) -> str:
    raw = f"CAST(SUM(CAST(CAST({expr} AS DOUBLE) AS {DEC_SQL})) AS DOUBLE) / COUNT({expr})"
    return f"CAST(ROUND(CAST({raw} AS {DEC_SQL}), {round_to}) AS DOUBLE)"


def sketch_ok(
    approx: Column | str,
    exact: Column | str,
    floor: float = 2.0,
    frac: float = 0.05,
) -> Column:
    """Shared bounds predicate for the sketch-verification frames
    (VERDICT r4 #5): |approx − exact| ≤ max(floor, frac·exact). One
    definition so a tolerance change edits one place, not three operator
    files."""
    a = F.col(approx) if isinstance(approx, str) else approx
    e = F.col(exact) if isinstance(exact, str) else exact
    return F.abs(a - e) <= F.greatest(F.lit(float(floor)), float(frac) * e)


def dround(col: Column | str, round_to: int = 6) -> Column:
    """Round a double deterministically by bouncing through decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double").cast(DEC), round_to).cast("double")


def dround_sql(expr: str, round_to: int = 6) -> str:
    return f"CAST(ROUND(CAST(CAST({expr} AS DOUBLE) AS {DEC_SQL}), {round_to}) AS DOUBLE)"


def ts_str(col: Column | str) -> Column:
    """Canonical timestamp rendering for hashed outputs (SURVEY §7.4.3):
    naive-UTC string, second precision. Avoids tz-aware/naive Arrow
    mismatches between Spark TimestampType and DuckDB TIMESTAMP."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def ts_str_sql(expr: str) -> str:
    return f"strftime(CAST({expr} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"
