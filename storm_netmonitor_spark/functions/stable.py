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

QUOTIENT hazard (measured, round 6): DuckDB's double→DECIMAL(p,6) cast
computes ``nearbyint(x * 10^6)`` in DOUBLE (half-up), while Spark goes
through the shortest-string BigDecimal. For x = 3.3974284999999997 the
double product x·10^6 rounds to EXACTLY 3397428.5 → DuckDB says
3.397429, Spark's string path says 3.397428. Crucially this is NOT a
~1e-9 tail event when x is a ratio of a 6-decimal quantity to a small
integer: x = N·10^-6/n has x·10^6 = N/n, which sits exactly on a .5
boundary whenever N ≡ n/2 (mod n) — probability ~1/n per value (hit in
practice with n = 84). ``dround(sum/count)`` / the old ``davg`` carried
this hazard; ``davg``/``dratio`` now round the EXACT rational in integer
arithmetic (identical in both engines, no double product involved).

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


def dec_scaled(col: Column | str) -> Column:
    """Exact scaled-integer numerator for :func:`dratio`: the decimal-6 sum
    of a double column, ×10^6, as BIGINT. Decimal×int is exact in both
    engines (value ≤ 1e16 needs 23 < 38 digits), so no double product is
    ever formed — this is what makes the ratio helpers boundary-proof."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("double").cast(DEC)) * 1000000).cast("long")


def dec_scaled_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(CAST({expr} AS DOUBLE) AS {DEC_SQL})) * 1000000 AS BIGINT)"


def dratio(num_scaled: Column, den: Column, round_to: int = 6, in_scale: int = 6) -> Column:
    """Deterministic round-half-away of the EXACT rational
    (num_scaled·10^-in_scale) / den at ``round_to`` decimals, in integer
    arithmetic — the boundary-proof replacement for rounding a double
    quotient (see QUOTIENT hazard in the module docstring).

    ``num_scaled`` must be an exact scaled-integer BIGINT column (from
    :func:`dec_scaled`); ``den`` a positive integer column;
    ``round_to ≤ in_scale``. Let N=|num_scaled|, D=den·10^(in_scale-round_to):
    half-away rounding is q = floor((2N+D)/(2D)), computed as
    ``round((a - a%b)/b)`` with a=2N+D, b=2D — (a - a%b) is exactly b·q, so
    the double division is correct to ~4·10^-16 relative and the final
    round-to-integer is exact while q < 4.5e15 and a < 2^63 (|sum| ≤ 4.5e9
    at round_to=6 — orders of magnitude above any per-group magnitude
    here). Both engines run the same integer ops → bit-identical."""
    s = 10 ** (in_scale - round_to)
    d = (F.col(den) if isinstance(den, str) else den).cast("long") * F.lit(s).cast("long")
    a = F.abs(num_scaled) * 2 + d
    b = d * 2
    q = F.round((a - a % b).cast("double") / b.cast("double"), 0).cast("long")
    signed = F.when(num_scaled < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(float(10**round_to))


def dratio_sql(num_scaled: str, den: str, round_to: int = 6, in_scale: int = 6) -> str:
    s = 10 ** (in_scale - round_to)
    d = f"(CAST({den} AS BIGINT) * {s})"
    # explicit BIGINT casts: DuckDB types bare integer literals as the
    # smallest fitting width, so 2*<INT32 literal> would overflow INT32
    a = f"(2*ABS(CAST({num_scaled} AS BIGINT)) + {d})"
    b = f"(2*{d})"
    q = f"CAST(ROUND(CAST(({a} - ({a} % {b})) AS DOUBLE) / CAST({b} AS DOUBLE)) AS BIGINT)"
    signed = f"(CASE WHEN {num_scaled} < 0 THEN -{q} ELSE {q} END)"
    return f"(CAST({signed} AS DOUBLE) / {float(10 ** round_to)!r})"


def davg(col: Column | str, round_to: int = 6) -> Column:
    """avg = exact half-away rounding of (decimal-6 sum / count) via
    :func:`dratio` — immune to the quotient boundary hazard that the old
    round-the-double-quotient formulation carried (module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return dratio(dec_scaled(c), F.count(c), round_to)


def davg_sql(expr: str, round_to: int = 6) -> str:
    return dratio_sql(dec_scaled_sql(expr), f"COUNT({expr})", round_to)


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
