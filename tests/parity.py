"""Local stand-in for the driver's DuckDB oracle comparison.

Mirrors the documented behavior (SURVEY §0.2): register the ten testdata
parquet files as DuckDB views, run the Spark query and the oracle SQL, then
compare row count + column names + order-insensitive canonical values.

Canonicalization is deliberately STRICTER than the driver is likely to be
(exact equality on floats, no tolerance): if parity passes here repeatedly,
the engines are producing bit-identical values and any reasonable driver
hash will match.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from storm_netmonitor_spark.io import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dt.timedelta):
        return f"td:{v.total_seconds()}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"dec:{v}"
    except ImportError:
        pass
    return v


def canon_rows(cols: list[str], rows) -> list[tuple]:
    """Sort columns by name (driver behavior), canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def run_spark(qfn, spark, sf_dir):
    df = qfn(spark, sf_dir)
    return [f.name for f in df.schema.fields], df.collect()


def run_oracle(sql: str, sf_dir: str):
    con = duck_connect(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    return cols, rows


def assert_parity(name: str, spark, sf_dir: str) -> None:
    from storm_netmonitor_spark.registry import QUERIES, resolve_oracle

    s_cols, s_rows = run_spark(QUERIES[name], spark, sf_dir)
    o_cols, o_rows = run_oracle(resolve_oracle(name, sf_dir), sf_dir)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc = canon_rows(s_cols, s_rows)
    oc = canon_rows(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
