#!/usr/bin/env python
"""Driver-shaped oracle parity for NAMED queries (the
``preflight_driver_window`` check, selected by registry id instead of
window index — the r14 optimization round's per-change re-proof tool).

Usage:
    python tools/parity_by_name.py SF_DIR QUERY [QUERY ...]
"""
from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1]
NAMES = sys.argv[2:]

spark = SparkSession.builder.master("local[8]").getOrCreate()  # VANILLA
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"dec:{v}"
    except ImportError:
        pass
    return v


def _row_key(r):
    return tuple((x is None, str(type(x)), str(x)) for x in r)


qd, od = m.queries(), m.oracle_sql()
bad = []
for name in NAMES:
    t0 = time.time()
    try:
        df = qd[name](spark, SF)
        cols = sorted(df.columns)
        rows = sorted(
            (tuple(canon(r[c]) for c in cols) for r in df.collect()),
            key=_row_key,
        )
    except Exception as exc:  # noqa: BLE001
        bad.append((name, f"SPARK {type(exc).__name__}: {str(exc)[:200]}"))
        continue
    if name not in od:
        print(f"OK-rowsonly {name}: {len(rows)} rows", flush=True)
        continue
    try:
        cur = con.execute(od[name])
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        ora = sorted(
            (tuple(canon(r[i]) for i in idx) for r in cur.fetchall()),
            key=_row_key,
        )
    except Exception as exc:  # noqa: BLE001
        bad.append((name, f"ORACLE {type(exc).__name__}: {str(exc)[:200]}"))
        continue
    if sorted(ocols) != cols:
        bad.append((name, f"cols spark={cols} oracle={sorted(ocols)}"))
    elif rows != ora:
        diff = [(a, b) for a, b in zip(rows, ora) if a != b][:1]
        bad.append(
            (name, f"values differ rows={len(rows)}/{len(ora)} first={diff}")
        )
    else:
        print(f"OK {name}: {len(rows)} rows {time.time() - t0:.1f}s",
              flush=True)
print("BAD:", bad if bad else "none")
sys.exit(1 if bad else 0)
