#!/usr/bin/env python
"""Multi-executor smoke preflight (VERDICT r8 #3): run a representative
slice of the registry — one-plus op per §2 family, including a streaming
drain, the pagerank loop, ANN, and the session-memo/localCheckpoint
machinery — under ``local-cluster[2,2,2048]`` and compare each against
its DuckDB oracle.

Everything else in this repo runs ``local[N]`` (driver and executors in
ONE JVM), where broadcast serialization, closure shipping, Python-worker
environments on executors, and localCheckpoint block placement are
invisible. local-cluster spawns two REAL executor JVMs (2 cores / 2 GiB
each) against the in-process master — the closest a single machine gets
to the 1000-executor deployment without a resource manager.

Usage:
    python tools/preflight_local_cluster.py [SF_DIR]          # 26-op slice
    python tools/preflight_local_cluster.py --full [SF_DIR]   # ALL 282 ops
    python tools/preflight_local_cluster.py START END [SF_DIR]  # a window
    python tools/preflight_local_cluster.py --recovery [SF_DIR]
        # exactly-once RocksDB checkpoint recovery with real executors:
        # stop a stateful aggregation mid-stream, restart from the SAME
        # checkpoint (state reloads into executor-side RocksDB stores),
        # assert the final totals equal the batch aggregation

Default sf0.01. Exits non-zero on any mismatch. ``--full`` walks the
whole ``driver_ordered`` registry — the strongest multi-executor claim a
single machine can make.
"""
from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
import duckdb  # noqa: E402

_args = sys.argv[1:]
FULL = "--full" in _args
if FULL:
    _args.remove("--full")
RECOVERY = "--recovery" in _args
if RECOVERY:
    _args.remove("--recovery")
WINDOW = None
if len(_args) >= 2 and _args[0].isdigit() and _args[1].isdigit():
    WINDOW = (int(_args[0]), int(_args[1]))
    _args = _args[2:]
SF = _args[0] if _args else "/root/testdata/sf0.01"

#: One per §2 family plus every machinery family that behaves differently
#: with real executors: broadcast joins, iterative localCheckpoint loops,
#: session-memoized trained artifacts, Arrow/pandas workers, streaming
#: state stores (RocksDB opens PER EXECUTOR here), applyInPandas, and the
#: two-level prefix-sum census pattern.
SLICE = [
    "scan_filtered",          # 2.A scan + pushdown
    "project_computed",       # 2.B projection
    "join_star_multiway",     # 2.C broadcast star join (real broadcast ship)
    "join_bucketed_colocated",  # 2.C bucketed SMJ (bucket files on executors)
    "agg_group_pricing",      # 2.D partial agg
    "agg_pareto_talkers",     # census prefix sum + localCheckpoint
    "win_topk_group",         # 2.E window
    "limit_global_topk",      # 2.F TakeOrdered
    "set_except",             # 2.G
    "fn_json_map",            # 2.H
    "stream_tumbling",        # 2.I drain — RocksDB store on executors
    "stream_stateful_counter",  # 2.I applyInPandasWithState on executors
    "udf_pandas_scalar",      # 2.J Arrow worker
    "udf_grouped_map",        # 2.J applyInPandas
    "text_exact_dedup",       # 2.K digest dedup
    "text_near_dedup_minhash",  # 2.K banding self-join
    "vec_knn_cosine",         # 2.K broadcast query vector
    "vec_ann_ivf",            # session-memo trained centroids (executor-built)
    "vec_semantic_dedup",     # k-means + per-cluster BLAS gram via mapInPandas
    "multimodal_chunk_dedup", # binary chunking, digests-only shuffle
    "tpch_q08",               # 2.N heavy multi-broadcast join
    "events_funnel",          # 2.O keyed conditional windows
    "agg_incremental_rollup", # 2.P incremental
    "graph_pagerank_links",   # 2.Q iterative loop + checkpoint cadence
    "sample_weighted_systematic",  # band-census prefix PPS draw
    "text_ppl_buckets",       # band-census terciles (driver census collects)
]

spark = (
    SparkSession.builder.master("local-cluster[2,2,2048]")
    .appName("nm-preflight-local-cluster")
    .config("spark.ui.enabled", "false")
    # executors are separate JVMs here: keep their Python workers pointed
    # at this interpreter (driver + executors share the host env)
    .config("spark.executorEnv.PYSPARK_PYTHON", sys.executable)
    .getOrCreate()
)
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


def run_recovery() -> int:
    """Exactly-once recovery drill under real executors: phase-1 live
    trigger commits ≥1 batch against a RocksDB checkpoint and stops
    mid-stream; phase-2 restarts from the SAME checkpoint (executor-side
    stores reload their version from it — possibly on the OTHER
    executor) and drains the rest. Totals must equal the batch
    aggregation: nothing lost, nothing double-counted."""
    import glob
    import tempfile
    import time as _t

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from storm_netmonitor_spark.session import apply_runtime_confs
    from storm_netmonitor_spark.streaming.stateful import _read_events_arrow

    apply_runtime_confs(spark)
    prov = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    assert "RocksDB" in prov, f"expected the RocksDB provider, got {prov}"

    t = _read_events_arrow(SF)
    src = tempfile.mkdtemp(prefix="nm_rec_src_")
    step = (t.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(t.slice(i * step, step), os.path.join(src, f"p{i}.parquet"))
    ckpt = tempfile.mkdtemp(prefix="nm_rec_ckpt_")

    schema = spark.read.parquet(src).schema

    def start(name, trigger_kwargs, max_files=None):
        r = spark.readStream.schema(schema)
        if max_files:
            r = r.option("maxFilesPerTrigger", str(max_files))
        df = (
            r.parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q1 = start("nm_lc_rec_p1", {"processingTime": "200 milliseconds"}, 1)
    try:
        deadline = _t.time() + 90
        while _t.time() < deadline:
            p = q1.lastProgress
            if p is not None and p["batchId"] >= 1:
                break
            _t.sleep(0.25)
        else:
            raise TimeoutError("phase-1 batch never committed")
    finally:
        q1.stop()
        q1.awaitTermination()

    # the checkpoint must hold RocksDB artifacts, not HDFS-provider deltas
    zips = glob.glob(os.path.join(ckpt, "state", "**", "*.zip"), recursive=True)
    assert zips, f"no RocksDB state snapshots under {ckpt}/state"

    q2 = start("nm_lc_rec_p2", {"availableNow": True})
    q2.awaitTermination()

    got = {
        r["event_type"]: r["n"] for r in spark.table("nm_lc_rec_p2").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"recovered totals: {sorted(got.items())}")
    if got != want:
        print(f"BAD: recovered totals drifted vs batch: {want}")
        return 1
    print("OK recovery: exactly-once totals match batch; "
          f"{len(zips)} RocksDB snapshot(s) in checkpoint")
    return 0


if RECOVERY:
    sys.exit(run_recovery())

qd, od = m.queries(), m.oracle_sql()
if FULL:
    RUN = list(qd)
elif WINDOW is not None:
    RUN = list(qd)[WINDOW[0] : WINDOW[1]]
else:
    RUN = SLICE
t_all = time.time()
bad = []
for name in RUN:
    t0 = time.time()
    try:
        df = qd[name](spark, SF)
        cols = sorted(df.columns)
        rows = sorted(
            (tuple(canon(r[c]) for c in cols) for r in df.collect()),
            key=_row_key,
        )
    except Exception as exc:  # noqa: BLE001 — report and continue
        bad.append((name, f"SPARK {type(exc).__name__}: {str(exc)[:200]}"))
        continue
    if name not in od:
        if not rows:
            bad.append((name, "rows-only op returned 0 rows"))
        else:
            print(f"OK-rowsonly {name}: {len(rows)} rows "
                  f"{time.time() - t0:.1f}s", flush=True)
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
print(f"TOTAL {time.time() - t_all:.1f}s slice={len(RUN)}")
print("BAD:", bad if bad else "none")
sys.exit(1 if bad else 0)
