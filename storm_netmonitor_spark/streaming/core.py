"""Streaming infrastructure: event-stream source + drain-to-memory runner.

The netmonitor reference is a continuously-running metrics pipeline; here
every streaming query runs with ``trigger(availableNow=True)`` so it drains
the test input deterministically and can be hash-compared against a batch
oracle (SURVEY §2.I). In production the same code runs with a processing-
time trigger and a real directory of arriving parquet — nothing else
changes.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..io import table_path
from ..session import apply_runtime_confs


def _events_field(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


#: Events schema with ts as a proper timestamp — used for µs/ms parquet
#: (Spark reads those natively) and for all OUR staged files, which
#: ``stateful._read_events_arrow`` normalizes to timestamp[us] on write.
EVENTS_RAW_SCHEMA = _events_field(TimestampType())

#: Events schema for TIMESTAMP(NANOS) parquet, which Spark 4.x refuses
#: unless read as a raw long under the nanosAsLong conf; ``events_stream``
#: then converts (ts div 1000 → µs, lossless for this data).
EVENTS_NANOS_SCHEMA = _events_field(LongType())

_ts_unit_cache: dict[tuple, str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Physical unit of events.ts in this dir's parquet ('ns'/'us'/'ms').

    The driver regenerates testdata between rounds and has shipped BOTH
    TIMESTAMP(NANOS) (rounds 1-2) and TIMESTAMP(MICROS) (round 3) — so the
    unit is detected from the file footer, never assumed."""
    return _file_ts_unit(table_path(sf_dir, "events"))


def _file_ts_unit(path: str) -> str:
    # fingerprint-keyed (size+mtime): a driver-side testdata regeneration
    # mid-session must re-probe the footer, not serve the stale unit —
    # the one-stat-per-call cost is noise next to the py4j analysis the
    # cached plan skips (same stale-data guard as io.sf_fingerprint)
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    if key not in _ts_unit_cache:
        import pyarrow.parquet as pq

        t = pq.ParquetFile(path).schema_arrow.field("ts").type
        _ts_unit_cache[key] = getattr(t, "unit", "us")
    return _ts_unit_cache[key]


def _dir_ts_unit(src: str) -> str:
    """ts unit of the parquet files actually inside ``src`` (footer of the
    first file; staged directories are written with one uniform unit)."""
    for name in sorted(os.listdir(src)):
        if name.endswith(".parquet"):
            return _file_ts_unit(os.path.join(src, name))
    return "us"

_stage_cache: dict[str, str] = {}

#: Stateful streaming operators hash their state into
#: ``spark.sql.shuffle.partitions`` state-store partitions, fixed at the
#: first checkpoint — a knob that should track KEY CARDINALITY and executor
#: count, not the batch shuffle width. The test/bench keyspaces (hourly
#: windows × event types, user ids) are thousands of keys, where 32
#: partitions is pure checkpoint-file overhead (measured: 32→8 cuts the
#: sf0.1 drain ~25%). Production deployments raise this via
#: ``NM_STREAM_STATE_PARTITIONS`` to match their cluster.
STREAM_STATE_PARTITIONS = int(os.environ.get("NM_STREAM_STATE_PARTITIONS", "8"))


@contextmanager
def _state_sized_shuffle(spark: SparkSession, n: int | None = None):
    """Temporarily size shuffle partitions for streaming state; the value
    is captured into the query's checkpoint at start, so restoring the
    batch setting afterwards does not affect the running drain.

    ``n`` overrides the default for a single drain: JVM-native windowed
    aggregations with few thousand keys want FEWER state partitions (each
    one costs store-commit files per batch), while Python-stateful
    operators (``applyInPandasWithState``) want MORE — their Arrow worker
    parallelism follows the state partitioning (measured both ways at
    sf0.1: tumbling 8→2 −15%, stateful_counter 8→2 +34%)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(n or STREAM_STATE_PARTITIONS)
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


#: Throwaway-drain tuning, set around every ``drain_to_memory`` and
#: restored after (production deployments with durable checkpoints keep
#: Spark's defaults): retain only the latest checkpoint batch, push the
#: store-maintenance cadence past the drain's lifetime, and write the
#: offset/commit/state logs through the plain-FileSystem checkpoint
#: manager instead of the default FileContext one. The FileContext layer
#: buys atomic-rename guarantees on filesystems whose rename is not atomic
#: (object stores); on the local/tmpfs paths these throwaway checkpoints
#: live on, rename IS atomic and the extra ceremony is ~30% of the whole
#: sf0.1 tumbling drain (measured 0.60→0.42 s median of 7).
_DRAIN_CONFS = {
    "spark.sql.streaming.minBatchesToRetain": "1",
    "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
    "spark.sql.streaming.checkpointFileManagerClass": (
        "org.apache.spark.sql.execution.streaming.checkpointing."
        "FileSystemBasedCheckpointFileManager"
    ),
}


#: Sessions whose static drain confs are already applied (id()-keyed; the
#: sticky confs only affect streaming queries, every one of which in this
#: process is a drain, so set-once beats ~8 py4j conf round-trips per drain
#: — measured ~60 ms of the sub-second drain wall).
_drain_conf_applied: set[int] = set()

#: Session default of noDataMicroBatches (Spark ships "true"); cached so
#: the per-mode toggle below never has to read it back.
_NODATA_DEFAULT = "true"


@contextmanager
def _drain_tuned(spark: SparkSession, mode: str):
    if id(spark) not in _drain_conf_applied:
        for k, v in _DRAIN_CONFS.items():
            spark.conf.set(k, v)
        _drain_conf_applied.add(id(spark))
    toggled = mode == "complete"
    if toggled:
        # complete mode re-emits the full state every batch — a trailing
        # no-data micro-batch (whose only purpose is watermark-driven
        # FINAL emission in append mode) buys nothing here. Append-mode
        # drains keep it: their last rows emit in that batch.
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        yield
    finally:
        if toggled:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", _NODATA_DEFAULT
            )


def cached_stream_df(spark: SparkSession, key: tuple, builder) -> DataFrame:
    """Memoize an analyzed streaming DataFrame per (session, op, input)
    via the shared ``io.session_memo``: a production NM pipeline
    constructs its plan ONCE and runs for days; repeated calls in one
    session (bench, registry sweep, driver window) re-drain the same
    analyzed plan instead of paying ~0.1 s of py4j analysis round-trips
    per call. Draining is unaffected — every drain still runs the full
    micro-batch lifecycle with a fresh checkpoint.

    The trailing element of every caller's ``key`` is the sf_dir; it is
    also passed as the memo's data fingerprint (ADVICE r5): the analyzed
    plan's source SCHEMA is data-derived (ns-vs-µs ts unit from the
    parquet footer), so a mid-session testdata regeneration must rebuild
    the plan, not re-drain a stale schema."""
    from ..io import session_memo

    sf_dir = key[-1] if key and isinstance(key[-1], str) else None
    return session_memo(spark, ("stream_df",) + key, builder, sf_dir=sf_dir)


def ckpt_dir() -> str:
    """Fresh throwaway checkpoint dir — tmpfs when the platform has it
    (checkpoint I/O is fsync-bound metadata; a deterministic drain never
    needs it to survive reboot). Production passes a durable location."""
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    return tempfile.mkdtemp(prefix="nm_ckpt_", dir=base)


def events_stream_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY; stage a symlink to the
    events parquet in a cached temp dir (no data copy)."""
    key = os.path.abspath(sf_dir)
    if key not in _stage_cache:
        d = tempfile.mkdtemp(prefix="nm_stream_src_")
        os.symlink(table_path(sf_dir, "events"), os.path.join(d, "events.parquet"))
        _stage_cache[key] = d
    return _stage_cache[key]


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Unbounded events DataFrame (ts normalized to TimestampType).

    The nanos-vs-micros schema choice follows the files ACTUALLY being read:
    when ``source_dir`` overrides the default staged symlink, its own footer
    decides, so a µs staged dir under a ns ``sf_dir`` reads correctly
    (ADVICE r3 #1).

    ``columns`` prunes the SOURCE read schema: Catalyst does not push
    column pruning through the file-stream source the way it does for a
    batch scan, so a streaming query that needs 3 of 6 columns otherwise
    decodes all 6 every micro-batch (measured: −13% addBatch at sf0.1
    just for the narrow events table — at 100 TB with wide payloads the
    difference is the whole scan). Parquet is schema-on-read, so a subset
    schema reads only those column chunks."""
    apply_runtime_confs(spark)
    src = source_dir or events_stream_dir(sf_dir)
    nanos = _dir_ts_unit(src) == "ns"
    base = EVENTS_NANOS_SCHEMA if nanos else EVENTS_RAW_SCHEMA
    schema = (
        base
        if columns is None
        else StructType([f for f in base.fields if f.name in columns])
    )
    raw = spark.readStream.schema(schema).parquet(src)
    if nanos and (columns is None or "ts" in columns):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def drain_to_memory(
    df: DataFrame,
    mode: str = "complete",
    state_partitions: int | None = None,
    **stream_opts,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory sink; return the final result as a batch DataFrame.

    Checkpoints go to a fresh temp dir — never into the repo."""
    name = "nm_mem_" + uuid.uuid4().hex[:10]
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt_dir())
        .trigger(availableNow=True)
    )
    for k, v in stream_opts.items():
        writer = writer.option(k, v)
    spark = df.sparkSession
    with _state_sized_shuffle(spark, state_partitions), _drain_tuned(spark, mode):
        q = writer.start()
        q.awaitTermination()
    return spark.table(name)


def drain_to_memory_until(
    df: DataFrame, done, mode: str = "complete", timeout_s: float = 120.0
) -> DataFrame:
    """Run a streaming DataFrame with a fast processing-time trigger until
    ``done(last_end_offset: dict) -> bool`` says the source is exhausted,
    then stop and return the sink table.

    Custom Python sources (``pyspark.sql.datasource``) don't participate in
    ``availableNow``'s drain planning — a single micro-batch is captured —
    so bounded custom streams are drained by watching the committed offset
    instead. ``lastProgress`` only ever reports COMPLETED batches, so once
    ``done`` sees the final offset the sink already holds its output."""
    import ast
    import time

    name = "nm_mem_" + uuid.uuid4().hex[:10]
    writer = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt_dir())
        .trigger(processingTime="0 seconds")
    )
    with _state_sized_shuffle(df.sparkSession), _drain_tuned(
        df.sparkSession, mode
    ):
        q = writer.start()
        try:
            deadline = time.time() + timeout_s
            while time.time() < deadline:
                if q.exception() is not None:
                    raise q.exception()  # fail fast, don't spin to timeout
                p = q.lastProgress
                if p and p.get("sources"):
                    off = p["sources"][0].get("endOffset")
                    if isinstance(off, str):
                        off = ast.literal_eval(off)
                    if off and done(off):
                        break
                # 10 ms: the offset poll gates EVERY batch boundary of a
                # multi-batch drain, so poll latency × batch count is pure
                # added wall (the check itself is a cheap property read)
                time.sleep(0.01)
            else:
                raise TimeoutError("custom stream did not reach end offset")
        finally:
            q.stop()
            q.awaitTermination()
    return df.sparkSession.table(name)
