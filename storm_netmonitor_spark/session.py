"""SparkSession factory and runtime configuration.

Design notes (100 TB): every conf here is either a correctness requirement
(UTC session timezone, parquet-nanos shim) or a scale default (AQE on so
skewed shuffles re-plan at runtime, partition coalescing). Nothing is
cluster-size specific; on a real cluster only ``master`` and memory sizing
change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are runtime-settable and REQUIRED for correctness. They are
#: (re-)applied to any session we are handed (the driver owns its own
#: SparkSession, so build-time config is not enough).
RUNTIME_CONFS: dict[str, str] = {
    # testdata timestamps are naive/UTC-intended (FIXTURES.md); DuckDB's
    # TIMESTAMP is naive, so both engines must agree on UTC.
    "spark.sql.session.timeZone": "UTC",
    # events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    # generations, which Spark 4.x refuses by default; with this conf it
    # reads as long and io.load_table converts (lossless, measured: no
    # sub-microsecond components). Harmless for µs/ms generations, where
    # the column reads as a native timestamp and the guard is a no-op.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Round-3 testdata ships timestamps as isAdjustedToUTC=false µs, which
    # Spark 4.x infers as TIMESTAMP_NTZ by default — breaking functions
    # that require TIMESTAMP (unix_micros, window()) and diverging from
    # DuckDB's naive-timestamp reading. With inference off, naive parquet
    # timestamps read as session-TZ TIMESTAMP; session TZ is pinned UTC
    # above, so wall-clock values match DuckDB exactly (SURVEY §7.4.3).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Every operator is developed and hash-verified under Spark 4's ANSI
    # default; pin it so a host session running with the legacy setting
    # cannot silently flip NULL semantics — e.g. size(NULL) returns -1
    # (not NULL) under ansi=false, which would skew the row-local
    # size()-based corpus token totals in corpus2.py vs the DuckDB oracle
    # (ADVICE r8).
    "spark.sql.ansi.enabled": "true",
    # Adaptive execution: runtime broadcast-join conversion, skew-join
    # splitting, partition coalescing — the main scale levers.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # A vanilla session defaults to 200 shuffle partitions — far too many
    # for local test scale (per-partition overhead dominates) and wrong for
    # any fixed cluster size anyway; 32 matches the driver's local[32] and
    # AQE coalescing right-sizes below it at runtime.
    "spark.sql.shuffle.partitions": "32",
}

#: Streaming state store provider (SURVEY §1.1's Storm-state mapping).
#: The default HDFSBackedStateStoreProvider keeps EVERY key's state as JVM
#: objects on executor heap — for the stateful family (stream_stateful_
#: counter, stream_counter_rate, stream_dedup, stream_alert_suppress, the
#: session windows) at 100 TB / high-cardinality keys that is the canonical
#: Structured-Streaming OOM. RocksDB keeps state in native memory + local
#: disk with bounded heap, and measured locally it is not slower (sf0.01
#: tumbling drain median 0.75 s RocksDB vs 0.84 s HDFS; full stateful
#: family re-verified green under it). Gated on the rocksdbjni jar actually
#: shipping with the installed Spark (it does in this build — probed at
#: import, not assumed), with ``NM_STREAM_STATE_PROVIDER=hdfs`` as the
#: operational kill-switch.
_STATE_PROVIDERS = {
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
}


def _rocksdb_jar_present() -> bool:
    """Probe every jar directory this deployment could load rocksdbjni
    from: the pip-installed pyspark tree AND $SPARK_HOME/jars (a
    spark-submit deployment keeps jars under SPARK_HOME, not site-packages
    — ADVICE r9)."""
    import glob

    import pyspark

    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        jar_dirs.append(os.path.join(spark_home, "jars"))
    return any(
        glob.glob(os.path.join(d, "rocksdbjni-*.jar")) for d in jar_dirs
    )


_state_provider = os.environ.get("NM_STREAM_STATE_PROVIDER", "rocksdb").lower()
if _state_provider not in _STATE_PROVIDERS:
    # A typo ('rocks', 'rockdb') must not silently hand the operator the
    # heap-bound HDFS default they believed they had opted out of.
    import warnings

    warnings.warn(
        f"NM_STREAM_STATE_PROVIDER={_state_provider!r} is not one of "
        f"{sorted(_STATE_PROVIDERS)}; using Spark's default (HDFS-backed, "
        "heap-bound) state store provider",
        stacklevel=1,
    )
elif _state_provider == "rocksdb" and not _rocksdb_jar_present():
    # The operator asked for (or defaulted to) RocksDB but this
    # deployment cannot load it — falling back to the heap-bound HDFS
    # provider is exactly the 100 TB OOM the RocksDB default prevents,
    # so it must never happen silently.
    import warnings

    warnings.warn(
        "rocksdbjni jar not found in pyspark/jars or $SPARK_HOME/jars; "
        "streaming state falls back to the HDFS-backed (heap-bound) "
        "provider — high-cardinality stateful queries may OOM at scale",
        stacklevel=1,
    )
else:
    RUNTIME_CONFS["spark.sql.streaming.stateStore.providerClass"] = (
        _STATE_PROVIDERS[_state_provider]
    )
    # Changelog checkpointing (round 11): per-batch CHANGELOG uploads
    # instead of full SST snapshot uploads — the snapshot sync was the
    # dominant per-batch fixed cost (measured at sf0.1: tumbling drain
    # median 0.77 → 0.60 s, −22%). Recovery replays the changelog onto
    # the last snapshot; exactly-once re-proven under the --recovery
    # restart drill, the --chaos executor-kill drill, and --chaos-serve
    # after enabling. RocksDB-only conf, so it rides the same gate.
    RUNTIME_CONFS[
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    ] = "true"


#: The shipped marker lives as an attribute ON the session object
#: (``_nm_pkg_shipped``): it dies with the object, so a recycled id()
#: can never inherit it (ADVICE r9), and checking it is a plain
#: attribute read — no per-call Py4J round trip (an applicationId
#: lookup here measurably taxed every load_table call). Only set after
#: a SUCCESSFUL ship so a transient failure is retried, not cached.
_PKG_ZIP: str | None = None


def _package_zip() -> str:
    """Zip of the engine package, built once per process — the
    ``--py-files`` artifact a spark-submit deployment would ship."""
    global _PKG_ZIP
    if _PKG_ZIP is None or not os.path.exists(_PKG_ZIP):
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        fd, path = tempfile.mkstemp(prefix="nm_pkg_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, dirs, files in os.walk(pkg_dir):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        _PKG_ZIP = path
    return _PKG_ZIP


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship the engine package to executor Python workers when executors
    are SEPARATE processes (local-cluster / standalone / YARN / k8s).

    In ``local[N]`` the Python workers fork from the driver and inherit
    its ``sys.path``, so module-by-reference pickling (every
    ``applyInPandas``/``applyInPandasWithState``/UDF closure defined at
    module level) just works — and silently hides the deployment bug:
    with real executor JVMs the worker does ``import
    storm_netmonitor_spark`` and dies with ModuleNotFoundError (found by
    the round-9 local-cluster preflight, exactly the class of bug VERDICT
    r8 #3 predicted). ``addPyFile`` distributes the package zip to every
    node and prepends it to the workers' ``sys.path`` — the runtime
    equivalent of ``spark-submit --py-files``."""
    if getattr(spark, "_nm_pkg_shipped", False):
        return
    try:
        sc = spark.sparkContext
        master = sc.master
        if master != "local" and not master.startswith("local["):
            sc.addPyFile(_package_zip())
        # Marked ONLY on success (or on local[N], where shipping is a
        # no-op by design) — a failed ship stays retryable.
        spark._nm_pkg_shipped = True
    except Exception:
        # Context already stopped or file re-added with different
        # contents — the query will surface any real import failure;
        # deliberately NOT cached so the next call retries.
        pass


def apply_runtime_confs(spark: SparkSession, force: bool = False) -> None:
    """Apply required runtime confs to an externally-created session.

    Idempotent per session OBJECT (attribute-marked): this runs on every
    ``load_table`` call, and each ``conf.set`` is a Py4J round trip — at
    9 confs that is a measurable per-query tax for sub-100 ms operators.
    Nothing in this engine unsets a pinned conf mid-session; a pipeline
    that deliberately flips one (``scale_probes.scoped_confs`` restores
    what it scopes) can pass ``force=True`` to re-pin."""
    if not force and getattr(spark, "_nm_confs_applied", False):
        ensure_package_on_executors(spark)
        return
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf not settable at runtime in this build — ignore; the
            # build-time path in get_spark() covers our own sessions.
            pass
    spark._nm_confs_applied = True
    ensure_package_on_executors(spark)


#: Logger names whose WARN lines are EXPECTED under this engine's audited
#: plan shapes, muted only by explicit opt-in (bench/sweep harnesses):
#: - WindowExec "No Partition Defined" fires for the deliberate
#:   reduced-frame global windows (O(hours)/O(buckets)/dimension-sized
#:   frames, each inside the no-global-sort plan-guard allowlist — see
#:   docs/PLANS.md "Reduced-frame windows"); at those sizes a single
#:   partition IS the right plan and the warning is noise.
#: - ResolveWriteToStream / MicroBatchExecution warn that AQE is disabled
#:   for streaming — expected: AQE is set session-wide for batch and
#:   Spark turns it off per streaming query by design.
_EXPECTED_WARN_LOGGERS = (
    "org.apache.spark.sql.execution.window.WindowExec",
    "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
    "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
)


def quiet_expected_warnings(spark: SparkSession) -> None:
    """Raise the log threshold to ERROR for the audited-noise loggers only
    (never the root logger — real warnings elsewhere stay visible)."""
    try:
        jvm = spark.sparkContext._jvm
        level = jvm.org.apache.logging.log4j.Level.ERROR
        for name in _EXPECTED_WARN_LOGGERS:
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                name, level
            )
    except Exception:
        # log4j2 API not reachable (different binding) — purely cosmetic,
        # never worth failing a harness over.
        pass


def get_spark(
    app_name: str = "storm-netmonitor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    ``shuffle_partitions`` defaults to the core count so local shuffles
    neither starve nor over-split. On a real cluster both come from
    spark-submit instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(min(32, os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Arrow for pandas UDF / toPandas paths (§2.J, §2.K).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    apply_runtime_confs(spark)
    # Explicit caller choice wins over the RUNTIME_CONFS default.
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
