"""storm_netmonitor_spark — a PySpark-native analytics engine with the
capabilities of ``ale93p/storm-netmonitor`` (a Storm-cluster network-metrics
collector/aggregator), re-expressed Spark-first.

The reference mount (/root/reference) was empty when this engine was designed
(SURVEY.md §0), so capability parity targets the public Apache Storm
metrics-consumer surface (ingest → key → counter deltas → windowed
aggregation → rollups → top-k → threshold alerts → sinks) plus the driver's
relational-oracle contract and the LLM-data-pipeline extensions mandated by
BASELINE.json.

Layout:
    session.py    SparkSession factory + runtime confs (UTC, nanos shim, AQE)
    io.py         load_table() — the single ingestion point for all operators
    registry.py   @query decorator binding Spark callables to DuckDB oracles
    operators/    batch relational operators (SURVEY §2.A–2.H, §2.J)
    streaming/    Structured Streaming operators (SURVEY §2.I)
    functions/    shared helpers (oracle-stable numerics, text, vectors)
    kernels.py    public library facade — the reusable building blocks
                  behind the registry queries, for arbitrary DataFrames
"""

__version__ = "0.1.0"
