"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): the
netmonitor collector expressed as a first-class pluggable Spark source.

The reference system's collector samples per-host network counters on a
schedule (SURVEY §0.3's Storm metrics model — ``/proc/net/dev`` readings
shaped into DataPoint records). Here that collector IS a Spark data
source: ``spark.read.format("nm_counters")`` with one ``InputPartition``
per host, so a 1000-host fleet reads as 1000 parallel partitions with no
driver fan-in. The sample generator is pure integer arithmetic on
(host, sample-index) — deterministic, so the DuckDB oracle reproduces it
exactly with ``generate_series``.

In production the ``read()`` body would open the host's counter endpoint
(SSH/agent/scrape); the Spark-side contract — schema, partition planning,
executor-side iteration — is identical and is what this module proves.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Deterministic generator parameters (primes keep the sequences mixed).
N_HOSTS = 8
SAMPLES_PER_HOST = 1000
_P1 = 7919
_P2 = 104729
_MOD = 1_000_000

_SCHEMA = "host string, iface string, bytes_sent bigint, bytes_recv bigint"


class _HostPartition(InputPartition):
    def __init__(self, host_id: int):
        self.host_id = host_id


class CounterSampleReader(DataSourceReader):
    """Executor-side reader: one partition per monitored host."""

    def __init__(self, options):
        self.n_hosts = int(options.get("hosts", N_HOSTS))
        self.samples = int(options.get("samples", SAMPLES_PER_HOST))

    def partitions(self):
        return [_HostPartition(h) for h in range(self.n_hosts)]

    def read(self, partition: _HostPartition):
        h = partition.host_id
        for i in range(self.samples):
            yield (
                f"host{h}",
                f"eth{i % 2}",
                (h * _P1 + i * _P2) % _MOD,
                (h * _P2 + i * _P1) % _MOD,
            )


class CounterSampleStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of :class:`CounterSampleReader`: the collector as an
    UNBOUNDED source. The offset is the global sample index; each micro-batch
    advances it by ``batch_samples`` (a poll interval's worth of readings
    across every host), so the same deterministic sequence the batch reader
    emits all at once arrives here incrementally with exactly-once replay —
    ``readBetweenOffsets`` regenerates any [start, end) slice on recovery.
    The generator is pure integer arithmetic; in production ``read`` would
    poll the collector endpoints and offsets would be collector sequence
    numbers, with the same replay contract."""

    def __init__(self, options):
        self.n_hosts = int(options.get("hosts", N_HOSTS))
        self.samples = int(options.get("samples", SAMPLES_PER_HOST))
        # floor at 1: a 0 batch size would return the same offset forever
        # and the drain would spin to its timeout
        self.batch = max(
            1, int(options.get("batch_samples", max(1, self.samples // 4)))
        )

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, i: int, j: int):
        for k in range(i, j):
            for h in range(self.n_hosts):
                yield (
                    f"host{h}",
                    f"eth{k % 2}",
                    (h * _P1 + k * _P2) % _MOD,
                    (h * _P2 + k * _P1) % _MOD,
                )

    def read(self, start: dict):
        i = start["i"]
        j = min(i + self.batch, self.samples)
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator for replay, which generators can't do
        return iter(list(self._rows(i, j))), {"i": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["i"], end["i"])))


class CounterSampleSource(DataSource):
    """``format("nm_counters")`` — the collector as a pluggable source."""

    @classmethod
    def name(cls) -> str:
        return "nm_counters"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> CounterSampleReader:
        return CounterSampleReader(self.options)

    def simpleStreamReader(self, schema) -> CounterSampleStreamReader:
        return CounterSampleStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration of the custom format."""
    if not getattr(spark, "_nm_counters_registered", False):
        spark.dataSource.register(CounterSampleSource)
        spark._nm_counters_registered = True
