"""Custom Python DataSource (sources/pysource.py) — batch + streaming.

The streaming reader must deliver EXACTLY the batch reader's multiset
(same deterministic generator, arriving incrementally), the drain must be
run-to-run deterministic, and replay (``readBetweenOffsets``) must
regenerate any slice bit-identically — the exactly-once contract a real
collector transport needs.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from storm_netmonitor_spark.registry import QUERIES
from storm_netmonitor_spark.sources.pysource import (
    N_HOSTS,
    SAMPLES_PER_HOST,
    CounterSampleStreamReader,
    register,
)

from .conftest import SF_CORRECT


def _batch_agg(spark):
    register(spark)
    return (
        spark.read.format("nm_counters")
        .load()
        .groupBy("host", "iface")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("bytes_sent").alias("sum_sent"),
            F.sum("bytes_recv").alias("sum_recv"),
        )
    )


def test_batch_source_shape(spark):
    register(spark)
    df = spark.read.format("nm_counters").load()
    assert df.count() == N_HOSTS * SAMPLES_PER_HOST
    assert df.select("host").distinct().count() == N_HOSTS
    # one partition per host — the no-driver-fan-in property
    assert df.rdd.getNumPartitions() == N_HOSTS


def test_stream_equals_batch(spark):
    got = {
        tuple(r): None
        for r in QUERIES["source_stream_custom"](spark, SF_CORRECT).collect()
    }
    want = {tuple(r): None for r in _batch_agg(spark).collect()}
    assert got.keys() == want.keys()


def test_stream_drain_deterministic(spark):
    a = sorted(map(tuple, QUERIES["source_stream_custom"](spark, SF_CORRECT).collect()))
    b = sorted(map(tuple, QUERIES["source_stream_custom"](spark, SF_CORRECT).collect()))
    assert a == b


def test_read_between_offsets_replays_exact_slices():
    r = CounterSampleStreamReader({})
    it, nxt = r.read({"i": 0})
    first = list(it)
    assert nxt == {"i": SAMPLES_PER_HOST // 4}
    replay = list(r.readBetweenOffsets({"i": 0}, nxt))
    assert first == replay
    # a mid-stream slice replays identically too
    mid = list(r.readBetweenOffsets({"i": 7}, {"i": 9}))
    it2, _ = r.read({"i": 7})
    assert mid == list(it2)[: len(mid)]


def test_offsets_saturate_at_sample_cap():
    r = CounterSampleStreamReader({"samples": "10", "batch_samples": "4"})
    off = {"i": 0}
    seen = 0
    for _ in range(5):
        rows, off = r.read(off)
        seen += len(list(rows))
    assert off == {"i": 10}
    assert seen == 10 * N_HOSTS


def test_kafka_payload_decode_roundtrip(spark):
    # The broker is env-gated, but the decode path is pure Spark SQL:
    # serialize real events rows to Kafka-shaped (binary value) JSON
    # records, run the SAME parse the stream uses, and require a lossless
    # round-trip of every column.
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.streaming.kafka_twin import (
        WIRE_TS_FORMAT,
        parse_event_records,
    )

    e = load_table(spark, SF_CORRECT, "events").limit(500)
    wire = e.select(
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
            {"timestampFormat": WIRE_TS_FORMAT},
        ).cast("binary").alias("value")
    )
    back = parse_event_records(wire)
    assert [f.name for f in back.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    want = sorted(map(tuple, e.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_kafka_twin_gated_without_broker(spark):
    from storm_netmonitor_spark.streaming import kafka_twin

    assert not kafka_twin.kafka_available()
    with pytest.raises(RuntimeError, match="no Kafka broker"):
        kafka_twin.events_stream_kafka(spark)


@pytest.mark.skipif(
    not os.environ.get("NM_KAFKA_BOOTSTRAP"), reason="no Kafka broker in env"
)
def test_kafka_twin_reads_events(spark):
    from storm_netmonitor_spark.streaming import kafka_twin

    df = kafka_twin.events_stream_kafka(spark)
    assert set(df.columns) == {
        "event_id", "ts", "user_id", "event_type", "value", "props",
    }
