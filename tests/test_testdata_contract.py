"""Testdata drift detector.

The driver REGENERATES /root/testdata between rounds and has already
changed physical types once (round 3: events.ts TIMESTAMP(NANOS) →
TIMESTAMP(MICROS), orders/lineitem dates ms → µs). Silent type drift
surfaces as cryptic oracle hash mismatches; this test pins the contract
the engine adapts around and fails with a direct message when the
generator changes again.

Unit-agnostic on purpose: timestamp columns may be ns/us/ms (io.load_table
and streaming.core.events_ts_unit adapt); integer widths and column NAMES
must hold exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from storm_netmonitor_spark.io import TABLES, table_path

from .conftest import SF_CORRECT

#: column -> kind; kind 'ts' accepts any timestamp unit, 'int' any integer
#: width, others are exact arrow type names.
_EXPECT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "int", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "ts",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string", "l_shipdate": "ts",
    },
    "events": {
        "event_id": "int", "ts": "ts", "user_id": "int",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "int", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int",
    },
    "embeddings": {"vec_id": "int", "embedding": "vec", "label": "int"},
}


def _kind(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"  # would need load_table normalization — fail loudly
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) and pa.types.is_floating(t.value_type):
        return "vec"
    return str(t)


def test_testdata_schema_contract():
    problems = []
    for table in TABLES:
        schema = pq.ParquetFile(table_path(SF_CORRECT, table)).schema_arrow
        got = {f.name: _kind(f.type) for f in schema}
        want = _EXPECT[table]
        if got != want:
            problems.append(
                f"{table}: generator drift — got {got}, engine contract "
                f"expects {want}. Adapt io.load_table / oracles BEFORE "
                f"debugging hash mismatches."
            )
    assert not problems, "\n".join(problems)


def test_events_ts_unit_detection_matches_file():
    from storm_netmonitor_spark.streaming.core import events_ts_unit

    t = pq.ParquetFile(table_path(SF_CORRECT, "events")).schema_arrow.field("ts").type
    assert events_ts_unit(SF_CORRECT) == t.unit
