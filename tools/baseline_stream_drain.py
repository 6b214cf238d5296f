#!/usr/bin/env python
"""Measure the NAIVE-PySpark streaming-drain baseline for the tumbling
window query (BASELINE.md methodology addendum, VERDICT r5 #5).

BASELINE.md's `q_tumbling_window` row timed the BATCH rendering (one
`collect()` of an hourly GROUP BY). The engine's `stream_tumbling` is a
true Structured Streaming drain — `availableNow` micro-batch lifecycle,
watermark, stateful window store, memory sink — which carries a fixed
~0.4-0.6 s lifecycle floor that the batch number never pays. Comparing
the two is batch-vs-lifecycle, not engine-vs-engine.

This script measures the like-for-like baseline: the same hourly
tumbling aggregation written as PLAIN PySpark Structured Streaming (no
engine helpers, no plan cache, default state partitioning = the vanilla
user's rendering) under BASELINE.md's environment (local[8],
shuffle.partitions=8) and method (1 warm-up drain, median of 3 timed
drains, fresh checkpoint per drain). Output: one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def drain(spark: SparkSession, src_dir: str) -> float:
    ckpt = tempfile.mkdtemp(prefix="baseline_drain_ckpt_")
    t0 = time.perf_counter()
    schema = spark.read.parquet(src_dir).schema
    agg = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        # parquet infers TIMESTAMP_NTZ; event-time requires TIMESTAMP —
        # the cast any vanilla user must write
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("baseline_tumbling")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.table("baseline_tumbling").collect()
    wall = time.perf_counter() - t0
    spark.catalog.dropTempView("baseline_tumbling")
    shutil.rmtree(ckpt, ignore_errors=True)
    return wall


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("baseline-stream-drain")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # file streaming needs a DIRECTORY source; stage the single parquet
    # file into a temp dir (same trick the engine's events_stream uses)
    src = tempfile.mkdtemp(prefix="baseline_drain_src_")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"),
                os.path.join(src, "events.parquet"))

    drain(spark, src)  # 1 warm-up (BASELINE.md method)
    samples = [drain(spark, src) for _ in range(3)]
    shutil.rmtree(src, ignore_errors=True)
    print(json.dumps({
        "metric": "baseline_stream_drain_seconds",
        "value": round(statistics.median(samples), 4),
        "samples": [round(s, 4) for s in samples],
        "unit": "sec",
        "sf_dir": SF_DIR,
        "method": "vanilla PySpark availableNow drain, fresh checkpoint "
                  "per drain, plan rebuilt per drain, 1 warmup + median of 3",
    }))


if __name__ == "__main__":
    main()
