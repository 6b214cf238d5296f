#!/usr/bin/env python
"""Vanilla-PySpark baselines for the round-12 registrations (§2.AB/§2.AC).

Companion to `tools/baseline_r11_families.py` (read its docstring for
the method): the six round-12 ops get their BASELINE.md rows the round
they register, so the 2× criterion is evaluable for them from day one.
Same environment (`local[8]`, `shuffle.partitions=8`), same method
(1 warm-up, median of 3), same timed-region rule (the twin's timed
region re-executes exactly what the engine's bench sample does;
session-stable artifacts — the frozen LM, the Gopher flags table, the
staged backfill target — stage once untimed with plain code).

Twin renderings:

- `plan_incremental_backfill` — per-date count rollups of source and
  staged target joined and classified; plain expressions (the naive
  user reads the target's rows, not just its partition column);
- `plan_compaction` — hourly file census + a per-date running-sum
  window binning, plain ops;
- `audit_referential_integrity` — per FK edge a distinct-parent left
  join + conditional counts, float shares, 7-edge union;
- `text_ppl_frozen_score` — delta docs explode→join the frozen LM →
  per-doc agg with float -ln accumulation;
- `quality_gate_drift` — score BOTH populations the same way, join the
  staged Gopher flags, 4-cell census + float shares/flags;
- `stream_gate_scores` (drain) — per batch the same scoring pipeline,
  landed batch_id-keyed, fresh checkpoint per drain.

Only CONSTANTS are imported from the engine (splits, thresholds,
fixture dates) so parameters match.
"""
from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_netmonitor_spark.operators.corpus import (  # noqa: E402
    DUP_BIGRAM_MAX,
    TOP_WORD_MAX,
)
from storm_netmonitor_spark.operators.corpus2 import (  # noqa: E402
    _XENT_KEEP_MAX,
)
from storm_netmonitor_spark.operators.extensions11 import (  # noqa: E402
    _BF_STALE_FROM,
    _BF_STALE_TO,
    _BF_WATERMARK,
    _CPT_TARGET_ROWS,
    _RI_EDGES,
)
from storm_netmonitor_spark.operators.extensions12 import (  # noqa: E402
    _STREAM_GATE_BATCHES,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SPLIT_NUM, SPLIT_DEN = 4, 5

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("baseline-r12-families")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

DOCS = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
EVENTS = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).withColumn(
    "ts", F.col("ts").cast("timestamp")
)
TABLES = {
    t: spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
    for t in ("lineitem", "orders", "part", "supplier", "customer",
              "nation", "region")
}
D_SPLIT = (DOCS.agg(F.max("doc_id")).collect()[0][0] + 1) * SPLIT_NUM // SPLIT_DEN

# ---------------------------------------------------------------------------
# staged inputs (untimed)
# ---------------------------------------------------------------------------

print("staging: backfill target / frozen LM / gopher flags ...", file=sys.stderr)

_tgt_dir = os.path.join(tempfile.mkdtemp(prefix="bl_bf_tgt_"), "events_target")
(
    EVENTS.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
    .filter(F.col("event_date") < _BF_WATERMARK)
    .filter(
        ~(
            (F.col("event_date") >= _BF_STALE_FROM)
            & (F.col("event_date") < _BF_STALE_TO)
        )
        | (F.col("event_id") % 2 == 0)
    )
    .repartition("event_date")
    .write.mode("overwrite")
    .partitionBy("event_date")
    .parquet(_tgt_dir)
)

_toks = lambda df: df.select(
    "doc_id",
    F.explode(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    ).alias("w"),
)
_LM = (
    _toks(DOCS.filter(F.col("doc_id") < D_SPLIT))
    .groupBy("w")
    .agg(F.count("*").alias("cw"))
    .cache()
)
_LM_TOTAL = int(_LM.agg(F.sum("cw")).collect()[0][0])

# gopher flags, vanilla explode→groupBy rendering, staged once (the
# engine reads its maintained flags artifact)
_tk = DOCS.select("doc_id", F.split(F.lower("text"), " ").alias("tk"))
_words = _tk.select("doc_id", F.explode("tk").alias("w"))
_wtop = (
    _words.groupBy("doc_id", "w")
    .agg(F.count("*").alias("c"))
    .groupBy("doc_id")
    .agg(F.max("c").alias("top_c"), F.sum("c").alias("n"))
)
_bgs = _tk.select(
    "doc_id",
    F.explode(
        F.when(
            F.size("tk") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("tk", i), F.element_at("tk", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    ).alias("b"),
)
_dupb = (
    _bgs.groupBy("doc_id", "b")
    .agg(F.count("*").alias("c"))
    .groupBy("doc_id")
    .agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.sum("c")
        ).alias("dup_bg_frac")
    )
)
_GOPHER = (
    _wtop.join(_dupb, "doc_id", "left")
    .fillna(0.0, ["dup_bg_frac"])
    .select(
        "doc_id",
        (
            (F.col("top_c") / F.col("n") <= TOP_WORD_MAX)
            & (F.col("dup_bg_frac") <= DUP_BIGRAM_MAX)
        ).alias("gk"),
    )
    .cache()
)
_GOPHER.count()


def vanilla_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, oov_tokens, xent, keep) under the frozen LM —
    float -ln accumulation, OOV at the 1/total pseudo-count."""
    t = _toks(docs)
    joined = t.join(_LM, "w", "left")
    term = -F.log(
        F.coalesce(F.col("cw"), F.lit(1)).cast("double") / F.lit(float(_LM_TOTAL))
    )
    scored = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("cw").isNull(), 1).otherwise(0)).alias(
            "oov_tokens"
        ),
        F.avg(term).alias("xent"),
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("oov_tokens", F.lit(0)).alias("oov_tokens"),
        "xent",
        F.coalesce(F.col("xent") <= _XENT_KEEP_MAX, F.lit(False)).alias(
            "keep"
        ),
    )


# ---------------------------------------------------------------------------
# twins
# ---------------------------------------------------------------------------

# Non-RERUN ops: the engine's bench sample re-collects a PRE-BUILT
# DataFrame (BASELINE.md method: plan compilation amortized, execution
# measured), so these twins build their frame once here and the timed
# region is collect() — rebuilding per sample would bill Catalyst
# analysis to the baseline that the engine sample never pays.

def _build_plan_incremental_backfill() -> DataFrame:
    src = (
        EVENTS.select(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .groupBy("event_date")
        .agg(F.count("*").alias("n_src"))
    )
    tgt = (
        spark.read.parquet(_tgt_dir)
        .groupBy("event_date")
        .agg(F.count("*").alias("n_tgt"))
    )
    return (
        src.join(tgt, "event_date", "left")
        .fillna(0, ["n_tgt"])
        .select(
            "event_date",
            F.when(F.col("n_tgt") == 0, "missing")
            .when(F.col("n_tgt") != F.col("n_src"), "stale")
            .otherwise("current")
            .alias("status"),
            "n_src",
            "n_tgt",
        )
    )


def _build_plan_compaction() -> DataFrame:
    files = (
        EVENTS.select(
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            F.hour("ts").alias("hr"),
        )
        .groupBy("event_date", "hr")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_date")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = files.withColumn(
        "bin_id",
        (F.coalesce(F.sum("n").over(w), F.lit(0)) / _CPT_TARGET_ROWS)
        .cast("int"),
    )
    return packed.groupBy("event_date", "bin_id").agg(
        F.min("hr").alias("hr_from"),
        F.max("hr").alias("hr_to"),
        F.count("*").alias("n_files"),
        F.sum("n").alias("n_rows"),
    )


def _build_audit_referential_integrity() -> DataFrame:
    frames = []
    for child, ckey, parent, pkey in _RI_EDGES:
        c = TABLES[child].select(F.col(ckey).alias("k"))
        p = TABLES[parent].select(F.col(pkey).alias("pk")).distinct()
        j = c.join(p, c.k == p.pk, "left")
        frames.append(
            j.agg(
                F.lit(f"{child}.{ckey}").alias("fk_edge"),
                F.lit(f"{parent}.{pkey}").alias("parent_key"),
                F.count(F.lit(1)).alias("n_child"),
                F.count(F.when(F.col("k").isNull(), 1)).alias("n_null"),
                F.count(
                    F.when(F.col("k").isNotNull() & F.col("pk").isNull(), 1)
                ).alias("n_orphan"),
            ).withColumn("orphan_pct", F.col("n_orphan") / F.col("n_child"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _build_quality_gate_drift() -> DataFrame:
    sc = vanilla_score(DOCS)
    cells = sc.join(_GOPHER, "doc_id").select(
        (
            F.when(F.col("gk"), 2).otherwise(0)
            + F.when(F.col("keep"), 1).otherwise(0)
        ).alias("cid"),
        (F.col("doc_id") >= D_SPLIT).cast("int").alias("pop"),
    )
    census = (
        spark.range(4)
        .select(F.col("id").cast("int").alias("cid"))
        .join(
            cells.groupBy("cid").agg(
                F.sum(1 - F.col("pop")).alias("n_base"),
                F.sum("pop").alias("n_delta"),
            ),
            "cid",
            "left",
        )
        .fillna(0, ["n_base", "n_delta"])
    )
    tot = census.agg(
        F.sum("n_base").alias("tb"), F.sum("n_delta").alias("td")
    ).collect()[0]
    tb, td = int(tot["tb"]), int(tot["td"])
    return census.select(
        "cid",
        (F.col("cid") >= 2).alias("gopher_keep"),
        (F.col("cid") % 2 == 1).alias("ppl_keep"),
        "n_base",
        "n_delta",
        (F.col("n_base") / tb).alias("share_base"),
        (F.col("n_delta") / td).alias("share_delta"),
        (
            F.abs(F.col("n_delta") * tb - F.col("n_base") * td) * 200
            >= F.lit(tb) * td
        ).alias("drifted"),
    )


_PREBUILT = {
    "plan_incremental_backfill": _build_plan_incremental_backfill(),
    "plan_compaction": _build_plan_compaction(),
    "audit_referential_integrity": _build_audit_referential_integrity(),
    "text_ppl_frozen_score": vanilla_score(
        DOCS.filter(F.col("doc_id") >= D_SPLIT)
    ),
}


def _collector(name):
    return lambda: _PREBUILT[name].collect()


t_plan_incremental_backfill = _collector("plan_incremental_backfill")
t_plan_compaction = _collector("plan_compaction")
t_audit_referential_integrity = _collector("audit_referential_integrity")
t_text_ppl_frozen_score = _collector("text_ppl_frozen_score")


# r14 measurement-method parity: the engine's quality_gate_drift moved
# into bench RERUN_FULL (censuses collected during DataFrame
# construction, K-row drift tail computed driver-side, local-relation
# return), so its twin now REBUILDS per sample — vanilla full
# lifecycle: gate-plan construction, the totals collect, the final
# collect — matching the engine's timed region.
def t_quality_gate_drift():
    return _build_quality_gate_drift().collect()


_gate_docs = DOCS.filter(F.col("doc_id") >= D_SPLIT)
_gate_src = tempfile.mkdtemp(prefix="bl_gate_")
_rows = _gate_docs.orderBy("doc_id").collect()
_per = max(1, -(-len(_rows) // _STREAM_GATE_BATCHES))
for i in range(0, len(_rows), _per):
    spark.createDataFrame(_rows[i : i + _per], _gate_docs.schema).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(_gate_src, f"b{i // _per}"))


def t_stream_gate_scores():
    out_dir = tempfile.mkdtemp(prefix="bl_gate_out_")
    ckpt = tempfile.mkdtemp(prefix="bl_gate_ckpt_")

    def score(batch_df, batch_id):
        if not batch_df.take(1):
            return
        vanilla_score(batch_df).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        spark.readStream.schema(_gate_docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(_gate_src, "b*"))
        .writeStream.foreachBatch(score)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(os.path.join(out_dir, "batch_id=*")).collect()
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return rows


TWINS = {
    "plan_incremental_backfill": t_plan_incremental_backfill,
    "plan_compaction": t_plan_compaction,
    "audit_referential_integrity": t_audit_referential_integrity,
    "text_ppl_frozen_score": t_text_ppl_frozen_score,
    "quality_gate_drift": t_quality_gate_drift,
    "stream_gate_scores": t_stream_gate_scores,
}

# `--only=a,b` re-measures a subset (merge the emitted rows into the
# committed sidecar by hand) — staging still runs, the measure loop
# shrinks; used for the r14 method-parity re-measurement.
_only = [a for a in sys.argv[2:] if a.startswith("--only=")]
if _only:
    keep = set(_only[0].split("=", 1)[1].split(","))
    TWINS = {k: v for k, v in TWINS.items() if k in keep}

rows = {}
for name, fn in TWINS.items():
    fn()  # 1 warm-up
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(round((time.perf_counter() - t0) * 1000, 1))
    rows[name] = {
        "median_ms": statistics.median(samples),
        "samples_ms": samples,
    }
    print(f"{name}: {rows[name]}", file=sys.stderr)

print(
    json.dumps(
        {
            "metric": "baseline_r12_families",
            "unit": "ms",
            "sf_dir": SF_DIR,
            "env": "local[8], shuffle.partitions=8, vanilla renderings",
            "rows": rows,
        }
    )
)
