#!/usr/bin/env python
"""Vanilla-PySpark baselines for the round-15 candidate batches
(§2.AL–§2.AQ), pre-built at round-14 close per the SURVEY §7.1
checklist so the eighteen ops get their BASELINE.md rows the round
they register.

Method = `tools/baseline_r11_families.py` (read its docstring): same
environment (`local[8]`, `shuffle.partitions=8`), same 1-warm-up /
median-of-3, same timed-region rule — batch censuses prebuild their
frame and time `collect()` (the engine-sample method); the three
ingest gates are drain-vs-drain (the full micro-batch drain is the
timed region on both sides); the split-leakage twin stages the
verified near-dup pair artifact UNTIMED (the engine reads the same
pairs from its artifact store). Renderings are what a vanilla
engineer writes: plain double arithmetic, no decimal-stable helpers,
positional-join dots for the pairwise sims. Only CONSTANTS are
imported from the engine.

Usage: python tools/baseline_r15_families.py [SF_DIR]
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession, Window, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_netmonitor_spark.operators.extensions21 import (  # noqa: E402
    _KFOLD_K,
    _TSPLIT_CUTOFF,
)
from storm_netmonitor_spark.operators.extensions22 import (  # noqa: E402
    _DRIFT_EPOCHS,
    _PREFIX_DEN,
    _RESAMPLE_BUDGET,
    _STAGE_BOUNDS,
    _STAGE_LABELS,
    _W_SCALE,
)
from storm_netmonitor_spark.operators.extensions23 import (  # noqa: E402
    _HUB_K,
    _MARGIN_SCALE,
    _Q_MOD,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("baseline-r15-families")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

DOCS = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
EMB = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
EVENTS = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).withColumn(
    "ts", F.col("ts").cast("timestamp")
)

_N_SHARDS = 16  # = extensions3._N_SHARDS (constant parity)


# -- §2.AL twins --------------------------------------------------------------

_SPLIT_OF = (
    "CASE WHEN substr(md5(CAST({c} AS STRING)), 1, 1) BETWEEN '0' AND 'b'"
    " THEN 'train' WHEN substr(md5(CAST({c} AS STRING)), 1, 1) IN ('c','d')"
    " THEN 'val' ELSE 'test' END"
)


def build_split_leakage(pairs):
    sp = pairs.select(
        "doc_a",
        "doc_b",
        F.expr(
            "least(" + _SPLIT_OF.format(c="doc_a") + ", "
            + _SPLIT_OF.format(c="doc_b") + ")"
        ).alias("split_a"),
        F.expr(
            "greatest(" + _SPLIT_OF.format(c="doc_a") + ", "
            + _SPLIT_OF.format(c="doc_b") + ")"
        ).alias("split_b"),
    )
    byp = sp.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    bd = (
        sp.select(
            "split_a", "split_b",
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    tot = sp.agg(F.count(F.lit(1)).alias("t"))
    return (
        byp.join(bd, ["split_a", "split_b"])
        .crossJoin(tot)
        .select(
            "split_a", "split_b", "n_pairs", "n_docs",
            F.when(F.col("split_a") != F.col("split_b"), 1)
            .otherwise(0)
            .alias("cross_split"),
            (F.col("n_pairs") / F.col("t")).alias("pair_share_pct"),
        )
    )


def build_kfold_balance():
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _KFOLD_K
    )
    cell = (
        DOCS.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    srct = cell.groupBy("source").agg(F.sum("n_docs").alias("src_n"))
    return cell.join(srct, "source").select(
        "fold", "source", "n_docs", "n_chars",
        (F.col("n_docs") / F.col("src_n")).alias("fold_share_pct"),
    )


def build_temporal_split():
    cut = F.to_timestamp(F.lit(_TSPLIT_CUTOFF))
    cls = EVENTS.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("ht"),
        F.max(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("he"),
    )
    seg = cls.select(
        F.when((F.col("ht") == 1) & (F.col("he") == 1), "straddle")
        .when(F.col("ht") == 1, "train_only")
        .otherwise("eval_only")
        .alias("segment"),
        "n_ev",
    )
    agg = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n_ev").alias("n_events")
    )
    tot = agg.agg(F.sum("n_events").alias("t"))
    return agg.crossJoin(tot).select(
        "segment", "n_users", "n_events",
        (F.col("n_events") / F.col("t")).alias("events_share_pct"),
    )


# -- §2.AM twins --------------------------------------------------------------

def build_temperature_resample():
    src = DOCS.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = src.select(
        "source", "n_docs",
        F.floor(F.sqrt(F.col("n_docs")) * _W_SCALE).alias("wm"),
    )
    ws = Window.partitionBy()
    base = w.select(
        "source", "n_docs", "wm",
        F.expr(
            f"CAST({_RESAMPLE_BUDGET} * wm AS BIGINT) DIV SUM(wm) OVER ()"
        ).alias("floor_n"),
        ((F.lit(_RESAMPLE_BUDGET) * F.col("wm")) % F.sum("wm").over(ws)).alias(
            "rem"
        ),
        F.sum("n_docs").over(ws).alias("n"),
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("rem"), "source"))
        .alias("rk"),
        (F.lit(_RESAMPLE_BUDGET) - F.sum("floor_n").over(ws)).alias("lo"),
    )
    alloc = F.col("floor_n") + F.when(F.col("rk") <= F.col("lo"), 1).otherwise(0)
    return ranked.select(
        "source", "n_docs", "wm",
        alloc.alias("alloc_n"),
        (alloc / _RESAMPLE_BUDGET).alias("alloc_share_pct"),
        (F.col("n_docs") / F.col("n")).alias("corpus_share_pct"),
    )


def build_curriculum_stages():
    b1, b2, b3 = _STAGE_BOUNDS
    toks = DOCS.select(
        F.size(F.expr("array_remove(split(lower(text), ' '), '')")).alias(
            "tok_n"
        )
    )
    staged = toks.select(
        F.when(F.col("tok_n") < b1, 1)
        .when(F.col("tok_n") < b2, 2)
        .when(F.col("tok_n") < b3, 3)
        .otherwise(4)
        .alias("stage"),
        "tok_n",
    )
    census = staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tok_n").alias("n_tokens")
    )
    lab = spark.createDataFrame(
        [(i + 1, l) for i, l in enumerate(_STAGE_LABELS)],
        "stage int, stage_label string",
    )
    wc = Window.partitionBy().orderBy("stage")
    ws = Window.partitionBy()
    return (
        census.select(
            "stage", "n_docs", "n_tokens",
            F.sum("n_docs").over(wc).alias("cum_docs"),
            F.sum("n_tokens").over(wc).alias("cum_tokens"),
            (F.col("n_tokens") / F.sum("n_tokens").over(ws)).alias(
                "token_share_pct"
            ),
        )
        .join(lab, "stage")
    )


def build_epoch_mix_drift():
    ep = spark.createDataFrame(
        [(e,) for e in _DRIFT_EPOCHS], "epoch int"
    )
    assigned = DOCS.select(
        "doc_id", "source",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % _N_SHARDS
        ).alias("shard"),
    )
    wsrt = Window.partitionBy("epoch", "shard").orderBy(
        F.md5(
            F.concat(
                F.lit("epoch"), F.col("epoch").cast("string"), F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ),
        "doc_id",
    )
    wcnt = Window.partitionBy("epoch", "shard")
    ordered = assigned.crossJoin(ep).select(
        "epoch", "shard", "source",
        F.row_number().over(wsrt).alias("pos"),
        F.count(F.lit(1)).over(wcnt).alias("shard_n"),
    )
    prefix = ordered.filter(
        F.col("pos")
        <= F.expr(f"CAST(shard_n + {_PREFIX_DEN - 1} AS BIGINT) DIV {_PREFIX_DEN}")
    )
    pc = prefix.groupBy("epoch", "source").agg(
        F.count(F.lit(1)).alias("n_prefix")
    )
    ptot = pc.groupBy("epoch").agg(F.sum("n_prefix").alias("p"))
    sc = DOCS.groupBy("source").agg(F.count(F.lit(1)).alias("src_n"))
    tot = DOCS.agg(F.count(F.lit(1)).alias("n"))
    return (
        pc.join(ptot, "epoch")
        .join(sc, "source")
        .crossJoin(tot)
        .select(
            "epoch", "source", "n_prefix",
            (F.col("n_prefix") / F.col("p")).alias("prefix_share_pct"),
            (F.col("src_n") / F.col("n")).alias("corpus_share_pct"),
            (
                F.col("n_prefix") / F.col("p") - F.col("src_n") / F.col("n")
            ).alias("drift_ppm"),
        )
    )


# -- §2.AN twins (positional-join dots — the vanilla pairwise rendering) -----

def _sims():
    qe = EMB.filter(F.col("vec_id") % _Q_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.posexplode("embedding").alias("pos", "qx"),
    )
    ee = EMB.filter(F.col("vec_id") % _Q_MOD != 0).select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    )
    return (
        ee.join(qe, "pos")
        .groupBy("q_id", "vec_id")
        .agg(
            F.sum(
                F.col("x").cast("double") * F.col("qx").cast("double")
            ).alias("sim")
        )
    )


def build_energy_concentration():
    cells = EMB.select(F.posexplode("embedding").alias("pos0", "x")).select(
        (F.col("pos0") + 1).alias("pos"),
        (F.col("x").cast("double") * F.col("x").cast("double")).alias("e"),
    )
    dim = cells.groupBy("pos").agg(F.sum("e").alias("e"))
    wr = Window.partitionBy().orderBy(F.desc("e"), "pos")
    ws = Window.partitionBy()
    return dim.select(
        "pos", "e",
        F.row_number().over(wr).alias("energy_rank"),
        (
            F.sum("e").over(wr.rowsBetween(Window.unboundedPreceding, 0))
            / F.sum("e").over(ws)
        ).alias("cum_energy_share_pct"),
        (F.col("e") / F.sum("e").over(ws)).alias("energy_share_pct"),
    )


def build_nn_margin():
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    top2 = (
        _sims()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("q_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("sim"))).alias("s1"),
            F.max(F.when(F.col("rn") == 2, F.col("sim"))).alias("s2"),
        )
    )
    census = (
        top2.select(
            F.floor((F.col("s1") - F.col("s2")) * _MARGIN_SCALE).alias(
                "margin_band"
            )
        )
        .groupBy("margin_band")
        .agg(F.count(F.lit(1)).alias("n_queries"))
    )
    tot = census.agg(F.sum("n_queries").alias("t"))
    return census.crossJoin(tot).select(
        "margin_band", "n_queries",
        (F.col("n_queries") / F.col("t")).alias("query_share_pct"),
    )


def build_hubness():
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    occ = (
        _sims()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HUB_K)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("k_occ"))
    )
    cand = EMB.filter(F.col("vec_id") % _Q_MOD != 0).select("vec_id")
    kf = cand.join(occ, "vec_id", "left").select(
        F.coalesce("k_occ", F.lit(0)).alias("k_occurrence")
    )
    census = kf.groupBy("k_occurrence").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = census.agg(F.sum("n_vecs").alias("t"))
    return census.crossJoin(tot).select(
        "k_occurrence", "n_vecs",
        (F.col("n_vecs") / F.col("t")).alias("vec_share_pct"),
    )


# -- §2.AO stream twins (drain-vs-drain, batch_id-keyed landings) ------------

_D_SPLIT = (DOCS.agg(F.max("doc_id")).collect()[0][0] + 1) * 4 // 5
_V_SPLIT = (EMB.agg(F.max("vec_id")).collect()[0][0] + 1) * 4 // 5
_GATE_BATCHES = 2  # = extensions12._STREAM_GATE_BATCHES (constant parity)


def _stage_stream(df, order_col, n_batches, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    rows = df.orderBy(order_col).collect()
    per = max(1, -(-len(rows) // n_batches))
    for i in range(0, len(rows), per):
        spark.createDataFrame(rows[i : i + per], df.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(d, f"b{i // per}"))
    return d


_doc_stream = _stage_stream(
    DOCS.filter(F.col("doc_id") >= _D_SPLIT), "doc_id", _GATE_BATCHES,
    "bl15_docs_",
)
_vec_stream = _stage_stream(
    EMB.filter(F.col("vec_id") >= _V_SPLIT), "vec_id", _GATE_BATCHES,
    "bl15_vecs_",
)


def _drain(src, schema_df, fn):
    ckpt = tempfile.mkdtemp(prefix="bl15_ckpt_")
    q = (
        spark.readStream.schema(schema_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b*"))
        .writeStream.foreachBatch(fn)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)


# standing artifacts: session-stable inputs the engine reads from its
# store — staged once UNTIMED
_STANDING = DOCS.filter(F.col("doc_id") < _D_SPLIT)
# plain rendering of the standing allocation target
_src = _STANDING.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
_w = _src.select(
    "source", F.floor(F.sqrt(F.col("n_docs")) * _W_SCALE).alias("wm")
)
_ws = Window.partitionBy()
_base = _w.select(
    "source", "wm",
    F.expr(
        f"CAST({_RESAMPLE_BUDGET} * wm AS BIGINT) DIV SUM(wm) OVER ()"
    ).alias("floor_n"),
    ((F.lit(_RESAMPLE_BUDGET) * F.col("wm")) % F.sum("wm").over(_ws)).alias(
        "rem"
    ),
)
_ranked = _base.select(
    "*",
    F.row_number()
    .over(Window.partitionBy().orderBy(F.desc("rem"), "source"))
    .alias("rk"),
    (F.lit(_RESAMPLE_BUDGET) - F.sum("floor_n").over(_ws)).alias("lo"),
)
_MIX_TARGET = _ranked.select(
    "source",
    (
        (
            F.col("floor_n")
            + F.when(F.col("rk") <= F.col("lo"), 1).otherwise(0)
        )
        / _RESAMPLE_BUDGET
    ).alias("target_share_pct"),
).cache()
_MIX_TARGET.collect()

_b1, _b2, _b3 = _STAGE_BOUNDS
_st_census = (
    _STANDING.select(
        F.size(F.expr("array_remove(split(lower(text), ' '), '')")).alias(
            "tok_n"
        )
    )
    .select(
        F.when(F.col("tok_n") < _b1, 1)
        .when(F.col("tok_n") < _b2, 2)
        .when(F.col("tok_n") < _b3, 3)
        .otherwise(4)
        .alias("stage"),
        "tok_n",
    )
    .groupBy("stage")
    .agg(F.sum("tok_n").alias("n_tokens"))
)
_STAGE_SHARES = (
    _st_census.crossJoin(_st_census.agg(F.sum("n_tokens").alias("t")))
    .select(
        "stage",
        (F.col("n_tokens") / F.col("t")).alias("standing_token_share_pct"),
    )
    .cache()
)
_STAGE_SHARES.collect()

_ENERGY_SHARES = (
    EMB.filter(F.col("vec_id") < _V_SPLIT)
    .select(F.posexplode("embedding").alias("pos0", "x"))
    .select(
        (F.col("pos0") + 1).alias("pos"),
        (F.col("x").cast("double") * F.col("x").cast("double")).alias("e"),
    )
    .groupBy("pos")
    .agg(F.sum("e").alias("e"))
)
_ENERGY_SHARES = (
    _ENERGY_SHARES.crossJoin(_ENERGY_SHARES.agg(F.sum("e").alias("t")))
    .select("pos", (F.col("e") / F.col("t")).alias("standing_share_pct"))
    .cache()
)
_ENERGY_SHARES.collect()


def t_stream_mixture_gate():
    out_dir = tempfile.mkdtemp(prefix="bl15_mg_")

    def gate(batch_df, batch_id):
        if not batch_df.take(1):
            return
        batch_df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs")
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    _drain(_doc_stream, DOCS, gate)
    folded = (
        spark.read.parquet(os.path.join(out_dir, "batch_id=*"))
        .groupBy("source")
        .agg(F.sum("n_docs").alias("n_docs_delta"))
    )
    tot = folded.agg(F.sum("n_docs_delta").alias("t"))
    rows = (
        folded.crossJoin(tot)
        .join(_MIX_TARGET, "source")
        .select(
            "source", "n_docs_delta",
            (F.col("n_docs_delta") / F.col("t")).alias("delta_share_pct"),
            "target_share_pct",
            (
                F.col("n_docs_delta") / F.col("t")
                - F.col("target_share_pct")
            ).alias("drift_ppm"),
        )
        .collect()
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    return rows


def t_stream_curriculum_gate():
    out_dir = tempfile.mkdtemp(prefix="bl15_cg_")

    def gate(batch_df, batch_id):
        if not batch_df.take(1):
            return
        (
            batch_df.select(
                F.size(
                    F.expr("array_remove(split(lower(text), ' '), '')")
                ).alias("tok_n")
            )
            .select(
                F.when(F.col("tok_n") < _b1, 1)
                .when(F.col("tok_n") < _b2, 2)
                .when(F.col("tok_n") < _b3, 3)
                .otherwise(4)
                .alias("stage"),
                "tok_n",
            )
            .groupBy("stage")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("tok_n").alias("n_tokens"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    _drain(_doc_stream, DOCS, gate)
    folded = (
        spark.read.parquet(os.path.join(out_dir, "batch_id=*"))
        .groupBy("stage")
        .agg(
            F.sum("n_docs").alias("n_docs_delta"),
            F.sum("n_tokens").alias("n_tokens_delta"),
        )
    )
    tot = folded.agg(F.sum("n_tokens_delta").alias("t"))
    rows = (
        folded.crossJoin(tot)
        .join(_STAGE_SHARES, "stage")
        .select(
            "stage", "n_docs_delta", "n_tokens_delta",
            (F.col("n_tokens_delta") / F.col("t")).alias(
                "delta_token_share_pct"
            ),
            "standing_token_share_pct",
            (
                F.col("n_tokens_delta") / F.col("t")
                - F.col("standing_token_share_pct")
            ).alias("drift_ppm"),
        )
        .collect()
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    return rows


def t_stream_energy_gate():
    out_dir = tempfile.mkdtemp(prefix="bl15_eg_")

    def gate(batch_df, batch_id):
        if not batch_df.take(1):
            return
        (
            batch_df.select(F.posexplode("embedding").alias("pos0", "x"))
            .select(
                (F.col("pos0") + 1).alias("pos"),
                (F.col("x").cast("double") * F.col("x").cast("double")).alias(
                    "e"
                ),
            )
            .groupBy("pos")
            .agg(F.sum("e").alias("e"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    _drain(_vec_stream, EMB, gate)
    folded = (
        spark.read.parquet(os.path.join(out_dir, "batch_id=*"))
        .groupBy("pos")
        .agg(F.sum("e").alias("e_delta"))
    )
    tot = folded.agg(F.sum("e_delta").alias("t"))
    rows = (
        folded.crossJoin(tot)
        .join(_ENERGY_SHARES, "pos")
        .select(
            "pos", "e_delta",
            (F.col("e_delta") / F.col("t")).alias("delta_share_pct"),
            "standing_share_pct",
            (
                F.col("e_delta") / F.col("t") - F.col("standing_share_pct")
            ).alias("drift_ppm"),
        )
        .collect()
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    return rows


# -- §2.AP twins --------------------------------------------------------------

LINEITEM = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
ORDERS = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def _edges_plain():
    return LINEITEM.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()


def build_degree_census():
    e = _edges_plain()
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("src").alias("side"), "degree")
        .unionByName(
            e.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .select(F.lit("dst").alias("side"), "degree")
        )
    )
    census = deg.groupBy("side", "degree").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    st = census.groupBy("side").agg(F.sum("n_nodes").alias("t"))
    return census.join(st, "side").select(
        "side", "degree", "n_nodes",
        (F.col("n_nodes") / F.col("t")).alias("node_share_pct"),
    )


def t_kcore_decompose():
    # RERUN class: the per-round census fetches are driver decisions,
    # so the twin reruns the whole peel per sample (engine-sample
    # method parity) — same loop, plain ops, no lineage truncation
    k, rounds = 30, 4  # = extensions25 constants (constant parity)
    u = _edges_plain().selectExpr("src AS a", "dst AS b").unionByName(
        _edges_plain().selectExpr("dst AS a", "src AS b")
    )
    out = []
    for r in range(1, rounds + 1):
        deg = u.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        rm = deg.filter(F.col("deg") < k).select("a")
        u = (
            u.join(rm, "a", "left_anti")
            .join(rm.withColumnRenamed("a", "b"), "b", "left_anti")
            .select("a", "b")
        )
        stats = u.agg(
            F.countDistinct("a").alias("n"),
            (F.count(F.lit(1)) / 2).alias("m"),
        ).collect()[0]
        out.append((r, rm.count(), stats["n"], stats["m"]))
    return out


def build_column_profile():
    cols = (
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = ORDERS.agg(*aggs)
    stack = ", ".join(f"'{c}', __nn_{c}, __nd_{c}" for c in cols)
    long = one.selectExpr(
        "__rows",
        f"stack({len(cols)}, {stack}) AS (column_name, n_nonnull, n_distinct)",
    )
    return long.select(
        "column_name", "__rows",
        (F.col("__rows") - F.col("n_nonnull")).alias("n_nulls"),
        ((F.col("__rows") - F.col("n_nonnull")) / F.col("__rows")).alias(
            "null_ppm"
        ),
        "n_distinct",
    )


# -- §2.AQ twins --------------------------------------------------------------

CUSTOMER = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))


def build_t_closeness():
    sens = F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)")
    rows_f = CUSTOMER.select("c_nationkey", "c_mktsegment", sens.alias("b"))
    gb = rows_f.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    tot = gb.agg(F.sum("nb").alias("n"), F.count(F.lit(1)).alias("nbk"))
    grp = rows_f.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("g")
    )
    cell = rows_f.groupBy("c_nationkey", "c_mktsegment", "b").agg(
        F.count(F.lit(1)).alias("ngb")
    )
    grid = (
        grp.crossJoin(gb)
        .join(cell, ["c_nationkey", "c_mktsegment", "b"], "left")
        .crossJoin(tot)
        .select(
            "c_nationkey", "c_mktsegment", "g", "b", "nb", "n", "nbk",
            F.coalesce("ngb", F.lit(0)).alias("ngb"),
        )
    )
    wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "b"
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "c_nationkey", "c_mktsegment", "g", "n", "nbk",
        F.sum(
            F.col("ngb") / F.col("g") - F.col("nb") / F.col("n")
        ).over(wc).alias("c"),
    )
    dgrp = cum.groupBy("c_nationkey", "c_mktsegment", "g", "nbk").agg(
        F.sum(F.abs(F.col("c"))).alias("d")
    )
    emds = dgrp.select(
        "g",
        (F.col("d") / (F.col("nbk") - 1)).alias("emd"),
    )
    above = F.col("emd") > 0.35
    return emds.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(above, 1)).alias("groups_above_t"),
        F.coalesce(F.sum(F.when(above, F.col("g"))), F.lit(0)).alias(
            "rows_at_risk"
        ),
        F.max("emd").alias("max_emd"),
        F.sum("g").alias("n_rows"),
    )


def build_reservoir():
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("r15|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        DOCS.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


def build_benford():
    import math as _m

    v = ORDERS.filter(F.col("o_totalprice") > 0).select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        ).alias("digit")
    )
    census = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    bf = spark.createDataFrame(
        [(d, _m.log10(1 + 1 / d)) for d in range(1, 10)],
        "digit long, benford double",
    )
    tot = census.agg(F.sum("n").alias("t"))
    return (
        bf.join(census, "digit", "left")
        .crossJoin(tot)
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            (F.coalesce("n", F.lit(0)) / F.col("t")).alias("share"),
            "benford",
            (F.coalesce("n", F.lit(0)) / F.col("t") - F.col("benford")).alias(
                "dev"
            ),
        )
    )


RERUN = {
    "stream_mixture_gate": t_stream_mixture_gate,
    "stream_curriculum_gate": t_stream_curriculum_gate,
    "stream_energy_gate": t_stream_energy_gate,
    "graph_kcore_decompose": t_kcore_decompose,
}

rows: dict[str, dict] = {}
for name, fn in RERUN.items():
    fn()  # warm-up
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
    "staging: verified near-dup pairs (untimed, plain code — the "
    "engine reads the same pairs from its artifact store)",
    file=sys.stderr,
)
_tk = DOCS.select(
    "doc_id", "lang", "source",
    F.expr("array_remove(split(lower(text), ' '), '')").alias("tk"),
)
_dg = _tk.select(
    "doc_id", "lang", "source",
    F.explode(
        F.expr(
            "CASE WHEN size(tk) >= 3 THEN"
            " array_distinct(transform(sequence(1, size(tk) - 2),"
            " i -> concat_ws(' ', slice(tk, i, 3))))"
            " ELSE CAST(array() AS array<string>) END"
        )
    ).alias("gram"),
)
_kept = _dg.join(
    _dg.groupBy("lang", "source", "gram")
    .agg(F.count(F.lit(1)).alias("df"))
    .filter(F.col("df") <= 1000)
    .select("lang", "source", "gram"),
    ["lang", "source", "gram"],
)
_sizes = _kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
_ka, _kb = _kept.alias("ka"), _kept.alias("kb")
_raw_pairs = (
    _ka.join(
        _kb,
        (F.col("ka.lang") == F.col("kb.lang"))
        & (F.col("ka.source") == F.col("kb.source"))
        & (F.col("ka.gram") == F.col("kb.gram"))
        & (F.col("ka.doc_id") < F.col("kb.doc_id")),
    )
    .groupBy(
        F.col("ka.doc_id").alias("doc_a"), F.col("kb.doc_id").alias("doc_b")
    )
    .agg(F.count(F.lit(1)).alias("n_inter"))
)
_pairs = (
    _raw_pairs.join(
        _sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
        "doc_a",
    )
    .join(
        _sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
        "doc_b",
    )
    .select(
        "doc_a", "doc_b",
        (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
        .alias("jaccard"),
    )
    .filter(F.col("jaccard") >= 0.05)
    .select("doc_a", "doc_b")
    .cache()
)
_pairs.collect()

PREBUILT = {
    "sample_split_leakage": build_split_leakage(_pairs),
    "sample_kfold_balance": build_kfold_balance(),
    "pipeline_temporal_split_gate": build_temporal_split(),
    "sample_temperature_resample": build_temperature_resample(),
    "pipeline_curriculum_stages": build_curriculum_stages(),
    "pipeline_epoch_mix_drift": build_epoch_mix_drift(),
    "vec_energy_concentration": build_energy_concentration(),
    "vec_nn_margin_census": build_nn_margin(),
    "vec_hubness_census": build_hubness(),
    "graph_degree_census": build_degree_census(),
    "quality_column_profile": build_column_profile(),
    "agg_t_closeness": build_t_closeness(),
    "sample_reservoir_hash": build_reservoir(),
    "agg_benford_deviation": build_benford(),
}
for name, frame in PREBUILT.items():
    frame.collect()  # warm-up (plan amortized, the engine-sample method)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        frame.collect()
        samples.append(round((time.perf_counter() - t0) * 1000, 1))
    rows[name] = {
        "median_ms": statistics.median(samples),
        "samples_ms": samples,
    }
    print(f"{name}: {rows[name]}", file=sys.stderr)

print(
    json.dumps(
        {
            "metric": "baseline_r15_families",
            "unit": "ms",
            "sf_dir": SF_DIR,
            "env": "local[8], shuffle.partitions=8, vanilla renderings",
            "rows": rows,
        }
    )
)
