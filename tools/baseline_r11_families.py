#!/usr/bin/env python
"""Vanilla-PySpark baselines for the r11 bench families (VERDICT r11 #3).

The 13 bench rows registered in round 11 (index lifecycle, monitoring,
evaluation, retraction, serving) had no BASELINE.md row, so the 2×
criterion was unevaluable for them. This script measures the missing
baselines under BASELINE.md's environment (`local[8]`,
`spark.sql.shuffle.partitions=8`) and method (1 warm-up, median of 3
timed runs) — each twin is the SAME task over the SAME data with the
SAME parameters, written as a plain PySpark user would write it: no
engine kernels, no Arrow routing passes, no plan cache, no decimal
accumulators — textbook DataFrame renderings (explode-based vector
dots, explode→groupBy MinHash, iterative min-label propagation, full
rewrites).

Timed-region rule (the `baseline_stream_drain.py` drain-vs-drain
principle extended): the twin's TIMED region re-executes exactly the
work the engine's bench sample re-executes. Engine ops amortize
session/process-stable inputs through the artifact store (trained
centroids, standing band index, standing labeling, scored frames), so
the twin stages those once per session UNTIMED — built with the same
vanilla code — and the timed sample covers the per-run work (routing,
merge step, census fold, rewrite, drain). Twins for the two
full-recompute contrasts are the naive production answer the
incremental op avoids, stated per row:

- `dedup_components_retract` twin = full connected components over the
  survivors' pair subgraph (the splice's alternative);
- `vec_ivf_cell_retrain` twin = full Lloyd re-train + full re-route
  (the partial repair's alternative).

Only CONSTANTS are imported from the engine (K, iterations, splits,
seeds, thresholds) so the comparison runs the same parameters; no
engine execution helper is used anywhere.

Usage: python tools/baseline_r11_families.py [SF_DIR]
Output: one JSON line {"metric": "baseline_r11_families", rows: {...}}
with per-op median ms + the 3 samples; mirror the rows into BASELINE.md.
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

# constants only — parameters must match the engine ops
from storm_netmonitor_spark.operators.vectors import (  # noqa: E402
    IVF_ITERS,
    IVF_K,
    IVF_NPROBE,
)
from storm_netmonitor_spark.operators.text import (  # noqa: E402
    MINHASH_BANDS,
    MINHASH_SEEDS,
    SHINGLE_K,
)
from storm_netmonitor_spark.operators.corpus import (  # noqa: E402
    DUP_BIGRAM_MAX,
    TOP_WORD_MAX,
)
from storm_netmonitor_spark.operators.corpus2 import (  # noqa: E402
    _XENT_KEEP_MAX,
)
from storm_netmonitor_spark.operators.extensions9 import (  # noqa: E402
    _CAL_FRACTIONS,
    _CAL_SEEDS,
    _REC_K,
    _REC_PROBES,
    _REC_QUERIES,
)
from storm_netmonitor_spark.operators.extensions10 import (  # noqa: E402
    _DEL_DROP_BEFORE,
    _DEL_TOMB_MOD,
    _DEL_WINDOW_END,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SPLIT_NUM, SPLIT_DEN = 4, 5  # the §2.W/§2.X base/delta convention

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("baseline-r11-families")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

EMB = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
DOCS = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
EVENTS = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))

E_SPLIT = (EMB.agg(F.max("vec_id")).collect()[0][0] + 1) * SPLIT_NUM // SPLIT_DEN
D_SPLIT = (DOCS.agg(F.max("doc_id")).collect()[0][0] + 1) * SPLIT_NUM // SPLIT_DEN


# ---------------------------------------------------------------------------
# vanilla helpers (textbook renderings — shared by the twins below)
# ---------------------------------------------------------------------------

def vexplode(df: DataFrame, idc: str = "vec_id") -> DataFrame:
    """(id, pos, x) long form — the explode-based vector rendering."""
    return df.select(
        F.col(idc).alias("vid"),
        F.posexplode("embedding").alias("pos", "x"),
    )


def cents_frame(cents: list[list[float]]) -> DataFrame:
    rows = [
        (cid, pos, float(x))
        for cid, vec in enumerate(cents)
        for pos, x in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "cid int, pos int, cx double")


def vanilla_route(df: DataFrame) -> DataFrame:
    """(vec_id, cid) argmax routing via exploded dot + window — the
    plain-DataFrame rendering of the engine's Arrow routing pass.
    Expects globals CENTS set. Tie-breaks dot DESC, cid ASC."""
    dots = (
        vexplode(df)
        .join(F.broadcast(CF), "pos")
        .groupBy("vid", "cid")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot"))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("vid").alias("vec_id"), "cid")
    )


def vanilla_lloyd(base: DataFrame) -> list[list[float]]:
    """Spherical k-means, K seeds = vec_id 1..K, IVF_ITERS rounds —
    exploded-join dots, argmax window, mean + L2 normalize. The
    textbook distributed Lloyd a plain user writes."""
    seeds = base.filter(F.col("vec_id").between(1, IVF_K)).orderBy("vec_id")
    cents = [[float(x) for x in r["embedding"]] for r in seeds.collect()]
    ex = vexplode(base).cache()
    ex.count()
    for _ in range(IVF_ITERS):
        cf = cents_frame(cents)
        dots = (
            ex.join(F.broadcast(cf), "pos")
            .groupBy("vid", "cid")
            .agg(F.sum(F.col("x") * F.col("cx")).alias("dot"))
        )
        w = Window.partitionBy("vid").orderBy(F.desc("dot"), F.asc("cid"))
        assign = (
            dots.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vid", "cid")
        )
        means = (
            ex.join(assign, "vid")
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        dim = len(cents[0])
        for r in means:
            acc.setdefault(r["cid"], [0.0] * dim)[r["pos"]] = r["m"]
        new = []
        for cid in range(IVF_K):
            v = acc.get(cid, cents[cid])
            n = math.sqrt(sum(t * t for t in v)) or 1.0
            new.append([t / n for t in v])
        cents = new
    ex.unpersist()
    return cents


def vanilla_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh: array<string>) distinct word-SHINGLE_K shingles."""
    tk = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit("")).alias(
            "tk"
        ),
    )
    return tk.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("tk") - SHINGLE_K, F.lit(0)),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("tk"), i + 1, SHINGLE_K)
                ),
            )
        ).alias("sh"),
    )


def vanilla_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, h) MinHash band rows via the explode→groupBy
    rendering (the naive shuffle-heavy shape the engine's row-local
    array version avoids)."""
    exp = vanilla_shingles(docs).select(
        "doc_id", F.explode("sh").alias("s")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col("s")))).alias(f"h{i}")
        for i, seed in enumerate(MINHASH_SEEDS)
    ]
    sig = exp.groupBy("doc_id").agg(*aggs)
    rpb = len(MINHASH_SEEDS) // MINHASH_BANDS
    bands = []
    for b in range(MINHASH_BANDS):
        cols = [f"h{b * rpb + j}" for j in range(rpb)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("h"),
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def vanilla_pairs(probe: DataFrame, index: DataFrame, sh: DataFrame) -> DataFrame:
    """Band-bucket candidates + exact Jaccard ≥ 0.5 verification."""
    cand = (
        probe.alias("p")
        .join(index.alias("i"), ["band", "h"])
        .filter(F.col("p.doc_id") > F.col("i.doc_id"))
        .select(
            F.col("i.doc_id").alias("doc_a"),
            F.col("p.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sa"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sb"), "doc_b")
        .withColumn("ni", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "j",
            F.col("ni") / (F.size("sa") + F.size("sb") - F.col("ni")),
        )
        .filter(F.round("j", 4) >= 0.5)
        .select("doc_a", "doc_b")
    )


def vanilla_cc(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    plain loop (join neighbors, take min, repeat to fixpoint)."""
    both = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    lab = nodes.select(F.col("doc_id"), F.col("doc_id").alias("component"))
    for _ in range(20):
        nb = (
            both.join(lab.withColumnRenamed("doc_id", "v"), "v")
            .groupBy(F.col("u").alias("doc_id"))
            .agg(F.min("component").alias("nc"))
        )
        new = (
            lab.join(nb, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nc", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        lab = new
        if changed == 0:
            break
    return lab


def vanilla_lm(docs: DataFrame):
    """Unigram LM scoring — (scored frame (doc_id, n_tokens, xent),
    via token explode + count model + join (the naive per-refresh
    pipeline the engine's artifact-store frame amortizes away)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
        ).alias("w"),
    )
    lm = toks.groupBy("w").agg(F.count("*").alias("cw"))
    tot = lm.agg(F.sum("cw")).collect()[0][0]
    return (
        toks.join(lm, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                math.log(float(tot))
                - F.avg(F.log(F.col("cw").cast("double")))
            ).alias("xent"),
        )
    )


# ---------------------------------------------------------------------------
# session-staged inputs (UNTIMED — the engine's artifact-store parity)
# ---------------------------------------------------------------------------

print("staging: vanilla Lloyd (full + base) ...", file=sys.stderr)
_corpus_all = EMB.filter(F.col("vec_id") != 0).select("vec_id", "embedding").cache()
_corpus_all.count()
CENTS_FULL = vanilla_lloyd(_corpus_all)
_base = EMB.filter(
    (F.col("vec_id") >= 1) & (F.col("vec_id") < E_SPLIT)
).select("vec_id", "embedding").cache()
_base.count()
CENTS_BASE = vanilla_lloyd(_base)

CENTS = CENTS_FULL
CF = cents_frame(CENTS_FULL).cache()
CF_BASE = cents_frame(CENTS_BASE).cache()
CF.count(), CF_BASE.count()

print("staging: cells / censuses / bands / labels / scores ...", file=sys.stderr)
_cells_full = vanilla_route(_corpus_all).cache()
_cells_full.count()

_save_cf = None


def route_with(df: DataFrame, cf: DataFrame) -> DataFrame:
    dots = (
        vexplode(df)
        .join(F.broadcast(cf), "pos")
        .groupBy("vid", "cid")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot"))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("vid").alias("vec_id"), "cid")
    )


_base_census = (
    route_with(_base, CF_BASE).groupBy("cid").agg(F.count("*").alias("n_base"))
).cache()
_base_census.count()

_sh_tbl = vanilla_shingles(DOCS).cache()
_sh_tbl.count()
_standing_bands = vanilla_bands(DOCS.filter(F.col("doc_id") < D_SPLIT)).cache()
_standing_bands.count()
_standing_pairs = vanilla_pairs(_standing_bands, _standing_bands, _sh_tbl).cache()
_standing_pairs.count()
_standing_labels = vanilla_cc(
    DOCS.filter(F.col("doc_id") < D_SPLIT).select("doc_id"), _standing_pairs
).cache()
_standing_labels.count()
_all_bands = vanilla_bands(DOCS).cache()
_all_bands.count()
_all_pairs = vanilla_pairs(_all_bands, _all_bands, _sh_tbl).cache()
_all_pairs.count()

_scored = vanilla_lm(DOCS).cache()
_scored.count()

# NOT cached: the engine's insert/drift ops re-scan the parquet per
# run (only the trained model and the serving cell table are
# artifacts) - caching here would hand the baseline an input the
# vanilla user's per-run plan never has
DELTA_E = EMB.filter(F.col("vec_id") >= E_SPLIT).select("vec_id", "embedding")
BOTH_E = EMB.filter(F.col("vec_id") >= 1).select(
    "vec_id", "embedding", (F.col("vec_id") >= E_SPLIT).cast("int").alias("pop")
)


# ---------------------------------------------------------------------------
# batch twins — each returns rows (collect() is the timed terminal)
# ---------------------------------------------------------------------------

# Non-RERUN ops (vec_ivf_index_insert, vec_index_drift,
# text_profile_drift, text_minhash_calibration): the engine's bench
# sample re-collects a PRE-BUILT DataFrame (BASELINE.md method — plan
# compilation amortized, execution measured), so these twins build
# their frame once at staging and the timed region is collect().
# Everything in bench RERUN_FULL rebuilds per sample on both sides.

def _build_vec_ivf_index_insert():
    return route_with(DELTA_E, CF_BASE)


def _build_vec_index_drift():
    routed = route_with(BOTH_E.select("vec_id", "embedding"), CF_BASE)
    tagged = routed.join(
        BOTH_E.select("vec_id", "pop"), "vec_id"
    )
    census = (
        spark.range(IVF_K)
        .select(F.col("id").cast("int").alias("cid"))
        .join(
            tagged.groupBy("cid").agg(
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
        "n_base",
        "n_delta",
        (F.col("n_base") / tb).alias("share_base"),
        (F.col("n_delta") / td).alias("share_delta"),
        (
            F.abs(F.col("n_delta") * tb - F.col("n_base") * td) * 200
            >= F.lit(tb) * td
        ).alias("drifted"),
    )


def _build_text_profile_drift():
    feat = DOCS.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).alias("tok"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("al"),
        F.length("text").alias("tot"),
    )
    buck = feat.select(
        (
            F.least(F.lit(15), F.length(F.bin("tok"))) * 10
            + F.when(
                F.col("tot") > 0, F.least(F.lit(9), F.expr("al * 10 DIV tot"))
            ).otherwise(0)
        ).alias("cid"),
        (F.col("doc_id") >= D_SPLIT).cast("int").alias("pop"),
    )
    census = buck.groupBy("cid").agg(
        F.sum(1 - F.col("pop")).alias("n_base"), F.sum("pop").alias("n_delta")
    )
    tot = census.agg(
        F.sum("n_base").alias("tb"), F.sum("n_delta").alias("td")
    ).collect()[0]
    tb, td = int(tot["tb"]), int(tot["td"])
    return census.select(
        "cid",
        "n_base",
        "n_delta",
        (F.col("n_base") / tb).alias("share_base"),
        (F.col("n_delta") / td).alias("share_delta"),
        (
            F.abs(F.col("n_delta") * tb - F.col("n_base") * td) * 200
            >= F.lit(tb) * td
        ).alias("drifted"),
    )


def t_dedup_components_merge():
    delta_bands = vanilla_bands(DOCS.filter(F.col("doc_id") >= D_SPLIT))
    delta_pairs = vanilla_pairs(
        delta_bands, _standing_bands.unionByName(delta_bands), _sh_tbl
    )
    star = _standing_labels.filter(
        F.col("component") != F.col("doc_id")
    ).select(
        F.col("component").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    return vanilla_cc(
        DOCS.select("doc_id"), star.unionByName(delta_pairs)
    ).collect()


def t_vec_ann_recall():
    qe = vexplode(
        EMB.filter(F.col("vec_id") < _REC_QUERIES).select("vec_id", "embedding")
    ).withColumnRenamed("vid", "q_id").withColumnRenamed("x", "qx")
    ee = vexplode(_corpus_all)
    sims = (
        ee.join(qe, "pos")
        .filter(F.col("vid") != F.col("q_id"))
        .groupBy("q_id", "vid")
        .agg(F.sum(F.col("x") * F.col("qx")).alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vid"))
    exact = (
        sims.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _REC_K)
        .select("q_id", "vid")
    )
    qd = (
        qe.join(F.broadcast(CF), "pos")
        .groupBy("q_id", "cid")
        .agg(F.sum(F.col("qx") * F.col("cx")).alias("dot"))
    )
    wp = Window.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("cid"))
    prank = qd.withColumn("pr", F.row_number().over(wp)).select(
        "q_id", "cid", "pr"
    )
    probes = spark.createDataFrame(
        [(p,) for p in _REC_PROBES], "nprobe int"
    )
    swe = (
        sims.join(_cells_full.withColumnRenamed("vec_id", "vid"), "vid")
        .join(prank, ["q_id", "cid"])
        .join(F.broadcast(probes), F.col("pr") <= F.col("nprobe"))
    )
    wa = Window.partitionBy("q_id", "nprobe").orderBy(
        F.desc("sim"), F.asc("vid")
    )
    approx = (
        swe.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= _REC_K)
        .select("q_id", "nprobe", "vid")
    )
    hits = approx.join(exact, ["q_id", "vid"]).groupBy("q_id", "nprobe").agg(
        F.count("*").alias("h")
    )
    grid = (
        exact.select("q_id").distinct().crossJoin(probes)
    )
    return (
        grid.join(hits, ["q_id", "nprobe"], "left")
        .fillna(0, ["h"])
        .select(
            "q_id",
            "nprobe",
            F.col("h").alias(f"hits_at_{_REC_K}"),
            (F.col("h") / _REC_K).alias("recall_pct"),
        )
        .collect()
    )


def _build_text_minhash_calibration():
    sh = vanilla_shingles(DOCS).select("doc_id", F.array_sort("sh").alias("sh"))
    fr = F.explode(F.array(*[F.lit(f) for f in _CAL_FRACTIONS])).alias(
        "frac_pct"
    )
    rows = sh.select("doc_id", "sh", fr).select(
        "doc_id",
        "frac_pct",
        F.size("sh").alias("flen"),
        F.expr("greatest(1, (size(sh) * frac_pct) div 100)").alias("plen"),
        "sh",
        F.expr(
            "slice(sh, 1, greatest(1, (size(sh) * frac_pct) div 100))"
        ).alias("pf"),
    )
    # naive rendering: explode each side, md5-min per seed via groupBy
    full = rows.select("doc_id", "frac_pct", F.explode("sh").alias("s"))
    pref = rows.select("doc_id", "frac_pct", F.explode("pf").alias("s"))
    fa = full.groupBy("doc_id", "frac_pct").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col("s")))).alias(
                f"f{i}"
            )
            for i, seed in enumerate(_CAL_SEEDS)
        ]
    )
    pa = pref.groupBy("doc_id", "frac_pct").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col("s")))).alias(
                f"p{i}"
            )
            for i, seed in enumerate(_CAL_SEEDS)
        ]
    )
    nb = len(_CAL_SEEDS) // 2
    caught = None
    for b in range(nb):
        c = (F.col(f"f{2*b}") == F.col(f"p{2*b}")) & (
            F.col(f"f{2*b+1}") == F.col(f"p{2*b+1}")
        )
        caught = c if caught is None else (caught | c)
    joined = (
        fa.join(pa, ["doc_id", "frac_pct"])
        .join(rows.select("doc_id", "frac_pct", "flen", "plen"), ["doc_id", "frac_pct"])
        .select("frac_pct", "flen", "plen", caught.cast("int").alias("caught"))
    )
    return (
        joined.groupBy("frac_pct")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("caught").alias("n_caught"),
            (F.sum("caught") / F.count("*")).alias("catch_pct"),
            (F.sum("plen") / F.sum("flen")).alias("pooled_jaccard"),
        )
    )


def t_text_filter_agreement():
    # naive per-refresh pipeline: re-score everything, window terciles
    scored = vanilla_lm(DOCS)
    g1 = scored.select(
        "doc_id", (F.col("xent") <= _XENT_KEEP_MAX).alias("ppl")
    )
    # gopher: the explode→groupBy word/bigram rendering
    tk = DOCS.select(
        "doc_id", F.split(F.lower("text"), " ").alias("tk")
    )
    words = tk.select("doc_id", F.explode("tk").alias("w"))
    wstats = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    top = wstats.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n")
    )
    bg = tk.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("tk") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("tk", i),
                        F.element_at("tk", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("b"),
    )
    bstats = bg.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    dupb = bstats.groupBy("doc_id").agg(
        (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c")).alias(
            "dup_bg_frac"
        )
    )
    g2 = (
        top.join(dupb, "doc_id", "left")
        .fillna(0.0, ["dup_bg_frac"])
        .select(
            "doc_id",
            (
                (F.col("top_c") / F.col("n") <= TOP_WORD_MAX)
                & (F.col("dup_bg_frac") <= DUP_BIGRAM_MAX)
            ).alias("gopher"),
        )
    )
    n = scored.count()
    wr = Window.orderBy("xent", "doc_id")
    g3 = scored.withColumn("rk", F.row_number().over(wr)).select(
        "doc_id", (F.col("rk") <= 2 * n / 3).alias("tercile")
    )
    flags = g1.join(g2, "doc_id").join(g3, "doc_id")
    out = []
    for a, b in (("ppl", "gopher"), ("ppl", "tercile"), ("gopher", "tercile")):
        out.extend(
            flags.agg(
                F.lit(a).alias("gate_a"),
                F.lit(b).alias("gate_b"),
                F.sum((F.col(a) & F.col(b)).cast("long")).alias("n_both_keep"),
                F.sum((F.col(a) & ~F.col(b)).cast("long")).alias("n_only_a"),
                F.sum((~F.col(a) & F.col(b)).cast("long")).alias("n_only_b"),
                F.sum((~F.col(a) & ~F.col(b)).cast("long")).alias(
                    "n_both_drop"
                ),
                (
                    F.sum((F.col(a) == F.col(b)).cast("long")) / F.count("*")
                ).alias("agree_pct"),
            ).collect()
        )
    return out


def t_sink_targeted_delete():
    # the naive rewrite: read EVERY partition, filter, write the FULL
    # table back (no partition-minimal I/O), then census the ledger
    out = tempfile.mkdtemp(prefix="baseline_del_")
    base = EVENTS.select(
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias(
            "event_date"
        ),
        "user_id",
    )
    kept = base.filter(
        (F.col("event_date") >= _DEL_DROP_BEFORE)
        & (
            (F.col("event_date") >= _DEL_WINDOW_END)
            | (F.col("user_id") % _DEL_TOMB_MOD != 0)
        )
    )
    kept.write.mode("overwrite").partitionBy("event_date").parquet(out)
    per = base.groupBy("event_date").agg(F.count("*").alias("n_before"))
    after = (
        spark.read.parquet(out)
        .groupBy("event_date")
        .agg(F.count("*").alias("n_after"))
    )
    rows = (
        per.join(after, "event_date", "left")
        .fillna(0, ["n_after"])
        .select(
            "event_date",
            F.when(F.col("event_date") < _DEL_DROP_BEFORE, "dropped")
            .when(F.col("event_date") < _DEL_WINDOW_END, "rewritten")
            .otherwise("untouched")
            .alias("action"),
            "n_before",
            "n_after",
        )
        .collect()
    )
    shutil.rmtree(out, ignore_errors=True)
    return rows


def t_dedup_components_retract():
    # the naive answer to a deletion: full CC recompute over survivors
    surv_pairs = _all_pairs.filter(
        (F.col("doc_a") < D_SPLIT) & (F.col("doc_b") < D_SPLIT)
    )
    return vanilla_cc(
        DOCS.filter(F.col("doc_id") < D_SPLIT).select("doc_id"), surv_pairs
    ).collect()


def t_vec_ivf_cell_retrain():
    # the naive answer to drift: full re-train + full re-route
    cents = vanilla_lloyd(_corpus_all)
    cf = cents_frame(cents)
    return route_with(_corpus_all, cf).collect()


# ---------------------------------------------------------------------------
# streaming drains (drain-vs-drain, the baseline_stream_drain method)
# ---------------------------------------------------------------------------

def _stage_stream(df, order_col, n_batches, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    import pyarrow as pa  # noqa: F401
    rows = df.orderBy(order_col).collect()
    per = max(1, -(-len(rows) // n_batches))
    schema = df.schema
    for i in range(0, len(rows), per):
        spark.createDataFrame(rows[i : i + per], schema).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(d, f"b{i // per}"))
    return d


_serve_src = _stage_stream(
    EMB.filter(F.col("vec_id").isin([0, 1, 2, 3])), "vec_id", 2, "bl_serve_"
)
_drift_src = _stage_stream(
    EMB.filter(F.col("vec_id") >= E_SPLIT).select("vec_id", "embedding"),
    "vec_id",
    2,
    "bl_drift_",
)
_gate_docs = DOCS.filter(F.col("doc_id") >= D_SPLIT)
_merge_src = _stage_stream(_gate_docs, "doc_id", 2, "bl_merge_")


def _drain(src, schema_df, fn):
    ckpt = tempfile.mkdtemp(prefix="bl_ckpt_")
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


def t_stream_ann_serve():
    # the naive serve loop: collect batch queries, route on the driver,
    # score candidates with the exploded-dot rendering
    out_dir = tempfile.mkdtemp(prefix="bl_serve_out_")

    def serve(batch_df, batch_id):
        qrows = batch_df.select("vec_id", "embedding").collect()
        if not qrows:
            return
        probe_rows, qvec_rows = [], []
        for r in qrows:
            qid = int(r["vec_id"])
            qv = [float(x) for x in r["embedding"]]
            qvec_rows.extend((qid, p, v) for p, v in enumerate(qv))
            sims = sorted(
                (
                    (sum(c[i] * qv[i] for i in range(len(qv))), -k)
                    for k, c in enumerate(CENTS_FULL)
                ),
                reverse=True,
            )
            probe_rows.extend((qid, -nk) for _, nk in sims[:IVF_NPROBE])
        probes = spark.createDataFrame(probe_rows, "qid long, cid int")
        qx = spark.createDataFrame(qvec_rows, "qid long, pos int, qx double")
        cand = _cells_full.join(F.broadcast(probes), "cid").select(
            "qid", "vec_id"
        )
        scored = (
            cand.join(
                vexplode(_corpus_all).withColumnRenamed("vid", "vec_id"),
                "vec_id",
            )
            .join(F.broadcast(qx), ["qid", "pos"])
            .groupBy("qid", "vec_id")
            .agg(F.sum(F.col("x") * F.col("qx")).alias("cos_sim"))
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        top = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("qid", "vec_id", "cos_sim")
        )
        top.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    _drain(_serve_src, EMB, serve)
    rows = spark.read.parquet(os.path.join(out_dir, "batch_id=*")).collect()
    shutil.rmtree(out_dir, ignore_errors=True)
    return rows


def t_stream_index_drift():
    # like the engine op: per-batch censuses LAND batch_id-keyed
    # (retry-idempotent parquet), the final drift table reads the folded
    # sink back against the persisted base census
    out_dir = tempfile.mkdtemp(prefix="bl_drift_out_")

    def fold(batch_df, batch_id):
        if not batch_df.take(1):
            return
        (
            route_with(batch_df.select("vec_id", "embedding"), CF_BASE)
            .groupBy("cid")
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    _drain(_drift_src, EMB.select("vec_id", "embedding"), fold)
    folded = (
        spark.read.parquet(os.path.join(out_dir, "batch_id=*"))
        .groupBy("cid")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    delta = {r["cid"]: r["n"] for r in folded}
    base = {r["cid"]: r["n_base"] for r in _base_census.collect()}
    tb, td = sum(base.values()), sum(delta.values()) or 1
    rows = [
        (
            cid,
            base.get(cid, 0),
            delta.get(cid, 0),
            base.get(cid, 0) / tb,
            delta.get(cid, 0) / td,
            abs(delta.get(cid, 0) * tb - base.get(cid, 0) * td) * 200
            >= tb * td,
        )
        for cid in range(IVF_K)
    ]
    shutil.rmtree(out_dir, ignore_errors=True)
    return rows


def t_stream_minhash_index_merge():
    # like the engine op: per-batch pair discoveries LAND batch_id-keyed
    out_dir = tempfile.mkdtemp(prefix="bl_merge_out_")
    folded = [_standing_bands]

    def merge(batch_df, batch_id):
        if not batch_df.take(1):
            return
        bb = vanilla_bands(batch_df).localCheckpoint()
        index = folded[0]
        for f in folded[1:]:
            index = index.unionByName(f)
        index = index.unionByName(bb)
        vanilla_pairs(bb, index, _sh_tbl).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        folded.append(bb)

    _drain(_merge_src, _gate_docs, merge)
    del folded[1:]
    rows = spark.read.parquet(os.path.join(out_dir, "batch_id=*")).collect()
    shutil.rmtree(out_dir, ignore_errors=True)
    return rows


# ---------------------------------------------------------------------------
# measure
# ---------------------------------------------------------------------------

_PREBUILT = {
    "vec_ivf_index_insert": _build_vec_ivf_index_insert(),
    "text_minhash_calibration": _build_text_minhash_calibration(),
}


def _collector(name):
    return lambda: _PREBUILT[name].collect()


t_vec_ivf_index_insert = _collector("vec_ivf_index_insert")
t_text_minhash_calibration = _collector("text_minhash_calibration")


# r14 measurement-method parity: the engine's vec_index_drift /
# text_profile_drift moved into bench RERUN_FULL (their census is
# collected during DataFrame construction and the K-row drift tail is
# computed driver-side, so collect() on the returned local relation
# would measure nothing). Per the rule above — the twin's timed region
# re-executes exactly the work the engine's bench sample re-executes —
# these twins now REBUILD per sample (vanilla full lifecycle: plan
# construction, the totals collect, the final collect), matching every
# other RERUN_FULL row in this file.
def t_vec_index_drift():
    return _build_vec_index_drift().collect()


def t_text_profile_drift():
    return _build_text_profile_drift().collect()


TWINS = {
    "vec_ivf_index_insert": t_vec_ivf_index_insert,
    "vec_index_drift": t_vec_index_drift,
    "text_profile_drift": t_text_profile_drift,
    "dedup_components_merge": t_dedup_components_merge,
    "vec_ann_recall": t_vec_ann_recall,
    "text_minhash_calibration": t_text_minhash_calibration,
    "text_filter_agreement": t_text_filter_agreement,
    "sink_targeted_delete": t_sink_targeted_delete,
    "dedup_components_retract": t_dedup_components_retract,
    "vec_ivf_cell_retrain": t_vec_ivf_cell_retrain,
    "stream_ann_serve": t_stream_ann_serve,
    "stream_index_drift": t_stream_index_drift,
    "stream_minhash_index_merge": t_stream_minhash_index_merge,
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
    fn()  # 1 warm-up (BASELINE.md method)
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
            "metric": "baseline_r11_families",
            "unit": "ms",
            "sf_dir": SF_DIR,
            "env": "local[8], shuffle.partitions=8, vanilla renderings",
            "rows": rows,
        }
    )
)
