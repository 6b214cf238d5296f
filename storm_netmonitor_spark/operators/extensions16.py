"""Round-13 operators, fourth batch — §2.AG, REGISTERED (registry 312 → 315).

Staged at round-12 close; both gate halves re-run green at round-13
open, so they register with the standard ``@query`` decorator.

Capability anchor: SURVEY §2.AG — the QUANTIZATION QUALITY triple.
The PQ path has encode + ADC serving (§2.Q) and the IVF path has
recall/rank evaluation (§2.Z/§2.AE); what production still needs is
the QUANTIZER's own health measurements:

- ``vec_pq_distortion`` — the reconstruction-error and code-utilization
  census of the PQ codebook: per (subspace, code) the assignment count
  and exact total/mean quantization error. Unbalanced code usage or a
  hot high-error cell is the signal the codebook no longer fits the
  data (the PQ analog of the IVF population-drift monitor);
- ``vec_pq_recall`` — recall@k of the ADC ranking against exact-L2
  top-k per query of the §2.Z block: the §2.Z evaluation method
  applied to the PQ index (IVF recall says whether the COARSE quantizer
  finds the right cells; this says whether the FINE quantizer ranks
  the right neighbors);
- ``vec_index_snapshot_diff`` — assignment churn between two index
  versions: the full corpus routed under the base-trained centroids
  (the standing snapshot) and the full-trained centroids (the retrain
  candidate), emitted as the K×K transition census with exact
  per-source-cell churn shares — the "what does deploying this retrain
  actually move" report that gates an index rollover.

All three compose EXISTING audited machinery — the registered encode
semantics (``vec_pq_encode`` codes verbatim), the two trained centroid
artifacts, the shared routing kernels, and the ``dratio`` exact-share
discipline. Every decision is an already-margin-audited class (argmin
on decimal-identical distances; routing argmax); emitted values are
integers, exact e6-scaled error totals, and dratio rationals.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table
from ..registry import query, resolve_oracle

# ---------------------------------------------------------------------------
# vec_pq_distortion — codebook health census
# ---------------------------------------------------------------------------


def vec_pq_distortion_oracle(sf_dir: str | None = None) -> str:
    from .vectors import _PQ_CODES, _PQ_SUBS

    codes = resolve_oracle("vec_pq_encode", sf_dir)
    mean_sql = dratio_sql("total_d2_e6", "n_assigned")
    return f"""
WITH codes AS ({codes}), cells AS (
  SELECT s.r AS sub, c.r AS code
  FROM range(0, {_PQ_SUBS}) s(r), range(1, {_PQ_CODES} + 1) c(r)
), agg AS (
  SELECT sub, code,
         COUNT(*) AS n_assigned,
         CAST(SUM(CAST(ROUND(d2 * 1000000) AS BIGINT)) AS BIGINT)
           AS total_d2_e6
  FROM codes GROUP BY sub, code
)
SELECT CAST(cells.sub AS BIGINT) AS sub,
       CAST(cells.code AS BIGINT) AS code,
       CAST(COALESCE(agg.n_assigned, 0) AS BIGINT) AS n_assigned,
       CAST(COALESCE(agg.total_d2_e6, 0) AS BIGINT) AS total_d2_e6,
       CASE WHEN COALESCE(agg.n_assigned, 0) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE {mean_sql} END AS mean_d2
FROM cells LEFT JOIN agg ON agg.sub = cells.sub AND agg.code = cells.code
"""


@query("vec_pq_distortion", oracle=vec_pq_distortion_oracle)
def vec_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook health census (SURVEY §2.AG): per (subspace, code)
    the assignment count and the exact total/mean reconstruction error
    of the registered encode (``vec_pq_encode``'s codes and d2 values
    VERBATIM — one encode semantics, N consumers). Code-utilization
    skew or a hot high-error cell is the retrain signal for the FINE
    quantizer, exactly as the cell-population drift monitor is for the
    coarse one.

    Exactness: d2 is the encode op's round-6 decimal — ``round(d2·1e6)``
    recovers the exact scaled integer on both engines, totals sum in
    BIGINT, and the mean is a dratio rational (zero-assignment cells
    emit 0.0 — guarded, never a 0/0). Shape at scale: the codes frame
    is the 32×-compressed scan; one ({_PQ_SUBS}×{_PQ_CODES})-row keyed
    exchange; the cells grid is arithmetic on ``spark.range`` — no
    cross join."""
    from .vectors import _PQ_CODES, _PQ_SUBS, vec_pq_encode

    codes = vec_pq_encode(spark, sf_dir)
    agg = codes.groupBy("sub", "code").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.sum(F.round(F.col("d2") * 1000000).cast("long"))
        .cast("long")
        .alias("total_d2_e6"),
    )
    cells = spark.range(_PQ_SUBS * _PQ_CODES).select(
        (F.col("id") / _PQ_CODES).cast("long").alias("sub"),
        (F.col("id") % _PQ_CODES + 1).cast("long").alias("code"),
    )
    joined = cells.join(agg, ["sub", "code"], "left").select(
        "sub",
        "code",
        F.coalesce("n_assigned", F.lit(0)).cast("long").alias("n_assigned"),
        F.coalesce("total_d2_e6", F.lit(0)).cast("long").alias("total_d2_e6"),
    )
    return joined.select(
        "sub",
        "code",
        "n_assigned",
        "total_d2_e6",
        F.when(F.col("n_assigned") == 0, F.lit(0.0))
        .otherwise(dratio(F.col("total_d2_e6"), F.col("n_assigned")))
        .alias("mean_d2"),
    )


# ---------------------------------------------------------------------------
# vec_pq_recall — ADC ranking quality against exact L2
# ---------------------------------------------------------------------------

#: Shortlist size and query block — the §2.Z conventions.
_PQR_K = 10
_PQR_QUERIES = 10


def vec_pq_recall_oracle(sf_dir: str | None = None) -> str:
    from .vectors import _PQ_CODES

    codes = resolve_oracle("vec_pq_encode", sf_dir)
    return f"""
WITH codes AS ({codes}), qe AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS qx
  FROM embeddings WHERE vec_id < {_PQR_QUERIES}
), seeds AS (
  SELECT vec_id AS code, CAST((generate_subscripts(embedding, 1) - 1) // 8
                              AS BIGINT) AS sub,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id BETWEEN 1 AND {_PQ_CODES}
), dt AS (
  SELECT qe.q_id, s.sub, s.code,
         CAST(ROUND(SUM(CAST((qe.qx - s.x) * (qe.qx - s.x)
                             AS DECIMAL(28,12))), 6) AS DOUBLE) AS qd2
  FROM seeds s JOIN qe USING (pos)
  GROUP BY qe.q_id, s.sub, s.code
), adc AS (
  SELECT dt.q_id, c.vec_id,
         CAST(ROUND(SUM(CAST(dt.qd2 AS DECIMAL(28,6))), 6) AS DOUBLE)
           AS adc_d2
  FROM codes c JOIN dt ON dt.sub = c.sub AND dt.code = c.code
  WHERE c.vec_id <> 0 AND c.vec_id <> dt.q_id
  GROUP BY dt.q_id, c.vec_id
), approx AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY adc_d2, vec_id) AS rn
    FROM adc
  ) WHERE rn <= {_PQR_K}
), ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id <> 0
), ed AS (
  SELECT qe.q_id, ee.vec_id,
         CAST(ROUND(SUM(CAST((qe.qx - ee.x) * (qe.qx - ee.x)
                             AS DECIMAL(28,12))), 6) AS DOUBLE) AS d2
  FROM ee JOIN qe USING (pos)
  WHERE ee.vec_id <> qe.q_id
  GROUP BY qe.q_id, ee.vec_id
), exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn
    FROM ed
  ) WHERE rn <= {_PQR_K}
), hits AS (
  SELECT a.q_id, COUNT(*) AS h
  FROM approx a JOIN exact x ON x.q_id = a.q_id AND x.vec_id = a.vec_id
  GROUP BY a.q_id
)
SELECT CAST(q.q_id AS BIGINT) AS q_id,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS hits_at_{_PQR_K},
       {dratio_sql("COALESCE(h.h, 0) * 1000000", str(_PQR_K))} AS recall_pct
FROM (SELECT DISTINCT q_id FROM qe) q
LEFT JOIN hits h ON h.q_id = q.q_id
"""


@query("vec_pq_recall", oracle=vec_pq_recall_oracle)
def vec_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC ranking quality (SURVEY §2.AG): recall@{_PQR_K} of the
    product-quantized ADC ranking against exact-L2 top-{_PQR_K}, per
    query of the §2.Z block (self-matches excluded). IVF recall
    (§2.Z) measures the COARSE quantizer's cell selection; this
    measures the FINE quantizer's ranking fidelity — together they
    decompose end-to-end ANN error into its two stages.

    Shape at scale: the distance table is a (Q×{8}×{16}) broadcast
    aggregate (model-side math), the ADC pass scans the 32×-compressed
    CODES frame once (the serving scan itself), the exact side is one
    broadcast Q-row decimal-L2 block (the ``vec_batch_knn`` O(N×Q)
    map shape — the documented eval cost, Q fixed), and the rank
    windows are Q-bounded."""
    from .vectors import _DOT_DEC, _PQ_CODES, _pos_explode, vec_pq_encode

    e = load_table(spark, sf_dir, "embeddings")
    codes = vec_pq_encode(spark, sf_dir).select("vec_id", "sub", "code")
    qe = _pos_explode(
        e.filter(F.col("vec_id") < _PQR_QUERIES), "vec_id"
    ).select(F.col("vec_id").alias("q_id"), "pos", F.col("x").alias("qx"))
    seeds = _pos_explode(
        e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _PQ_CODES)),
        "vec_id",
    ).select(
        F.col("vec_id").alias("code"),
        F.expr("CAST((pos - 1) div 8 AS BIGINT)").alias("sub"),
        "pos",
        "x",
    )
    qdiff = F.col("qx") - F.col("x")
    dt = (
        seeds.join(F.broadcast(qe), "pos")
        .select("q_id", "sub", "code", (qdiff * qdiff).alias("sq"))
        .groupBy("q_id", "sub", "code")
        .agg(
            F.round(F.sum(F.col("sq").cast(_DOT_DEC)), 6)
            .cast("double")
            .alias("qd2")
        )
    )
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(dt), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            F.round(F.sum(F.col("qd2").cast("decimal(28,6)")), 6)
            .cast("double")
            .alias("adc_d2")
        )
    )
    wa = Window.partitionBy("q_id").orderBy("adc_d2", "vec_id")
    approx = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= _PQR_K)
        .select("q_id", "vec_id")
    )
    # exact side: broadcast Q-row block, row-local decimal L2
    qb = e.filter(F.col("vec_id") < _PQR_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    l2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("q_emb"),
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0).cast(_DOT_DEC),
            lambda acc, p: (acc + p.cast(_DOT_DEC)).cast(_DOT_DEC),
        ),
        6,
    ).cast("double")
    corpus = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    ed = corpus.join(
        F.broadcast(qb), F.col("vec_id") != F.col("q_id")
    ).select("q_id", "vec_id", l2.alias("d2"))
    we = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    exact = (
        ed.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= _PQR_K)
        .select("q_id", "vec_id")
    )
    hits = approx.join(exact, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("h")
    )
    qids = qb.select("q_id").distinct()
    return qids.join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce("h", F.lit(0)).cast("long").alias(f"hits_at_{_PQR_K}"),
        dratio(
            F.coalesce("h", F.lit(0)).cast("long") * 1000000, F.lit(_PQR_K)
        ).alias("recall_pct"),
    )


# ---------------------------------------------------------------------------
# vec_index_snapshot_diff — assignment churn between two index versions
# ---------------------------------------------------------------------------


def vec_index_snapshot_diff_oracle(sf_dir: str | None = None) -> str:
    from .extensions7 import _base_lloyd_ctes
    from .vectors import IVF_ITERS, IVF_K, lloyd_rounds_sql, lloyd_route_sql

    n_fin = IVF_ITERS
    # full-trained chain (the iv_ prefix, the serve-oracle convention)
    full_head = f"""iv_e AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id <> 0
), iv_c0 AS MATERIALIZED (
  SELECT vec_id - 1 AS cid, pos, x AS cx FROM iv_e
  WHERE vec_id BETWEEN 1 AND {IVF_K}
)"""
    full = (
        full_head
        + lloyd_rounds_sql("iv_", "iv_e", IVF_ITERS)
        + lloyd_route_sql("iv_afin", "iv_e", f"iv_c{n_fin}")
    )
    share = dratio_sql("n * 1000000", "tot_from")
    return f"""
WITH {_base_lloyd_ctes()}, ae AS MATERIALIZED (
  SELECT * FROM be UNION ALL SELECT * FROM de
){lloyd_route_sql("aroute", "ae", f"bc{n_fin}")}, {full}, trans AS (
  SELECT a.cid AS cid_from, f.cid AS cid_to, COUNT(*) AS n
  FROM aroute a JOIN iv_afin f ON f.vec_id = a.vec_id
  GROUP BY 1, 2
), grid AS (
  SELECT s.r AS cid_from, t.r AS cid_to
  FROM range(0, {IVF_K}) s(r), range(0, {IVF_K}) t(r)
), fromtot AS (
  SELECT cid_from, SUM(n) AS tot_from FROM trans GROUP BY cid_from
)
SELECT CAST(g.cid_from AS INTEGER) AS cid_from,
       CAST(g.cid_to AS INTEGER) AS cid_to,
       CAST(COALESCE(tr.n, 0) AS BIGINT) AS n,
       g.cid_from <> g.cid_to AS moved,
       CASE WHEN COALESCE(ft.tot_from, 0) = 0 OR tr.n IS NULL
            THEN CAST(0.0 AS DOUBLE)
            ELSE {share} END AS share_of_from
FROM grid g
LEFT JOIN trans tr ON tr.cid_from = g.cid_from AND tr.cid_to = g.cid_to
LEFT JOIN fromtot ft ON ft.cid_from = g.cid_from
"""


@query("vec_index_snapshot_diff", oracle=vec_index_snapshot_diff_oracle)
def vec_index_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-version churn census (SURVEY §2.AG): the full corpus routed
    under the STANDING snapshot's centroids (base-trained — the §2.X
    artifact) and under the RETRAIN candidate's (full-trained — the
    serving artifact), emitted as the K×K transition census with exact
    per-source-cell churn shares. This is the rollover gate's input:
    deploying a retrain invalidates every moved vector's cell placement
    (cache entries, routing tables, co-location), so the report says
    what the rollover actually costs before it happens.

    Shape at scale: the STANDING snapshot's side reads the index's
    persisted posting lists (``base_routed_assignments`` — the same
    artifact the drift monitor audits; nothing re-routes the standing
    corpus), ONE corpus scan routes the RETRAIN candidate (that routing
    is genuinely new — the candidate has no posting lists yet), one
    K²-row keyed exchange for the census, per-source totals by a K-row
    join-back (no window), and the K×K grid is arithmetic on
    ``spark.range`` — no cross join, no pairwise term."""
    from .extensions7 import (
        _embed_split,
        base_routed_assignments,
        route_to_centroids,
    )
    from .vectors import IVF_K, ivf_index

    corpus, full_cents = ivf_index(spark, sf_dir)
    split = _embed_split(spark, sf_dir)

    routed_from = base_routed_assignments(
        spark, sf_dir, split
    ).withColumnRenamed("cid", "cid_from")
    routed_to = route_to_centroids(corpus, full_cents).withColumnRenamed(
        "cid", "cid_to"
    )
    trans = (
        routed_from.join(routed_to, "vec_id")
        .groupBy("cid_from", "cid_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    grid = spark.range(IVF_K * IVF_K).select(
        (F.col("id") / IVF_K).cast("int").alias("cid_from"),
        (F.col("id") % IVF_K).cast("int").alias("cid_to"),
    )
    fromtot = trans.groupBy("cid_from").agg(
        F.sum("n").cast("long").alias("tot_from")
    )
    return (
        grid.join(trans, ["cid_from", "cid_to"], "left")
        .join(fromtot, "cid_from", "left")
        .select(
            "cid_from",
            "cid_to",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            (F.col("cid_from") != F.col("cid_to")).alias("moved"),
            F.when(
                F.coalesce("tot_from", F.lit(0)) == 0,
                F.lit(0.0),
            )
            .when(F.col("n").isNull(), F.lit(0.0))
            .otherwise(
                dratio(
                    F.coalesce("n", F.lit(0)).cast("long") * 1000000,
                    F.col("tot_from"),
                )
            )
            .alias("share_of_from"),
        )
    )
