"""Round-15 candidate operators, third batch, PRE-STAGED (SURVEY
§2.AN; the staging discipline of the §2.W–§2.AM batches applied
forward).

NOTHING in this module is registered: the registry closed the round-14
registrations at 327, so there is no ``@query`` decorator here — each
candidate ships as a plain callable plus a module-level oracle builder,
wired into ``tests/test_extensions23_staged.py``.

Capability anchor: SURVEY §2.AN — EMBEDDING-GEOMETRY HEALTH. The
engine already audits per-dimension cell statistics
(``vec_dim_stats``), index drift (``vec_index_drift``), and recall
(``vec_ann_recall``); what the index owner still cannot see is the
GEOMETRY the index inherits — whether the space's energy concentrates
in a few dimensions (anisotropy: inflated cosines, wasted capacity),
whether nearest neighbors are SEPARABLE from the runner-up (the
margin that decides how hard ANN has to work), and whether a few
points dominate everyone's top-k lists (hubness — the
high-dimensional pathology that silently skews retrieval):

- ``vec_energy_concentration`` — the per-dimension energy census in
  rank order with cumulative share: how much of the space's total
  squared mass the top dimensions hold (isotropic ⇒ ~flat at 1/dim);
- ``vec_nn_margin_census`` — for a deterministic query sample, the
  (top1 − top2) cosine margin banded into integer centi-sim buckets:
  a mass of near-zero margins means exact ranks are fragile and ANN
  recall targets must be set accordingly;
- ``vec_hubness_census`` — the k-occurrence histogram: how often each
  candidate appears in the sample's top-k lists (0 = never
  retrieved); a heavy tail (hubs) plus a large orphan mass is the
  classic high-dimensional skew ANN bucket layouts inherit.

All decision arithmetic is integers (scaled decimal energies, centi
bands, occurrence counts); sims are the house decimal-stable dots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import dec_scaled, dec_scaled_sql, dratio, dratio_sql
from ..io import load_table

# ---------------------------------------------------------------------------
# vec_energy_concentration — per-dimension energy share, rank-ordered
# ---------------------------------------------------------------------------


def vec_energy_concentration_oracle() -> str:
    e_scaled = dec_scaled_sql("CAST(x AS DOUBLE) * CAST(x AS DOUBLE)")
    share = dratio_sql("e_scaled * 1000000", "tot.t")
    cshare = dratio_sql("cum_scaled * 1000000", "tot.t")
    return f"""
WITH cells AS (
  SELECT generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), dim AS (
  SELECT pos, {e_scaled} AS e_scaled FROM cells GROUP BY pos
), ranked AS (
  SELECT pos, e_scaled,
         ROW_NUMBER() OVER (ORDER BY e_scaled DESC, pos) AS energy_rank,
         SUM(e_scaled) OVER (ORDER BY e_scaled DESC, pos) AS cum_scaled
  FROM dim
), tot AS (SELECT SUM(e_scaled) AS t FROM dim)
SELECT CAST(energy_rank AS BIGINT) AS energy_rank,
       CAST(pos AS BIGINT) AS pos,
       CAST(e_scaled AS BIGINT) AS energy_micro,
       {share} AS energy_share_pct,
       {cshare} AS cum_energy_share_pct
FROM ranked, tot
"""


def energy_concentration_over(e: DataFrame) -> DataFrame:
    """KERNEL — the rank-ordered dimension energy census over any
    (vec_id, embedding) frame. Factored out of
    :func:`vec_energy_concentration` so the staged suite can plant an
    anisotropic population (one dominant dimension) and assert the
    rank-1 share."""
    cells = e.select(F.posexplode("embedding").alias("pos0", "xf")).select(
        (F.col("pos0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    dim = cells.groupBy("pos").agg(
        dec_scaled(F.col("x") * F.col("x")).alias("e_scaled")
    )
    wr = Window.partitionBy().orderBy(F.desc("e_scaled"), "pos")
    ws = Window.partitionBy()
    ranked = dim.select(
        "pos",
        "e_scaled",
        F.row_number().over(wr).alias("energy_rank"),
        F.sum("e_scaled").over(
            wr.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum_scaled"),
        F.sum("e_scaled").over(ws).alias("t"),
    )
    return ranked.select(
        F.col("energy_rank").cast("long").alias("energy_rank"),
        F.col("pos").cast("long").alias("pos"),
        F.col("e_scaled").cast("long").alias("energy_micro"),
        dratio(F.col("e_scaled") * 1_000_000, F.col("t")).alias(
            "energy_share_pct"
        ),
        dratio(F.col("cum_scaled") * 1_000_000, F.col("t")).alias(
            "cum_energy_share_pct"
        ),
    )


def vec_energy_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy census (SURVEY §2.AN): per-dimension total squared
    mass in DESCENDING energy order with cumulative share — the
    "how many dimensions hold the space" read an index owner takes
    before trusting cosine geometry (isotropic ⇒ flat at 1/dim;
    a steep head means inflated sims and a cheap dimensionality cut).

    Shape at scale: ``posexplode`` fans ×dim, ONE pos-keyed
    map-side-combining decimal aggregate collapses to (dims × tasks)
    partials before the exchange; the rank/cumulative windows run over
    the DIM-row census (64 rows). Energies accumulate in decimal
    micro-units (exact, order-independent), shares are dratio
    rationals — no float boundary on either engine."""
    return energy_concentration_over(
        load_table(spark, sf_dir, "embeddings").select("embedding")
    )


# ---------------------------------------------------------------------------
# shared Q-sample sims frame for the margin / hubness censuses
# ---------------------------------------------------------------------------

#: Deterministic query sample: every 10th vec_id queries the rest.
#: Bounds the pairwise term at Q × N with Q = N/10 of the SAMPLE ids —
#: at production scale the sample modulus grows with the corpus so Q
#: stays fixed-size (the vec_ann_recall Q-bounded eval-block class).
_Q_MOD = 10

#: Top-k lists audited by the hubness census.
_HUB_K = 5

#: Margin band width: FLOOR(margin · 100) — integer centi-sim buckets.
_MARGIN_SCALE = 100

_Q_SIMS_CTE = f"""
q AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS qx
  FROM embeddings WHERE vec_id % {_Q_MOD} = 0
), e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS x
  FROM embeddings WHERE vec_id % {_Q_MOD} <> 0
), dots AS (
  SELECT q_id, vec_id,
         SUM(CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS sim
  FROM e JOIN q USING (pos)
  GROUP BY q_id, vec_id
)"""


def _q_sims(e: DataFrame, q_mod: int) -> DataFrame:
    """(q_id, vec_id, sim) for the deterministic query sample against
    all other vectors: broadcast Q block, row-local double-fold dots —
    the ``vec_batch_knn`` shape (O(N × Q) map work, one Q-keyed
    exchange; the BNLJ is the broadcast Q-frame attach).

    Sims here feed RANK DECISIONS and centi-wide BANDS only (no raw
    sim value is emitted), so the dot is a plain double fold — the
    ``vec_ann_recall`` float-prefilter argument: the audited rank and
    band-boundary margins (margin_audit §2.AN rows) dwarf double
    accumulation noise (~1e-13), and the plain fold is ~50× the
    decimal HOF's throughput on the N×Q pass. The decimal
    ``_dot_arrays`` discipline stays for ops that EMIT the value."""
    q = e.filter(F.col("vec_id") % q_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = e.filter(F.col("vec_id") % q_mod != 0).select(
        "vec_id", "embedding"
    )
    fdot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("q_emb"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return cand.crossJoin(F.broadcast(q)).select(
        "q_id", "vec_id", fdot.alias("sim")
    )


# ---------------------------------------------------------------------------
# vec_nn_margin_census — (top1 − top2) separability bands
# ---------------------------------------------------------------------------


def vec_nn_margin_census_oracle() -> str:
    share = dratio_sql("n_queries * 1000000", "tot.t")
    return f"""
WITH {_Q_SIMS_CTE}, ranked AS (
  SELECT q_id, sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, vec_id) AS rn
  FROM dots
), top2 AS (
  SELECT q_id,
         MAX(CASE WHEN rn = 1 THEN sim END) AS s1,
         MAX(CASE WHEN rn = 2 THEN sim END) AS s2
  FROM ranked WHERE rn <= 2 GROUP BY q_id
), banded AS (
  SELECT CAST(FLOOR((s1 - s2) * {_MARGIN_SCALE}) AS BIGINT)
           AS margin_band
  FROM top2
), census AS (
  SELECT margin_band, COUNT(*) AS n_queries FROM banded GROUP BY 1
), tot AS (SELECT SUM(n_queries) AS t FROM census)
SELECT margin_band,
       CAST(n_queries AS BIGINT) AS n_queries,
       {share} AS query_share_pct
FROM census, tot
"""


def nn_margin_census_over(e: DataFrame, q_mod: int) -> DataFrame:
    """KERNEL — the margin-band census over any (vec_id, embedding)
    frame. Factored out of :func:`vec_nn_margin_census` so the staged
    suite can plant a query with an exactly-known (top1 − top2) gap
    and assert its band."""
    sims = _q_sims(e, q_mod)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    top2 = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("q_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("sim"))).alias("s1"),
            F.max(F.when(F.col("rn") == 2, F.col("sim"))).alias("s2"),
        )
    )
    census = (
        top2.select(
            F.floor((F.col("s1") - F.col("s2")) * _MARGIN_SCALE)
            .cast("long")
            .alias("margin_band")
        )
        .groupBy("margin_band")
        .agg(F.count(F.lit(1)).alias("n_queries"))
    )
    tot = census.agg(F.sum("n_queries").alias("t"))
    return census.crossJoin(F.broadcast(tot)).select(
        "margin_band",
        F.col("n_queries").cast("long").alias("n_queries"),
        dratio(F.col("n_queries") * 1_000_000, F.col("t")).alias(
            "query_share_pct"
        ),
    )


def vec_nn_margin_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor separability census (SURVEY §2.AN): for the
    deterministic query sample (vec_id ≡ 0 mod {_Q_MOD}), the exact
    (top1 − top2) cosine margin banded into centi-sim buckets. A mass
    at band 0 means ranks flip under any approximation — the number
    that sets realistic ANN recall targets BEFORE an index ships
    (relative-contrast, measured not assumed).

    Shape at scale: the broadcast Q-block BNLJ (the allowlisted
    ``vec_batch_knn``/``vec_rank_metrics`` class — Q-bounded, never
    corpus × corpus), one Q-keyed rank window, then a band census over
    Q rows. Margins are differences of decimal-stable sims — identical
    doubles on both engines, so the integer FLOOR band is exact."""
    return nn_margin_census_over(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        _Q_MOD,
    )


# ---------------------------------------------------------------------------
# vec_hubness_census — k-occurrence histogram over the sample's top-k
# ---------------------------------------------------------------------------


def vec_hubness_census_oracle() -> str:
    share = dratio_sql("n_vecs * 1000000", "tot.t")
    return f"""
WITH {_Q_SIMS_CTE}, ranked AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, vec_id) AS rn
  FROM dots
), occ AS (
  SELECT vec_id, COUNT(*) AS k_occ
  FROM ranked WHERE rn <= {_HUB_K} GROUP BY vec_id
), cand AS (
  SELECT vec_id FROM embeddings WHERE vec_id % {_Q_MOD} <> 0
), k AS (
  SELECT COALESCE(occ.k_occ, 0) AS k_occurrence
  FROM cand LEFT JOIN occ USING (vec_id)
), census AS (
  SELECT k_occurrence, COUNT(*) AS n_vecs FROM k GROUP BY 1
), tot AS (SELECT SUM(n_vecs) AS t FROM census)
SELECT CAST(k_occurrence AS BIGINT) AS k_occurrence,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       {share} AS vec_share_pct
FROM census, tot
"""


def hubness_census_over(e: DataFrame, q_mod: int, k: int) -> DataFrame:
    """KERNEL — the k-occurrence histogram over any (vec_id,
    embedding) frame. Factored out of :func:`vec_hubness_census` so
    the staged suite can plant a hub (a vector near every query) and
    assert it tops the histogram."""
    sims = _q_sims(e, q_mod)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    occ = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("k_occ"))
    )
    cand = e.filter(F.col("vec_id") % q_mod != 0).select("vec_id")
    kf = cand.join(occ, "vec_id", "left").select(
        F.coalesce("k_occ", F.lit(0)).alias("k_occurrence")
    )
    census = kf.groupBy("k_occurrence").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    tot = census.agg(F.sum("n_vecs").alias("t"))
    return census.crossJoin(F.broadcast(tot)).select(
        F.col("k_occurrence").cast("long").alias("k_occurrence"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        dratio(F.col("n_vecs") * 1_000_000, F.col("t")).alias(
            "vec_share_pct"
        ),
    )


def vec_hubness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness census (SURVEY §2.AN): how often each candidate vector
    appears in the query sample's top-{_HUB_K} lists, as a
    k-occurrence histogram including the never-retrieved mass
    (k_occurrence = 0). A heavy right tail (hubs) with a large orphan
    mass is the classic high-dimensional pathology: hubs crowd out
    true neighbors, IVF cells centered on them bloat, and recall
    evaluations quietly overweight them.

    Shape at scale: the same Q-bounded broadcast-block sims as the
    margin census, one rank window, an occurrence fold keyed by
    candidate, and a LEFT join of the candidate id set against the
    occurrence census (retrieved ids ≤ Q·k rows — broadcastable).
    Census-sized output; integers end to end."""
    return hubness_census_over(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        _Q_MOD,
        _HUB_K,
    )
