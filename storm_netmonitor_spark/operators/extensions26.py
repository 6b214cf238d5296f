"""Round-15 candidate operators, sixth batch, PRE-STAGED (SURVEY
§2.AQ; the staging discipline of the §2.W–§2.AP batches applied
forward).

NOTHING in this module is registered: the registry closed the round-14
registrations at 327, so there is no ``@query`` decorator here — each
candidate ships as a plain callable plus a module-level oracle builder,
wired into ``tests/test_extensions26_staged.py``.

Capability anchor: SURVEY §2.AQ — PRIVACY CLOSURE, DETERMINISTIC
SAMPLING & VALUE FORENSICS. The privacy audit ladder stops at
l-diversity (a group can satisfy l and still leak when its sensitive
distribution hugs one value — the skewness attack t-closeness
measures); the sampling family draws stratified/weighted/systematic
but not the plain UNIFORM deterministic reservoir audits are built
on; and nothing yet reads a numeric column's VALUE SHAPE (the
Benford first-digit census — the classic fabricated-data and
unit-mixup alarm):

- ``agg_t_closeness`` — the t-closeness audit on the same QI/
  sensitive contract as the registered k-anonymity/l-diversity
  census: per group, the 1-D earth-mover's distance between the
  group's sensitive-bucket distribution and the global one, with the
  ABOVE-t decision taken in EXACT integer arithmetic (cross-
  multiplied cumulants — no float threshold);
- ``sample_reservoir_hash`` — the deterministic uniform reservoir:
  k docs per source by md5-rank (no RNG state, stable under reruns
  and repartitioning — the ``sample_split_hash`` argument applied to
  sampling), emitted with their ranks;
- ``agg_benford_deviation`` — the first-digit census of a positive
  numeric column vs the Benford expectation (embedded ppm
  constants, identical literals on both engines), per digit count /
  share / deviation.

All decision arithmetic is integers (bucket counts, cross-multiplied
EMD cumulants, md5 ranks, digit counts); shares are dratio rationals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table, tiny_local_frame
from .extensions18 import _LDIV_SENS_SQL

# ---------------------------------------------------------------------------
# agg_t_closeness — the skewness step beyond l-diversity
# ---------------------------------------------------------------------------

#: Closeness ceiling: a QI group whose sensitive-bucket distribution
#: sits more than t (EMD) from the global distribution leaks the
#: sensitive attribute through skew, however large and diverse the
#: group. Expressed as a PERCENT integer so the above-t decision is
#: pure integer arithmetic: EMD > t  ⇔  100·D > t%·g·N·(B−1).
_TCLOSE_T_PCT = 35


def agg_t_closeness_oracle() -> str:
    max_emd = "CAST(MAX(emd) AS DOUBLE)"
    return f"""
WITH sens AS (
  SELECT c_nationkey, c_mktsegment, {_LDIV_SENS_SQL} AS b FROM customer
), gb AS (
  SELECT b, COUNT(*) AS nb FROM sens GROUP BY b
), tot AS (SELECT SUM(nb) AS n, COUNT(*) AS nbuckets FROM gb),
grp AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS g
  FROM sens GROUP BY c_nationkey, c_mktsegment
), cell AS (
  SELECT c_nationkey, c_mktsegment, b, COUNT(*) AS ngb
  FROM sens GROUP BY c_nationkey, c_mktsegment, b
), grid AS (
  SELECT grp.c_nationkey, grp.c_mktsegment, grp.g, gb.b, gb.nb,
         COALESCE(cell.ngb, 0) AS ngb
  FROM grp CROSS JOIN gb
  LEFT JOIN cell ON cell.c_nationkey = grp.c_nationkey
               AND cell.c_mktsegment = grp.c_mktsegment
               AND cell.b = gb.b
), cum AS (
  SELECT c_nationkey, c_mktsegment, g,
         SUM(ngb * (SELECT n FROM tot) - nb * g)
           OVER (PARTITION BY c_nationkey, c_mktsegment
                 ORDER BY b ROWS UNBOUNDED PRECEDING) AS c
  FROM grid
), dgrp AS (
  SELECT c_nationkey, c_mktsegment, g, SUM(ABS(c)) AS d
  FROM cum GROUP BY c_nationkey, c_mktsegment, g
), emds AS (
  SELECT g, d,
         CAST(100 * d > {_TCLOSE_T_PCT} * g * (SELECT n FROM tot)
              * ((SELECT nbuckets FROM tot) - 1) AS INT) AS above,
         {dratio_sql(
             "d * 1000000",
             "g * (SELECT n FROM tot) * ((SELECT nbuckets FROM tot) - 1)",
         )} AS emd
  FROM dgrp
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(above) AS BIGINT) AS groups_above_t,
       CAST(COALESCE(SUM(CASE WHEN above = 1 THEN g END), 0) AS BIGINT)
         AS rows_at_risk,
       {max_emd} AS max_emd,
       CAST(SUM(g) AS BIGINT) AS n_rows
FROM emds
"""


def t_closeness_summary(
    df: DataFrame, qi_cols, sens, t_pct: int
) -> DataFrame:
    """KERNEL — the t-closeness summary over any frame, QI column
    list, and INTEGER sensitive-bucket expression. Factored out of
    :func:`agg_t_closeness` so the staged suite can plant a skewed
    group (all mass in one bucket) and assert the exact integer EMD.

    The 1-D ordered-bucket EMD is computed in cross-multiplied
    integers: per (group, bucket), the cumulant of
    ``ngb·N − nb·g`` (exact BIGINTs); ``D = Σ|cumulant|``;
    ``EMD = D / (g·N·(B−1))``. The above-t decision compares
    ``100·D`` with ``t%·g·N·(B−1)`` — no float enters any decision;
    the emitted EMD is the dratio rational of the same integers."""
    sens_col = sens.alias("b")
    rows = df.select(*qi_cols, sens_col)
    gb = rows.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    tot = gb.agg(
        F.sum("nb").alias("n"), F.count(F.lit(1)).alias("nbuckets")
    )
    grp = rows.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("g"))
    cell = rows.groupBy(*qi_cols, "b").agg(
        F.count(F.lit(1)).alias("ngb")
    )
    grid = (
        grp.crossJoin(F.broadcast(gb))
        .join(cell, [*qi_cols, "b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            *qi_cols,
            "g",
            "b",
            "nb",
            "n",
            "nbuckets",
            F.coalesce("ngb", F.lit(0)).alias("ngb"),
        )
    )
    wc = Window.partitionBy(*qi_cols).orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        *qi_cols,
        "g",
        "n",
        "nbuckets",
        F.sum(F.col("ngb") * F.col("n") - F.col("nb") * F.col("g"))
        .over(wc)
        .alias("c"),
    )
    dgrp = cum.groupBy(*qi_cols, "g", "n", "nbuckets").agg(
        F.sum(F.abs(F.col("c"))).alias("d")
    )
    den = F.col("g") * F.col("n") * (F.col("nbuckets") - 1)
    emds = dgrp.select(
        "g",
        (100 * F.col("d") > t_pct * den).cast("int").alias("above"),
        dratio(F.col("d") * 1_000_000, den).alias("emd"),
    )
    return emds.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("above").cast("long").alias("groups_above_t"),
        F.coalesce(
            F.sum(F.when(F.col("above") == 1, F.col("g"))), F.lit(0)
        )
        .cast("long")
        .alias("rows_at_risk"),
        F.max("emd").cast("double").alias("max_emd"),
        F.sum("g").cast("long").alias("n_rows"),
    )


def agg_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (SURVEY §2.AQ): the third rung of the privacy
    ladder on the SAME (c_nationkey, c_mktsegment) QI and
    acctbal-thousand-bucket sensitive contract as the registered
    k-anonymity and l-diversity censuses — a group can satisfy both k
    and l and still leak through SKEW (its sensitive distribution
    piled on one bucket). Reports the group census, above-t groups
    and their row exposure, and the table's worst EMD.

    Shape at scale: one bucket-keyed global census (B rows), one
    QI-keyed group census, one (QI, bucket)-keyed cell census, the
    B-row broadcast grid attach, and per-group cumulant windows over
    B rows — everything after the three map-side-combining exchanges
    is census-sized. Integer-exact decisions (the cross-multiplied
    cumulant trick); bound: ngb·N stays inside BIGINT for tables to
    ~3·10⁹ rows per side, documented."""
    return t_closeness_summary(
        load_table(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        F.expr(_LDIV_SENS_SQL),
        _TCLOSE_T_PCT,
    )


# ---------------------------------------------------------------------------
# sample_reservoir_hash — deterministic uniform k-per-source reservoir
# ---------------------------------------------------------------------------

#: Reservoir size per source and the rank salt (a constant of the
#: draw — rotating it is a new, equally deterministic sample).
_RESERVOIR_K = 5
_RESERVOIR_SALT = "r15"


def sample_reservoir_hash_oracle() -> str:
    return f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('{_RESERVOIR_SALT}|' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS rk
  FROM documents
)
SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_RESERVOIR_K}
"""


def reservoir_hash_over(docs: DataFrame, k: int, salt: str) -> DataFrame:
    """KERNEL — the deterministic reservoir over any (source, doc_id)
    frame. Factored out of :func:`sample_reservoir_hash` so the
    staged suite can recompute the md5 order in python and assert the
    exact winner set."""
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
        .select("source", "doc_id", F.col("rk").cast("long").alias("rk"))
    )


def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform reservoir (SURVEY §2.AQ):
    {_RESERVOIR_K} docs per source by md5-rank — the audit sample
    every human-review / labeling loop draws, made reproducible with
    no RNG state (the ``sample_split_hash`` argument applied to
    sampling: content-hash order is uniform over ids, stable under
    reruns, repartitioning, and cluster size).

    Shape at scale: ONE source-keyed rank window; at 100 TB the
    window is per-source and the k-row cut means the exchange can
    carry per-partition shortlists (rank-k pushdown via the window
    TopK optimization). No collect, no RNG seed coordination."""
    return reservoir_hash_over(
        load_table(spark, sf_dir, "documents").select("source", "doc_id"),
        _RESERVOIR_K,
        _RESERVOIR_SALT,
    )


# ---------------------------------------------------------------------------
# agg_benford_deviation — first-digit census vs the Benford expectation
# ---------------------------------------------------------------------------

#: Benford expected shares in ppm, rounded once in python and embedded
#: as LITERALS in both renderings — no engine computes a logarithm of
#: its own for the expectation.
_BENFORD_PPM = {
    d: round(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}


def agg_benford_deviation_oracle() -> str:
    lits = ", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())
    return f"""
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice
              / POWER(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
), census AS (
  SELECT digit, COUNT(*) AS n FROM v GROUP BY digit
), bf(digit, benford_ppm) AS (VALUES {lits}),
tot AS (SELECT SUM(n) AS t FROM census)
SELECT bf.digit,
       CAST(COALESCE(n, 0) AS BIGINT) AS n,
       {dratio_sql("COALESCE(n, 0) * 1000000", "tot.t")} AS share_pct,
       CAST(benford_ppm AS DOUBLE) / 1000000.0 AS benford_pct,
       CAST({dratio_sql("COALESCE(n, 0) * 1000000", "tot.t")}
            - CAST(benford_ppm AS DOUBLE) / 1000000.0 AS DOUBLE) AS dev_pct
FROM bf LEFT JOIN census USING (digit), tot
"""


def benford_over(vals: DataFrame) -> DataFrame:
    """KERNEL — the first-digit census over any single-column frame
    ``(x double)`` of positive values. Factored out of
    :func:`agg_benford_deviation` so the staged suite can plant a
    fabricated-looking population (all 5s) and a Benford-ish one and
    assert the deviation signs."""
    spark = vals.sparkSession
    v = vals.filter(F.col("x") > 0).select(
        F.floor(
            F.col("x") / F.pow(F.lit(10.0), F.floor(F.log10("x")))
        )
        .cast("long")
        .alias("digit")
    )
    census = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    bf = tiny_local_frame(
        spark,
        [(d, p) for d, p in _BENFORD_PPM.items()],
        "digit long, benford_ppm long",
    )
    tot = census.agg(F.sum("n").alias("t"))
    share = dratio(F.coalesce("n", F.lit(0)) * 1_000_000, F.col("t"))
    return (
        bf.join(census, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            share.alias("share_pct"),
            (F.col("benford_ppm").cast("double") / 1_000_000.0).alias(
                "benford_pct"
            ),
            (share - F.col("benford_ppm").cast("double") / 1_000_000.0)
            .cast("double")
            .alias("dev_pct"),
        )
    )


def agg_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit census of ``o_totalprice`` (SURVEY §2.AQ):
    per leading digit, the observed count and share against the
    embedded Benford expectation — the classic fabricated-data /
    unit-mixup / truncation alarm for any positive magnitude column.
    All nine digit rows emit (zero-count digits included), so a
    missing digit reads as the maximal negative deviation it is.

    Shape at scale: the digit is row-local float arithmetic whose
    decision margins are AUDITED (margin_audit §2.AQ row: the minimum
    distance of log10(x) to an integer is ~3.3e-5 on this corpus,
    ~10⁸× the double-rounding scale, so FLOOR never flips between
    engines); ONE digit-keyed map-side-combining exchange; the 9-row
    expectation frame and the 1-row total attach broadcast."""
    return benford_over(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_totalprice").cast("double").alias("x")
        )
    )
