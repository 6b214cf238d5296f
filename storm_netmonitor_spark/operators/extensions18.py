"""Round-14 operators, second batch (SURVEY
§2.AI; the staging discipline of the §2.W–§2.AH batches applied
forward).

REGISTERED in round 14 (the §2.AI batch, staged unregistered through
round 13 per the standing staging discipline): each op carries a full
DuckDB hash oracle, the staged parity/property suite in
``tests/test_extensions18_staged.py``, and a committed vanilla-twin
baseline row.

Capability anchor: SURVEY §2.AI — the COMPOSITION INTEGRITY triple.
Before a corpus ships, its COMPOSITION is audited the way its rows
already are: how much the sources overlap each other (cross-source
contamination), how much a privacy release leaks through low-diversity
groups (the step beyond the registered k-anonymity census), and how
much of the corpus a near-dup threshold choice would actually remove
(the dedup dial's price list):

- ``text_source_overlap_matrix`` — the S×S cross-source census of
  DISTINCT word-3-gram overlap: per source pair (n_grams_a,
  n_grams_b, n_shared, jaccard). The registered dedup family measures
  duplication WITHIN blocks; this measures it ACROSS sources — the
  train/eval-split contamination signal at composition granularity;
- ``agg_l_diversity`` — the l-diversity audit on top of the registered
  k-anonymity QI census: a group can be large enough for k and still
  leak when every member shares the sensitive value; per-group
  DISTINCT sensitive-value counts fold into the same summary shape;
- ``pipeline_dedup_rate_curve`` — the dedup yield curve over the
  VERIFIED near-dup pair artifact: per candidate threshold, how many
  pairs qualify, how many distinct documents they touch, and the
  corpus share at stake — measured BEFORE committing to a threshold,
  from the artifact the pipeline already maintains (no rescan).

All decision arithmetic is integers (gram/group/pair counts); shares
and jaccards are dratio/dround rationals on the emitted values only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dratio, dratio_sql, dround, dround_sql
from ..io import load_table
from ..registry import query
from .text import NGRAM_PAIRS_CTE, text_ngram_jaccard

# ---------------------------------------------------------------------------
# text_source_overlap_matrix — S×S distinct-gram overlap census
# ---------------------------------------------------------------------------

#: Both engines build the same distinct (source, gram) set: word
#: 3-grams over the corpus token contract (split on single spaces,
#: empties filtered).
_SRC_GRAMS_CTE = """
toks AS (
  SELECT source, list_filter(string_split(lower(text), ' '),
                             t -> t <> '') AS tk
  FROM documents
), sgrams AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source,
           unnest(list_transform(generate_series(1, len(tk) - 2),
                  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
    FROM toks
  )
), ssizes AS (
  SELECT source, COUNT(*) AS n FROM sgrams GROUP BY source
)"""


def text_source_overlap_matrix_oracle() -> str:
    jac = dround_sql(
        "CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared)", 4
    )
    return f"""
WITH {_SRC_GRAMS_CTE}, spairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS n_shared
  FROM sgrams a JOIN sgrams b
    ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST(sa.n AS BIGINT) AS n_grams_a,
       CAST(sb.n AS BIGINT) AS n_grams_b,
       CAST(n_shared AS BIGINT) AS n_shared,
       {jac} AS jaccard
FROM spairs
JOIN ssizes sa ON sa.source = source_a
JOIN ssizes sb ON sb.source = source_b
"""


def source_overlap_over(docs: DataFrame) -> DataFrame:
    """KERNEL — the S×S distinct-gram overlap census over any frame
    with (source, text) columns. Factored out of
    :func:`text_source_overlap_matrix` so the staged suite can plant a
    mirrored source (expected jaccard 1.0) and drive the census on
    synthetic frames."""
    tk = docs.select(
        "source",
        F.expr("array_remove(split(lower(text), ' '), '')").alias("tk"),
    )
    # size >= 3 guard, same rendering as text_ngram_jaccard (text.py):
    # a doc with < 3 tokens contributes NO grams — matching the oracle's
    # generate_series(1, len(tk)-2), which emits nothing for such docs
    # (ADVICE r13: the old greatest(size-2, 1) emitted one short/empty
    # gram and made oracle parity depend on an every-doc->=3-token corpus
    # precondition).
    sgrams = tk.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(tk) >= 3 THEN"
                " array_distinct(transform(sequence(1, size(tk) - 2),"
                " i -> concat_ws(' ', slice(tk, i, 3))))"
                " ELSE CAST(array() AS array<string>) END"
            )
        ).alias("gram"),
    ).distinct()
    ssizes = sgrams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sgrams.alias("a")
    b = sgrams.alias("b")
    spairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = ssizes.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_grams_a")
    )
    sb = ssizes.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_grams_b")
    )
    return (
        spairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_grams_a").cast("long").alias("n_grams_a"),
            F.col("n_grams_b").cast("long").alias("n_grams_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
            dround(
                F.col("n_shared").cast("double")
                / (
                    F.col("n_grams_a")
                    + F.col("n_grams_b")
                    - F.col("n_shared")
                ),
                4,
            ).alias("jaccard"),
        )
    )


@query("text_source_overlap_matrix", oracle=text_source_overlap_matrix_oracle())
def text_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination census (SURVEY §2.AI): for every
    source pair, the overlap of their DISTINCT word-3-gram sets —
    the composition-granularity signal that two "different" sources
    are actually mirrors (or that an eval split leaks into train).

    Shape at scale: the gram sets reduce row-locally (the
    ``_with_shingles`` codegen pattern — no explode before the
    distinct), ONE (source, gram)-keyed exchange dedups them, one
    gram-keyed self-join counts intersections — each gram contributes
    at most C(S,2) pairs (S = source count, dimension-sized), so the
    join output is census-bounded, never corpus-bounded. Jaccard is
    emitted (dround-4); every decision input is an integer count."""
    return source_overlap_over(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# agg_l_diversity — the diversity step beyond the k-anonymity census
# ---------------------------------------------------------------------------

#: Diversity floor: a QI group whose members span fewer than L distinct
#: sensitive values leaks that value class (homogeneity attack), no
#: matter how large the group is.
_LDIV_L = 3

#: The sensitive attribute: the account-balance thousand-bucket — a
#: row-local integer derivation both engines compute identically
#: (c_acctbal is DECIMAL in the testdata; FLOOR over a decimal divide
#: is exact).
_LDIV_SENS_SQL = "CAST(FLOOR(c_acctbal / 1000) AS BIGINT)"


def agg_l_diversity_oracle() -> str:
    return f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS grp_n,
         COUNT(DISTINCT {_LDIV_SENS_SQL}) AS grp_l
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(COUNT(CASE WHEN grp_l < {_LDIV_L} THEN 1 END) AS BIGINT)
    AS groups_below_l,
  CAST(COALESCE(SUM(CASE WHEN grp_l < {_LDIV_L} THEN grp_n END), 0)
    AS BIGINT) AS rows_at_risk,
  CAST(MIN(grp_l) AS BIGINT) AS min_l,
  CAST(SUM(grp_n) AS BIGINT) AS n_rows
FROM qi
"""


@query("agg_l_diversity", oracle=agg_l_diversity_oracle())
def agg_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the (c_nationkey, c_mktsegment)
    quasi-identifier against the account-balance thousand-bucket
    sensitive attribute (SURVEY §2.AI): the step beyond the registered
    ``agg_k_anonymity`` — a group can satisfy k and still leak when
    its members share the sensitive value (homogeneity attack).
    Reports the group census, below-l groups and their row exposure,
    and the table's actual l (min distinct sensitive values per
    group).

    Shape at scale: one (QI, sensitive)-keyed distinct + one QI-keyed
    census + the O(|QI-space|) summary fold — the ``agg_k_anonymity``
    plan with one extra map-side-combining exchange. Integer-only."""
    return l_diversity_summary(
        load_table(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        F.expr(_LDIV_SENS_SQL),
        _LDIV_L,
    )


def l_diversity_summary(df: DataFrame, qi_cols, sens, l_floor: int) -> DataFrame:
    """KERNEL — the l-diversity summary over any frame, QI column list,
    and sensitive expression. Factored out of :func:`agg_l_diversity`
    so the staged suite can plant a homogeneous group (the corpus
    itself has none — groups_below_l = 0 is oracle-agreed, detection
    is proven by the plant)."""
    qi = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("grp_n"),
        F.countDistinct(sens).alias("grp_l"),
    )
    below = F.col("grp_l") < l_floor
    return qi.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count(F.when(below, 1)).cast("long").alias("groups_below_l"),
        F.coalesce(F.sum(F.when(below, F.col("grp_n"))), F.lit(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("grp_l").cast("long").alias("min_l"),
        F.sum("grp_n").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# pipeline_dedup_rate_curve — the dedup dial's price list
# ---------------------------------------------------------------------------

#: Candidate thresholds (ascending): the registered pipeline runs at
#: NGRAM_JACCARD_MIN = 0.05; the curve prices the dial positions above
#: it from the SAME verified pair artifact.
_CURVE_THRESHOLDS = (0.05, 0.1, 0.2, 0.4)


def pipeline_dedup_rate_curve_oracle() -> str:
    jac = "CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)"
    share = dratio_sql("n_docs_touched * 1000000", "tot.n_docs")
    t_rows = ", ".join(f"({t})" for t in _CURVE_THRESHOLDS)
    return f"""
WITH {NGRAM_PAIRS_CTE}, verified AS (
  SELECT doc_a, doc_b, {dround_sql(jac, 4)} AS jaccard
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE {jac} >= 0.05
), th(threshold) AS (VALUES {t_rows}),
qual AS (
  SELECT th.threshold, v.doc_a, v.doc_b
  FROM th JOIN verified v ON v.jaccard >= th.threshold
), pc AS (
  SELECT threshold, COUNT(*) AS n_pairs FROM qual GROUP BY threshold
), dc AS (
  SELECT threshold, COUNT(DISTINCT doc_id) AS n_docs_touched
  FROM (SELECT threshold, doc_a AS doc_id FROM qual
        UNION ALL
        SELECT threshold, doc_b FROM qual)
  GROUP BY threshold
), curve AS (
  SELECT th.threshold,
         COALESCE(pc.n_pairs, 0) AS n_pairs,
         COALESCE(dc.n_docs_touched, 0) AS n_docs_touched
  FROM th LEFT JOIN pc USING (threshold) LEFT JOIN dc USING (threshold)
), tot AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT CAST(threshold AS DOUBLE) AS threshold,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_docs_touched AS BIGINT) AS n_docs_touched,
       {share} AS docs_share
FROM curve, tot
"""


@query("pipeline_dedup_rate_curve", oracle=pipeline_dedup_rate_curve_oracle())
def pipeline_dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup yield curve (SURVEY §2.AI): for each candidate
    Jaccard threshold, how many VERIFIED near-dup pairs qualify, how
    many distinct documents they touch, and the corpus share at stake
    — the measurement a pipeline owner reads before moving the dedup
    dial, priced from the pair artifact the pipeline already maintains
    (``text_ngram_jaccard``'s fingerprint-keyed persist — no corpus
    rescan).

    Shape at scale: the artifact is pair-census-sized; the curve is a
    T-row broadcast threshold frame joined over it with a distinct-doc
    rollup per threshold — work bounded by T × |verified pairs|,
    independent of the corpus."""
    pairs = text_ngram_jaccard(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard"
    )
    n_docs = load_table(spark, sf_dir, "documents").count()
    return dedup_curve_over(pairs, _CURVE_THRESHOLDS, n_docs)


def dedup_curve_over(pairs: DataFrame, thresholds, n_docs: int) -> DataFrame:
    """KERNEL — the yield curve over any verified-pair frame
    (doc_a, doc_b, jaccard). Factored out of
    :func:`pipeline_dedup_rate_curve` so the staged suite can plant a
    pair population that exercises every threshold bucket (the corpus
    carries a single verified pair at the test SFs)."""
    spark = pairs.sparkSession
    from ..io import tiny_local_frame

    th = tiny_local_frame(
        spark, [(t,) for t in thresholds], "threshold double"
    )
    qual = pairs.crossJoin(F.broadcast(th)).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    docs = qual.select(
        "threshold", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    )
    curve = (
        th.join(
            qual.groupBy("threshold").agg(
                F.count(F.lit(1)).alias("n_pairs")
            ),
            "threshold",
            "left",
        )
        .join(
            docs.groupBy("threshold").agg(
                F.countDistinct("doc_id").alias("n_docs_touched")
            ),
            "threshold",
            "left",
        )
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs_touched", F.lit(0))
            .cast("long")
            .alias("n_docs_touched"),
        )
    )
    return curve.select(
        "threshold",
        "n_pairs",
        "n_docs_touched",
        dratio(F.col("n_docs_touched") * 1_000_000, F.lit(n_docs)).alias(
            "docs_share"
        ),
    )
