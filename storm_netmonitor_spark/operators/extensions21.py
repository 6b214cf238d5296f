"""Round-15 candidate operators, first batch, PRE-STAGED (SURVEY
§2.AL; the staging discipline of the §2.W–§2.AK batches applied
forward).

NOTHING in this module is registered: the registry closed the round-14
registrations at 327, so there is no ``@query`` decorator here — each
candidate ships as a plain callable plus a module-level oracle builder,
wired into ``tests/test_extensions21_staged.py``.

Capability anchor: SURVEY §2.AL — SPLIT HYGIENE ECONOMICS. The engine
already ASSIGNS splits (``sample_split_hash``), verifies near-dup
pairs (``text_ngram_jaccard``), and decontaminates against external
benchmarks (``text_decontaminate``); what a pipeline owner still
cannot see is what the split itself costs — how much near-dup mass
STRADDLES the split boundary (self-contamination: a test doc whose
near-twin sits in train), whether a k-fold carve is balanced per
source, and whether a TIME-based split leaks through entities that
span the cutoff:

- ``sample_split_leakage`` — the cross-split near-dup census: every
  VERIFIED near-dup pair (the maintained ``text_ngram_jaccard``
  artifact) classified by the md5-split of its two endpoints; pairs
  whose endpoints land in different splits are the leakage the
  held-out metric silently inherits;
- ``sample_kfold_balance`` — the deterministic k-fold carve
  (hash-mod, the ``pipeline_epoch_shuffle`` hex idiom) audited per
  (fold, source): doc and char counts plus each fold's share of its
  source — the stratification check BEFORE cross-validation spends
  k× the training budget;
- ``pipeline_temporal_split_gate`` — the time-split integrity census
  on events: at a fixed cutoff, every user is train-only, eval-only,
  or a STRADDLER; straddlers are the entity-leakage surface of a
  temporal split (their eval rows share user-level state with train).

All decision arithmetic is integers (pair/doc/user/event counts and
hash buckets); shares are dratio rationals on emitted values only.
The split classification is ROW-LOCAL md5 arithmetic on ids — no join
against the corpus to recover assignments, so every census here runs
on the artifact/census scale, never the corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table
from .text import NGRAM_PAIRS_CTE

# ---------------------------------------------------------------------------
# sample_split_leakage — near-dup pairs straddling the split boundary
# ---------------------------------------------------------------------------

#: Same thresholds as the registered artifact: the pair list IS the
#: ``text_ngram_jaccard`` output (jaccard >= 0.05 verified pairs).


def _split_sql_of(col: str) -> str:
    """The ``sample_split_hash`` md5 bucket rendered over an arbitrary
    id column — the SAME 12/2/2 hex carve as ``pipeline._SPLIT_SQL``,
    parameterized so pair endpoints classify row-locally (no join back
    to ``documents`` to recover an assignment both engines can
    recompute from the id)."""
    h = f"substr(md5(CAST({col} AS VARCHAR)), 1, 1)"
    return (
        f"CASE WHEN {h} BETWEEN '0' AND 'b' THEN 'train' "
        f"WHEN {h} IN ('c', 'd') THEN 'val' ELSE 'test' END"
    )


def _split_col_of(col: Column) -> Column:
    h = F.substring(F.md5(col.cast("string")), 1, 1)
    return (
        F.when(h.between("0", "b"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    )


def sample_split_leakage_oracle() -> str:
    share = dratio_sql("n_pairs * 1000000", "tot.t")
    return f"""
WITH {NGRAM_PAIRS_CTE}, verified AS (
  SELECT doc_a, doc_b FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.05
), sp AS (
  SELECT doc_a, doc_b,
         LEAST({_split_sql_of('doc_a')}, {_split_sql_of('doc_b')})
           AS split_a,
         GREATEST({_split_sql_of('doc_a')}, {_split_sql_of('doc_b')})
           AS split_b
  FROM verified
), byp AS (
  SELECT split_a, split_b, COUNT(*) AS n_pairs
  FROM sp GROUP BY 1, 2
), bd AS (
  SELECT split_a, split_b, COUNT(DISTINCT doc_id) AS n_docs
  FROM (SELECT split_a, split_b, doc_a AS doc_id FROM sp
        UNION ALL
        SELECT split_a, split_b, doc_b FROM sp)
  GROUP BY 1, 2
), tot AS (SELECT COUNT(*) AS t FROM sp)
SELECT split_a, split_b,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS BIGINT)
         AS cross_split,
       {share} AS pair_share_pct
FROM byp JOIN bd USING (split_a, split_b), tot
"""


def split_leakage_over(pairs: DataFrame) -> DataFrame:
    """KERNEL — the cross-split census over any verified-pair frame
    with (doc_a, doc_b) columns. Factored out of
    :func:`sample_split_leakage` so the staged suite can plant pair
    populations that exercise every (split_a, split_b) cell (the
    corpus carries a single verified pair at the test SFs)."""
    sa = _split_col_of(F.col("doc_a"))
    sb = _split_col_of(F.col("doc_b"))
    sp = pairs.select(
        "doc_a",
        "doc_b",
        F.least(sa, sb).alias("split_a"),
        F.greatest(sa, sb).alias("split_b"),
    )
    byp = sp.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    bd = (
        sp.select(
            "split_a",
            "split_b",
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    tot = sp.agg(F.count(F.lit(1)).alias("t"))
    return (
        byp.join(bd, ["split_a", "split_b"])
        .crossJoin(F.broadcast(tot))
        .select(
            "split_a",
            "split_b",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.when(F.col("split_a") != F.col("split_b"), 1)
            .otherwise(0)
            .cast("long")
            .alias("cross_split"),
            dratio(F.col("n_pairs") * 1_000_000, F.col("t")).alias(
                "pair_share_pct"
            ),
        )
    )


def sample_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-dup leakage census (SURVEY §2.AL): every
    VERIFIED near-dup pair from the maintained ``text_ngram_jaccard``
    artifact, classified by the md5 split of its endpoints — the
    ordered (split_a, split_b) census of ``(n_pairs, n_docs,
    cross_split, pair_share_pct)``. Rows with ``cross_split = 1`` are
    the held-out contamination the split inherited: a test/val doc
    whose near-twin trains.

    Shape at scale: the input is the pair ARTIFACT (census-sized,
    fingerprint-keyed persist — no corpus rescan), the split of each
    endpoint is row-local md5 arithmetic on the id (no join against
    ``documents``), and the census is one (split_a, split_b)-keyed
    fold over at most a 3×3 cell space; the single-row total attaches
    broadcast. Work is O(|pairs|), independent of corpus size."""
    from .text import text_ngram_jaccard

    return split_leakage_over(
        text_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# sample_kfold_balance — per-(fold, source) balance of the k-fold carve
# ---------------------------------------------------------------------------

#: Fold count of the deterministic carve. 5 is the conventional CV
#: arity; the kernel takes it as a parameter.
_KFOLD_K = 5

#: Hash-mod fold assignment: the first 8 md5 hex chars as an integer,
#: mod K — the ``pipeline_epoch_shuffle`` hex idiom (non-negative in
#: both engines: a 32-bit hex literal is positive in a BIGINT).
_KFOLD_SQL = (
    "CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    f"AS BIGINT) % {_KFOLD_K} AS BIGINT)"
)


def sample_kfold_balance_oracle() -> str:
    share = dratio_sql("n_docs * 1000000", "src_n")
    return f"""
WITH assigned AS (
  SELECT {_KFOLD_SQL} AS fold, source, n_chars FROM documents
), cell AS (
  SELECT fold, source, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
  FROM assigned GROUP BY 1, 2
), srct AS (
  SELECT source, SUM(n_docs) AS src_n FROM cell GROUP BY source
)
SELECT fold, source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_chars AS BIGINT) AS n_chars,
       {share} AS fold_share_pct
FROM cell JOIN srct USING (source)
"""


def kfold_balance_over(docs: DataFrame, k: int) -> DataFrame:
    """KERNEL — the (fold, source) balance census over any frame with
    (doc_id, source, n_chars) columns. Factored out of
    :func:`sample_kfold_balance` so the staged suite can plant a
    skewed source and assert the share arithmetic against hand
    counts."""
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % k
    )
    cell = (
        docs.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    srct = cell.groupBy("source").agg(F.sum("n_docs").alias("src_n"))
    return cell.join(F.broadcast(srct), "source").select(
        "fold",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_chars").cast("long").alias("n_chars"),
        dratio(F.col("n_docs") * 1_000_000, F.col("src_n")).alias(
            "fold_share_pct"
        ),
    )


def sample_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-fold carve balance audit (SURVEY §2.AL): the deterministic
    hash-mod fold assignment (md5 hex → BIGINT → mod {_KFOLD_K}, the
    ``pipeline_epoch_shuffle`` idiom — no RNG state, stable under
    reruns and repartitioning) audited per (fold, source): doc and
    char counts plus each fold's ppm share of its source. A fold whose
    share drifts far from 1/k for some source trains/validates on a
    skewed slice — the stratification check before cross-validation
    spends k× the budget.

    Shape at scale: fold is row-local md5 arithmetic; ONE
    (fold, source)-keyed map-side-combining exchange builds the cell
    census; source totals fold from the CELLS (k × S rows, never the
    corpus) and attach broadcast."""
    return kfold_balance_over(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        ),
        _KFOLD_K,
    )


# ---------------------------------------------------------------------------
# pipeline_temporal_split_gate — entity leakage across a time cutoff
# ---------------------------------------------------------------------------

#: The fixed split boundary: the final week of the testdata event
#: calendar (2024-01-01 .. 2024-01-30) becomes the eval window. A real
#: deployment derives this from the training-data freeze date — a
#: CONSTANT, so both engines classify rows identically.
_TSPLIT_CUTOFF = "2024-01-24 00:00:00"


def pipeline_temporal_split_gate_oracle() -> str:
    share = dratio_sql("n_events * 1000000", "tot.t")
    return f"""
WITH cls AS (
  SELECT user_id,
         COUNT(*) AS n_ev,
         MAX(CASE WHEN CAST(ts AS TIMESTAMP)
                       < TIMESTAMP '{_TSPLIT_CUTOFF}' THEN 1 ELSE 0 END)
           AS has_train,
         MAX(CASE WHEN CAST(ts AS TIMESTAMP)
                       >= TIMESTAMP '{_TSPLIT_CUTOFF}' THEN 1 ELSE 0 END)
           AS has_eval
  FROM events GROUP BY user_id
), seg AS (
  SELECT CASE WHEN has_train = 1 AND has_eval = 1 THEN 'straddle'
              WHEN has_train = 1 THEN 'train_only'
              ELSE 'eval_only' END AS segment,
         user_id, n_ev
  FROM cls
), agg AS (
  SELECT segment, COUNT(*) AS n_users, SUM(n_ev) AS n_events
  FROM seg GROUP BY segment
), tot AS (SELECT SUM(n_events) AS t FROM agg)
SELECT segment,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_events AS BIGINT) AS n_events,
       {share} AS events_share_pct
FROM agg, tot
"""


def temporal_split_over(events: DataFrame, cutoff: str) -> DataFrame:
    """KERNEL — the train/eval/straddle user census over any frame
    with (user_id, ts) columns at a literal cutoff. Factored out of
    :func:`pipeline_temporal_split_gate` so the staged suite can plant
    users in each segment and assert the classification."""
    cut = F.to_timestamp(F.lit(cutoff))
    cls = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("has_train"),
        F.max(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("has_eval"),
    )
    seg = cls.select(
        F.when(
            (F.col("has_train") == 1) & (F.col("has_eval") == 1), "straddle"
        )
        .when(F.col("has_train") == 1, "train_only")
        .otherwise("eval_only")
        .alias("segment"),
        "n_ev",
    )
    agg = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_ev").alias("n_events"),
    )
    tot = agg.agg(F.sum("n_events").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "segment",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
        dratio(F.col("n_events") * 1_000_000, F.col("t")).alias(
            "events_share_pct"
        ),
    )


def pipeline_temporal_split_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-split integrity census (SURVEY §2.AL): at the fixed
    cutoff {_TSPLIT_CUTOFF}, classify every user as ``train_only``,
    ``eval_only``, or ``straddle`` and report user/event counts plus
    each segment's ppm share of all events. STRADDLERS are the
    entity-leakage surface of a time split: their eval-window rows
    share user-level state (habits, identifiers, sequences) with rows
    the model trained on — the per-entity analogue of the near-dup
    leakage ``sample_split_leakage`` prices for documents.

    Shape at scale: the cutoff comparisons are row-local; ONE
    user-keyed map-side-combining exchange builds the per-user flags;
    the segment fold is 3 rows; the single-row total attaches
    broadcast. O(events) map work + one keyed exchange."""
    return temporal_split_over(
        load_table(spark, sf_dir, "events").select("user_id", "ts"),
        _TSPLIT_CUTOFF,
    )
