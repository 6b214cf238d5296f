"""Round-15 candidate operators, second batch, PRE-STAGED (SURVEY
§2.AM; the staging discipline of the §2.W–§2.AL batches applied
forward).

NOTHING in this module is registered: the registry closed the round-14
registrations at 327, so there is no ``@query`` decorator here — each
candidate ships as a plain callable plus a module-level oracle builder,
wired into ``tests/test_extensions22_staged.py``.

Capability anchor: SURVEY §2.AM — MIXTURE & CURRICULUM ECONOMICS.
The engine already declares target mixture weights
(``pipeline_mixture_weights``), shuffles epochs deterministically
(``pipeline_epoch_shuffle``), and budgets tokens
(``pipeline_token_budget``); what the pipeline owner still cannot
price is the ALLOCATION arithmetic itself — how a sampling
temperature reshapes the per-source budget, what a length curriculum
schedule costs per stage, and how far the head of each shuffled epoch
drifts from the corpus mix (the early-training bias every run
inherits from its shuffle):

- ``sample_temperature_resample`` — the temperature-scaled source
  allocation (weights ∝ √n, the T=2 convention) as EXACT integer
  largest-remainder arithmetic: every decision is a BIGINT, so both
  engines allocate the identical budget with no float boundary;
- ``pipeline_curriculum_stages`` — the length-curriculum schedule
  census: fixed token-count bands (short→xlong), per-stage doc/token
  counts and CUMULATIVE totals — the price list a curriculum owner
  reads before committing stage boundaries;
- ``pipeline_epoch_mix_drift`` — the head-of-epoch mixture bias: for
  each epoch's deterministic shuffle, the source mix of every shard's
  leading fifth vs the corpus mix, as ppm drift per (epoch, source).

All decision arithmetic is integers (counts, scaled weights, ranks);
shares and drifts are dratio rationals on emitted values only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table

# ---------------------------------------------------------------------------
# sample_temperature_resample — integer largest-remainder allocation
# ---------------------------------------------------------------------------

#: Total post-resampling document budget being allocated across
#: sources. A constant of the schedule, not of the corpus.
_RESAMPLE_BUDGET = 100_000

#: Fixed-point scale of the √n weights: FLOOR(√n · 1000) — exact in
#: both engines (IEEE sqrt is correctly rounded; the ×1000 product of a
#: ≤ 2^26 value is exact in a double; FLOOR is deterministic).
_W_SCALE = 1_000


def temperature_ctes_sql(where: str) -> str:
    """THE largest-remainder CTE chain over ``documents WHERE {where}``
    — the single SQL rendering of :func:`temperature_alloc_over`,
    shared by this oracle and the §2.AO mixture gate's (which restricts
    it to the standing corpus) so the two cannot drift (the ADVICE r13
    duplicated-CTE lesson applied forward). Ends with ``alloc(source,
    n_docs, weight_milli, alloc_n)``."""
    return f"""
src AS (
  SELECT source, COUNT(*) AS n_docs FROM documents
  WHERE {where} GROUP BY source
), w AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(n_docs) * {_W_SCALE}) AS BIGINT) AS weight_milli
  FROM src
), tw AS (SELECT SUM(weight_milli) AS ws FROM w),
base AS (
  SELECT source, n_docs, weight_milli,
         ({_RESAMPLE_BUDGET} * weight_milli) // ws AS floor_n,
         ({_RESAMPLE_BUDGET} * weight_milli) % ws AS rem
  FROM w, tw
), lo AS (
  SELECT {_RESAMPLE_BUDGET} - SUM(floor_n) AS leftover FROM base
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
  FROM base
), alloc AS (
  SELECT source, n_docs, weight_milli,
         floor_n + CASE WHEN rk <= (SELECT leftover FROM lo)
                        THEN 1 ELSE 0 END AS alloc_n
  FROM ranked
)"""


def sample_temperature_resample_oracle() -> str:
    ashare = dratio_sql("alloc_n * 1000000", f"{_RESAMPLE_BUDGET}")
    cshare = dratio_sql("n_docs * 1000000", "tot.n")
    return f"""
WITH {temperature_ctes_sql("1 = 1")},
tot AS (SELECT SUM(n_docs) AS n FROM src)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(weight_milli AS BIGINT) AS weight_milli,
       CAST(alloc_n AS BIGINT) AS alloc_n,
       {ashare} AS alloc_share_pct,
       {cshare} AS corpus_share_pct
FROM alloc, tot
"""


def temperature_alloc_over(
    src_counts: DataFrame, budget: int
) -> DataFrame:
    """KERNEL — the exact integer largest-remainder allocation over any
    (source, n_docs) census frame. Factored out of
    :func:`sample_temperature_resample` so the staged suite can plant
    skewed censuses and assert the allocation sums EXACTLY to the
    budget with hand-checkable winners.

    Every step is BIGINT: w = ⌊√n·{_W_SCALE}⌋, floor quota
    ``budget·w div Σw``, remainder ``budget·w mod Σw``, and the
    leftover goes to the largest remainders (ties broken by source
    name). The windows run over the SOURCE CENSUS (S rows — a
    dimension, never the corpus), so the global window is a deliberate
    S-bounded fold, not a scale smell."""
    w = src_counts.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs")) * _W_SCALE)
        .cast("long")
        .alias("weight_milli"),
    )
    ws = Window.partitionBy()
    base = w.select(
        "source",
        "n_docs",
        "weight_milli",
        F.expr(
            f"CAST({budget} * weight_milli AS BIGINT) DIV "
            f"SUM(weight_milli) OVER ()"
        ).alias("floor_n"),
        (
            (F.lit(budget) * F.col("weight_milli"))
            % F.sum("weight_milli").over(ws)
        ).alias("rem"),
        F.sum("n_docs").over(ws).alias("n"),
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("rem"), "source"))
        .alias("rk"),
        (F.lit(budget) - F.sum("floor_n").over(ws)).alias("leftover"),
    )
    return ranked.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "weight_milli",
        (
            F.col("floor_n")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_n"),
        dratio(
            (
                F.col("floor_n")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            * 1_000_000,
            F.lit(budget),
        ).alias("alloc_share_pct"),
        dratio(F.col("n_docs") * 1_000_000, F.col("n")).alias(
            "corpus_share_pct"
        ),
    )


def sample_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source allocation (SURVEY §2.AM): the
    T=2 resampling convention (target share ∝ √n — up-weights the
    tail sources a proportional draw starves) allocated over a
    {_RESAMPLE_BUDGET}-doc budget with EXACT integer largest-remainder
    arithmetic. Emits per source the census count, the fixed-point
    weight, the allocated quota (sums to the budget by construction),
    and the allocated vs proportional ppm shares — the reshaping a
    mixture owner signs off on before the resample runs.

    Shape at scale: ONE source-keyed map-side-combining count over the
    corpus; everything after runs on the S-row census (S = source
    dimension), where the global windows are deliberate S-bounded
    folds. No float enters a decision: ⌊√n·{_W_SCALE}⌋ is exact IEEE
    in both engines, quotas/remainders/ranks are BIGINTs."""
    src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return temperature_alloc_over(src, _RESAMPLE_BUDGET)


# ---------------------------------------------------------------------------
# pipeline_curriculum_stages — length-curriculum schedule census
# ---------------------------------------------------------------------------

#: Fixed stage boundaries over the corpus token contract (split on
#: single spaces, empties filtered): stage 1 = [0,32), 2 = [32,64),
#: 3 = [64,96), 4 = [96,∞) — short→long, the canonical length
#: curriculum. Constants of the schedule; integer comparisons only.
_STAGE_BOUNDS = (32, 64, 96)
_STAGE_LABELS = ("short", "medium", "long", "xlong")


def _stage_case_sql() -> str:
    b1, b2, b3 = _STAGE_BOUNDS
    return f"""CASE WHEN tok_n < {b1} THEN 1
       WHEN tok_n < {b2} THEN 2
       WHEN tok_n < {b3} THEN 3
       ELSE 4 END"""


def pipeline_curriculum_stages_oracle() -> str:
    share = dratio_sql("n_tokens * 1000000", "tot.t")
    labels = ", ".join(
        f"({i + 1}, '{lab}')" for i, lab in enumerate(_STAGE_LABELS)
    )
    return f"""
WITH toks AS (
  SELECT len(list_filter(string_split(lower(text), ' '),
                         x -> x <> '')) AS tok_n
  FROM documents
), staged AS (
  SELECT {_stage_case_sql()} AS stage, tok_n FROM toks
), census AS (
  SELECT stage, COUNT(*) AS n_docs, SUM(tok_n) AS n_tokens
  FROM staged GROUP BY stage
), lab(stage, stage_label) AS (VALUES {labels}),
cum AS (
  SELECT stage, n_docs, n_tokens,
         SUM(n_docs) OVER (ORDER BY stage) AS cum_docs,
         SUM(n_tokens) OVER (ORDER BY stage) AS cum_tokens
  FROM census
), tot AS (SELECT SUM(n_tokens) AS t FROM census)
SELECT cum.stage, stage_label,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_docs AS BIGINT) AS cum_docs,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       {share} AS token_share_pct
FROM cum JOIN lab USING (stage), tot
"""


def curriculum_stages_over(docs: DataFrame) -> DataFrame:
    """KERNEL — the stage census over any frame with a ``text``
    column. Factored out of :func:`pipeline_curriculum_stages` so the
    staged suite can plant docs exactly on the band boundaries and
    assert the edge classification (31/32/63/64/95/96 tokens)."""
    b1, b2, b3 = _STAGE_BOUNDS
    toks = docs.select(
        F.size(
            F.expr("array_remove(split(lower(text), ' '), '')")
        ).alias("tok_n")
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
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_n").alias("n_tokens"),
    )
    spark = docs.sparkSession
    from ..io import tiny_local_frame

    lab = tiny_local_frame(
        spark,
        [(i + 1, l) for i, l in enumerate(_STAGE_LABELS)],
        "stage int, stage_label string",
    )
    wc = Window.partitionBy().orderBy("stage")
    ws = Window.partitionBy()
    cum = census.select(
        "stage",
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(wc).alias("cum_docs"),
        F.sum("n_tokens").over(wc).alias("cum_tokens"),
        F.sum("n_tokens").over(ws).alias("t"),
    )
    return cum.join(F.broadcast(lab), "stage").select(
        "stage",
        "stage_label",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_docs").cast("long").alias("cum_docs"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        dratio(F.col("n_tokens") * 1_000_000, F.col("t")).alias(
            "token_share_pct"
        ),
    )


def pipeline_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum schedule census (SURVEY §2.AM): the corpus
    carved into the fixed short→xlong token bands, with per-stage doc
    and token counts, CUMULATIVE totals in curriculum order, and each
    stage's ppm share of all tokens — what a curriculum owner reads to
    price stage boundaries (how many optimizer steps each stage funds)
    before committing the schedule.

    Shape at scale: token counting is row-local (no explode — ``size``
    over the split array); ONE stage-keyed map-side-combining exchange
    builds the 4-row census; the cumulative windows run over those 4
    rows. O(corpus) map work, census-sized everything else."""
    return curriculum_stages_over(
        load_table(spark, sf_dir, "documents").select("text")
    )


# ---------------------------------------------------------------------------
# pipeline_epoch_mix_drift — head-of-epoch mixture bias census
# ---------------------------------------------------------------------------

#: Epoch salts audited (the registered ``pipeline_epoch_shuffle``
#: convention: order within shard = md5('epochN|' || doc_id)).
_DRIFT_EPOCHS = (1, 2, 3)

#: The audited prefix: each shard's leading FIFTH in epoch order — the
#: slice early training consumes before the first eval.
_PREFIX_DEN = 5


def pipeline_epoch_mix_drift_oracle() -> str:
    from .extensions3 import _N_SHARDS

    pshare = dratio_sql("n_prefix * 1000000", "ptot.p")
    cshare = dratio_sql("src_n * 1000000", "tot.n")
    epochs = ", ".join(f"({e})" for e in _DRIFT_EPOCHS)
    return f"""
WITH ep(epoch) AS (VALUES {epochs}),
assigned AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_N_SHARDS} AS shard
  FROM documents
), ordered AS (
  SELECT ep.epoch, shard, source,
         ROW_NUMBER() OVER (
           PARTITION BY ep.epoch, shard
           ORDER BY md5('epoch' || CAST(ep.epoch AS VARCHAR) || '|'
                        || CAST(doc_id AS VARCHAR)), doc_id) AS pos,
         COUNT(*) OVER (PARTITION BY ep.epoch, shard) AS shard_n
  FROM assigned, ep
), prefix AS (
  SELECT epoch, source FROM ordered
  WHERE pos <= (shard_n + {_PREFIX_DEN - 1}) // {_PREFIX_DEN}
), pc AS (
  SELECT epoch, source, COUNT(*) AS n_prefix
  FROM prefix GROUP BY 1, 2
), ptot AS (
  SELECT epoch, SUM(n_prefix) AS p FROM pc GROUP BY epoch
), sc AS (
  SELECT source, COUNT(*) AS src_n FROM documents GROUP BY source
), tot AS (SELECT COUNT(*) AS n FROM documents)
SELECT pc.epoch, pc.source,
       CAST(n_prefix AS BIGINT) AS n_prefix,
       {pshare} AS prefix_share_pct,
       {cshare} AS corpus_share_pct,
       CAST({pshare} - {cshare} AS DOUBLE) AS drift_ppm
FROM pc
JOIN ptot ON ptot.epoch = pc.epoch
JOIN sc ON sc.source = pc.source, tot
"""


def epoch_mix_drift_over(docs: DataFrame, epochs, n_shards: int) -> DataFrame:
    """KERNEL — the head-of-epoch mix census over any frame with
    (doc_id, source) columns. Factored out of
    :func:`pipeline_epoch_mix_drift` so the staged suite can plant a
    corpus whose prefix provably over-represents one source under a
    chosen salt."""
    spark = docs.sparkSession
    from ..io import tiny_local_frame

    ep = tiny_local_frame(spark, [(e,) for e in epochs], "epoch int")
    assigned = docs.select(
        "doc_id",
        "source",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % n_shards
        ).alias("shard"),
    )
    wsrt = Window.partitionBy("epoch", "shard").orderBy(
        F.md5(
            F.concat(
                F.lit("epoch"),
                F.col("epoch").cast("string"),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ),
        "doc_id",
    )
    wcnt = Window.partitionBy("epoch", "shard")
    ordered = assigned.crossJoin(F.broadcast(ep)).select(
        "epoch",
        "shard",
        "source",
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
    sc = docs.groupBy("source").agg(F.count(F.lit(1)).alias("src_n"))
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    pshare = dratio(F.col("n_prefix") * 1_000_000, F.col("p"))
    cshare = dratio(F.col("src_n") * 1_000_000, F.col("n"))
    return (
        pc.join(F.broadcast(ptot), "epoch")
        .join(F.broadcast(sc), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "epoch",
            "source",
            F.col("n_prefix").cast("long").alias("n_prefix"),
            pshare.alias("prefix_share_pct"),
            cshare.alias("corpus_share_pct"),
            (pshare - cshare).cast("double").alias("drift_ppm"),
        )
    )


def pipeline_epoch_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-of-epoch mixture bias census (SURVEY §2.AM): for each
    audited epoch of the registered deterministic shuffle
    (``pipeline_epoch_shuffle``'s salt-within-shard order), the source
    mix of every shard's leading fifth — the slice early training
    consumes before the first eval — against the corpus mix, as ppm
    drift per (epoch, source). A salt whose prefix over-draws one
    source front-loads that source's gradient signal every rerun; the
    census prices that before the run, not from its loss curve.

    Shape at scale: shard assignment is row-local md5 arithmetic; the
    rank windows are per (epoch, shard) — corpus/shards-sized, the
    registered shuffle's own window shape, never a global sort. One
    (epoch, source)-keyed fold after the prefix filter; epoch/source
    totals are census-sized broadcast attaches."""
    from .extensions3 import _N_SHARDS

    return epoch_mix_drift_over(
        load_table(spark, sf_dir, "documents").select("doc_id", "source"),
        _DRIFT_EPOCHS,
        _N_SHARDS,
    )
