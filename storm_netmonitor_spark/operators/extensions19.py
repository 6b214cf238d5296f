"""Round-14 operators, third batch (SURVEY
§2.AJ; the staging discipline of the §2.W–§2.AI batches applied
forward).

REGISTERED in round 14 (the §2.AJ batch, staged unregistered through
round 13 per the standing staging discipline): each op carries a full
DuckDB hash oracle, the staged parity/property suite in
``tests/test_extensions19_staged.py``, and a committed vanilla-twin
baseline row.

Capability anchor: SURVEY §2.AJ — the SERVING ECONOMICS & TRAFFIC
SHAPE triple. The §2.AH batch TRAINS the tokenizer; production then
SERVES it, and the serving cost (tokens per word), the batch-assembly
cost (packing fill), and the arrival process feeding both (burstiness)
are the numbers a capacity plan is written from:

- ``text_bpe_fertility`` — the corpus tokenized under the FROZEN
  §2.AH merge table: per source (n_words, n_chars, n_tokens,
  fertility). Induction trains on the CAPPED word table; application
  runs over EVERY distinct word (the train-capped / apply-everywhere
  split real tokenizers ship with) — token counts per word come from
  the same exact-greedy merge kernel, joined back to the per-source
  word census;
- ``pipeline_pack_efficiency`` — the fill census of the registered
  ``pack_sequences`` packing: per language (n_bins, n_docs,
  total_chars, max_bin_chars, overflow_bins, fill_pct) — how much of
  the char budget the contiguous packing actually uses, and how many
  bins a boundary-straddling doc overflows;
- ``events_burstiness_fano`` — the Fano factor (variance/mean of
  per-minute event counts) per event type, EXACT: variance and mean
  fold from integer (n, Σc, Σc²) so Fano = (n·Σc² − (Σc)²)/(n·Σc) is
  one dratio over integers — the burstiness index that separates a
  Poisson-like stream (≈1) from bursty alerting traffic (≫1).

All decision arithmetic is integers; emitted ratios are dratio
rationals.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table
from ..registry import query
from .extensions17 import (
    _BPE_ROUNDS,
    _WORDS_CTE,
    _bpe_round_ctes,
    greedy_bpe_merges,
)
from .pipeline import PACK_BUDGET_CHARS

# ---------------------------------------------------------------------------
# text_bpe_fertility — the frozen tokenizer served corpus-wide
# ---------------------------------------------------------------------------


def bpe_apply_rounds_sql(rounds: int) -> str:
    """The frozen-apply CTE chain (aseq1 → aseq{rounds}): per trained
    round the same islands merge as the induction, driven by the
    w{r} winner CTEs. Expects an ``aseq0`` CTE of (w, seq) char
    sequences and the train chain's w{r} CTEs to exist; shared by the
    batch fertility oracle and the streaming fertility gate
    (extensions20)."""
    apply_rounds = []
    for r in range(1, rounds + 1):
        prev = "aseq0" if r == 1 else f"aseq{r - 1}"
        apply_rounds.append(f"""
at{r} AS (
  SELECT w, seq, pos, tok,
         LEAD(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM (SELECT w, seq,
               generate_subscripts(string_split(seq, ' '), 1) AS pos,
               unnest(string_split(seq, ' ')) AS tok
        FROM {prev})
), am{r} AS (
  SELECT t.w, t.pos,
         t.pos - ROW_NUMBER() OVER (PARTITION BY t.w ORDER BY t.pos) AS grp
  FROM at{r} t, w{r} wn WHERE t.tok = wn.l AND t.nxt = wn.r
), as{r} AS (
  SELECT w, pos FROM (
    SELECT w, pos,
           (pos - MIN(pos) OVER (PARTITION BY w, grp)) % 2 AS par
    FROM am{r})
  WHERE par = 0
), aseq{r} AS (
  SELECT t.w,
         string_agg(CASE WHEN sel.pos IS NOT NULL THEN wn.l || wn.r
                         ELSE t.tok END, ' ' ORDER BY t.pos) AS seq
  FROM at{r} t
  LEFT JOIN w{r} wn ON TRUE
  LEFT JOIN as{r} sel ON t.w = sel.w AND t.pos = sel.pos
  LEFT JOIN as{r} prv ON t.w = prv.w AND t.pos = prv.pos + 1
  WHERE prv.pos IS NULL
  GROUP BY t.w
)""")
    return ",".join(apply_rounds)


def text_bpe_fertility_oracle() -> str:
    # the §2.AH induction chain verbatim (winners trained on the CAPPED
    # table), then application CTEs over ALL words: the same islands
    # merge per round, driven by the trained w{r} winners
    train = _WORDS_CTE + "".join(
        "," + _bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1)
    )
    fert = dratio_sql("SUM(cnt * tok_n) * 1000000", "SUM(cnt)")
    return f"""
WITH {train},
all_words AS (
  SELECT w, COUNT(*) AS n FROM toks GROUP BY w
), aseq0 AS (
  SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
  FROM all_words
),{bpe_apply_rounds_sql(_BPE_ROUNDS)},
wtok AS (
  SELECT w, len(string_split(seq, ' ')) AS tok_n FROM aseq{_BPE_ROUNDS}
), census AS (
  SELECT source, w, COUNT(*) AS cnt FROM (
    SELECT source,
           unnest(list_filter(string_split(lower(text), ' '),
                              x -> x <> '')) AS w
    FROM documents)
  GROUP BY source, w
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(SUM(cnt * length(w)) AS BIGINT) AS n_chars,
       CAST(SUM(cnt * tok_n) AS BIGINT) AS n_tokens,
       {fert} AS fertility
FROM census JOIN wtok USING (w)
GROUP BY source
"""


def apply_merges_token_counts(words: DataFrame, merges) -> DataFrame:
    """KERNEL — served token count per word under a FROZEN merge
    table: one Arrow-batched pass over a (w, …) word frame, returning
    it with a ``tok_n`` column. Tokenizing under a frozen tokenizer is
    ROW-LOCAL by nature (the training kernel needs global pair
    aggregation; the apply does not), so the scale shape is a map —
    zero shuffles, embarrassingly parallel over the vocab frame —
    with the R merge tuples closed over as constants. The literal
    greedy loop inside the UDF is the same arithmetic the staged suite
    pins against the pure-python reference and the SQL oracle's
    unrolled islands rounds."""
    from pyspark.sql.functions import pandas_udf

    pairs = [(m[1], m[2]) for m in merges]

    @pandas_udf("int")
    def tokn(col: pd.Series) -> pd.Series:
        def count(w: str) -> int:
            s = list(w)
            for left, right in pairs:
                out, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == left
                        and s[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            return len(s)

        return col.map(count)

    return words.withColumn("tok_n", tokn(F.col("w")))


@query("text_bpe_fertility", oracle=text_bpe_fertility_oracle())
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen §2.AH tokenizer SERVED corpus-wide (SURVEY §2.AJ):
    per source, words / chars / tokens under the trained merge table
    and the fertility ratio (tokens per word) — the serving-cost
    number a token-budget plan is priced from.

    Train-capped, apply-everywhere, FROZEN: the merge table is a disk
    ARTIFACT (train once per corpus version, read forever — the
    ``text_ppl_frozen_score`` frozen-LM deployment shape), trained on
    the capped top-V table; steady-state serving never re-trains.
    Application runs over the (source, word) census as one
    Arrow-batched row-local pass (:func:`apply_merges_token_counts` —
    tokenizing under a frozen tokenizer is a map, not a shuffle;
    sources are dimension-sized, so census rows are within a small
    constant of distinct words and the distinct+join-back exchanges
    are saved). Integer counters; fertility is a dratio rational."""
    from ..io import disk_artifact_json
    from .extensions17 import _BPE_WORD_CAP

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("w"),
    )
    census = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))

    def train() -> list:
        capped = (
            census.groupBy("w")
            .agg(F.sum("cnt").alias("wc"))
            .orderBy(F.desc("wc"), "w")
            .limit(_BPE_WORD_CAP)
            .collect()
        )
        return greedy_bpe_merges(
            {r["w"]: int(r["wc"]) for r in capped}, _BPE_ROUNDS
        )

    merges = [
        tuple(m)
        for m in disk_artifact_json("bpe_merges", "v1", sf_dir, train)
    ]
    # the Arrow pass runs per CENSUS row (source × word): sources are
    # dimension-sized, so this is within a small constant of a
    # distinct-words pass and saves the distinct exchange AND the
    # join-back — two fewer jobs on a fixed-cost-dominated wall
    j = apply_merges_token_counts(census, merges)
    return j.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
        F.sum(F.col("cnt") * F.col("tok_n")).cast("long").alias("n_tokens"),
        dratio(
            F.sum(F.col("cnt") * F.col("tok_n")) * 1_000_000,
            F.sum("cnt"),
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# pipeline_pack_efficiency — the fill census of the packing pass
# ---------------------------------------------------------------------------


def pipeline_pack_efficiency_oracle() -> str:
    fill = dratio_sql("SUM(bin_chars) * 1000000", f"COUNT(*) * {PACK_BUDGET_CHARS}")
    return f"""
WITH assigned AS (
  SELECT doc_id, lang, n_chars,
         (CAST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_chars) // {PACK_BUDGET_CHARS} AS bin_id
  FROM documents
), bins AS (
  SELECT lang, bin_id, COUNT(*) AS n_docs, SUM(n_chars) AS bin_chars
  FROM assigned GROUP BY lang, bin_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(bin_chars) AS BIGINT) AS total_chars,
       CAST(MAX(bin_chars) AS BIGINT) AS max_bin_chars,
       CAST(COUNT(CASE WHEN bin_chars > {PACK_BUDGET_CHARS} THEN 1 END)
         AS BIGINT) AS overflow_bins,
       {fill} AS fill_pct
FROM bins GROUP BY lang
"""


@query("pipeline_pack_efficiency", oracle=pipeline_pack_efficiency_oracle())
def pipeline_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill census of the registered ``pack_sequences`` packing
    (SURVEY §2.AJ): per language — bins, docs, char totals, the
    fattest bin, how many bins a boundary-straddling doc overflows,
    and the fill share of the char budget. The packing assignment is
    the registered op's OWN formula (start-offset quotient), so the
    census audits exactly the batches training would consume.

    Shape at scale: the registered packing window (one keyed shuffle,
    O(1) state per row) + a (lang, bin)-keyed rollup + the O(bins)
    summary. Integer counters; fill is a dratio rational."""
    from .pipeline import pack_sequences

    assigned = pack_sequences(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bins = (
        assigned.join(d, "doc_id")
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("bin_chars"),
        )
    )
    over = F.col("bin_chars") > PACK_BUDGET_CHARS
    return bins.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("bin_chars").cast("long").alias("total_chars"),
        F.max("bin_chars").cast("long").alias("max_bin_chars"),
        F.count(F.when(over, 1)).cast("long").alias("overflow_bins"),
        dratio(
            F.sum("bin_chars") * 1_000_000,
            F.count(F.lit(1)) * PACK_BUDGET_CHARS,
        ).alias("fill_pct"),
    )


# ---------------------------------------------------------------------------
# events_burstiness_fano — exact-integer burstiness per event type
# ---------------------------------------------------------------------------


def events_burstiness_fano_oracle() -> str:
    fano = dratio_sql(
        "(n * sum_sq - sum_c * sum_c) * 1000000", "n * sum_c"
    )
    return f"""
WITH per_min AS (
  SELECT event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
), moments AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS sum_c, SUM(c * c) AS sum_sq
  FROM per_min GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_minutes,
       CAST(sum_c AS BIGINT) AS n_events,
       {fano} AS fano
FROM moments
"""


@query("events_burstiness_fano", oracle=events_burstiness_fano_oracle())
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of the event stream per type (SURVEY §2.AJ): the
    Fano factor of per-minute counts — variance/mean, EXACT from
    integer moments (n, Σc, Σc²): Fano = (n·Σc² − (Σc)²)/(n·Σc), one
    dratio over integers, no float accumulation anywhere. ≈1 means a
    Poisson-like arrival process; ≫1 means bursts — the number that
    sizes stream micro-batch capacity and alert-suppression windows.

    Shape at scale: a (type, minute)-keyed rollup (map-side combining)
    + a type-keyed moment fold — two exchanges, both carrying reduced
    frames. Only OBSERVED minutes enter the census (zero-minute
    handling is a declared convention shared with the oracle)."""
    return fano_over(load_table(spark, sf_dir, "events"))


def fano_over(events: DataFrame) -> DataFrame:
    """KERNEL — the exact-integer Fano census over any frame with
    (event_type, ts) columns. Factored out of
    :func:`events_burstiness_fano` so the staged suite can plant a
    burst (all events in one minute → Fano ≈ n_events·(1−1/n_minutes))
    and a perfectly regular stream (one event per minute → Fano 0)."""
    per_min = events.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    moments = per_min.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return moments.select(
        "event_type",
        F.col("n").cast("long").alias("n_minutes"),
        F.col("sum_c").cast("long").alias("n_events"),
        dratio(
            (F.col("n") * F.col("sum_sq") - F.col("sum_c") * F.col("sum_c"))
            * 1_000_000,
            F.col("n") * F.col("sum_c"),
        ).alias("fano"),
    )
