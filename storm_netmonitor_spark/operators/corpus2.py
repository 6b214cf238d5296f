"""Round-2 corpus-analytics extensions: token-budget corpus cuts, Zipf
frequency profiles, and word co-occurrence mining.

Registered AFTER ``surface`` (see operators/__init__ note): new modules
must not displace operators still awaiting a driver verdict from the
capped per-round check window.

Reference citations: /root/reference is empty this round (SURVEY §0.1);
these realize the north-star LLM-data-pipeline mandate [L BASELINE.json:6].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import (
    dec_scaled,
    dec_scaled_sql,
    dratio,
    dratio_sql,
    dround,
    dround_sql,
)
from ..io import load_table
from ..registry import query

#: Tokenizer shared with operators/text.py:29-36 — lowercase, split on
#: single spaces, drop empty tokens (trailing-space artifacts).
_TOKS = "array_remove(split(lower(text), ' '), '')"
_TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

#: Per-source token budget for the corpus cut (chosen so at sf0.01 every
#: source keeps some docs and drops some — both branches exercised).
_TOKEN_BUDGET = 300


@query(
    "pipeline_token_budget",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens,
         md5('tb:' || doc_id) AS priority
  FROM documents
), cum AS (
  SELECT source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY priority, doc_id
                             ROWS UNBOUNDED PRECEDING) AS running
  FROM toks
)
SELECT source,
       CAST(COUNT(CASE WHEN running <= {_TOKEN_BUDGET} THEN 1 END) AS BIGINT)
         AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN running <= {_TOKEN_BUDGET} THEN n_tokens END), 0)
         AS BIGINT) AS kept_tokens,
       CAST(COUNT(CASE WHEN running > {_TOKEN_BUDGET} THEN 1 END) AS BIGINT)
         AS n_dropped,
       CAST(COALESCE(SUM(CASE WHEN running > {_TOKEN_BUDGET} THEN n_tokens END), 0)
         AS BIGINT) AS dropped_tokens
FROM cum
GROUP BY source
""",
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus cut (NORTH: 'give me N tokens per source' is
    the standard pre-training data request): docs get a deterministic
    md5 priority, a per-source running token total is computed with one
    window, and docs past the budget are dropped. Per-source accounting
    comes back (kept/dropped docs and tokens). ONE shuffle on source;
    the window runs inside each source partition in parallel — at 100 TB
    the cut is per-source-parallel, never a global sort. Hash-oracled
    against the identical window in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.expr(_TOKS)).alias("n_tokens"),
        F.md5(F.concat(F.lit("tb:"), F.col("doc_id"))).alias("priority"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("priority", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("running", F.sum("n_tokens").over(w))
    kept = F.col("running") <= _TOKEN_BUDGET
    return cum.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)).alias(
            "kept_tokens"
        ),
        F.count(F.when(~kept, 1)).alias("n_dropped"),
        F.coalesce(F.sum(F.when(~kept, F.col("n_tokens"))), F.lit(0)).alias(
            "dropped_tokens"
        ),
    )


@query(
    "text_word_freq_zipf",
    oracle=f"""
WITH words AS (
  SELECT unnest({_TOKS_SQL}) AS word FROM documents
), freq AS (
  SELECT word, COUNT(*) AS n FROM words GROUP BY word
), ranked AS (
  SELECT word, n,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT) AS rnk,
         SUM(n) OVER () AS total,
         SUM(n) OVER (ORDER BY n DESC, word ROWS UNBOUNDED PRECEDING) AS cum
  FROM freq
)
SELECT word, n, rnk,
       {dround_sql('CAST(n AS DOUBLE) / total')} AS share,
       {dround_sql('CAST(cum AS DOUBLE) / total')} AS cum_share,
       {dround_sql('CAST(rnk AS DOUBLE) * n / total')} AS zipf_rn_share
FROM ranked
WHERE rnk <= 30
""",
)
def text_word_freq_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile (NORTH: text analysis — the first report
    run on any new crawl): corpus-wide word frequencies, Zipf rank, share
    and cumulative coverage, plus rank×share (≈constant under Zipf's law,
    so deviations flag synthetic or boilerplate-heavy corpora). The word
    count is a partial-aggregated shuffle over the vocabulary (tiny vs
    corpus); the top-30 cut then happens BEFORE any window via
    orderBy+limit (TakeOrderedAndProject), so the rank/cumulative windows
    see a 30-row frame at any corpus scale — web-noise vocabularies grow
    with the corpus, so windowing the full vocab was a funnel (round-8
    rework; prefix property makes the limited-frame cum identical to the
    global one). Integer-ratio doubles are identical across engines;
    rounded in decimal space."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.expr(_TOKS)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    # round-8 rework: the rank/cumulative windows used to run over the
    # WHOLE vocab — reduced but not bounded (noisy web vocab grows with
    # the corpus). The top-30 cut happens FIRST via orderBy+limit
    # (TakeOrderedAndProject: per-partition top-30 + driver merge, no
    # global sort), and since cumulative coverage at rank k is the sum of
    # the top-k counts, the windows over the 30-row frame reproduce the
    # global rnk/cum exactly. The corpus total (≡ Σ n) comes from a
    # row-local size() scan as a 1-row broadcast scalar.
    top = freq.orderBy(F.desc("n"), F.asc("word")).limit(30)
    total_row = d.select(
        F.size(F.expr(_TOKS)).cast("long").alias("nt")
    ).agg(F.sum("nt").cast("long").alias("total"))
    w_rank = Window.orderBy(F.desc("n"), F.asc("word"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = top.crossJoin(F.broadcast(total_row)).select(
        "word",
        "n",
        F.row_number().over(w_rank).cast("bigint").alias("rnk"),
        F.col("total"),
        F.sum("n").over(w_cum).alias("cum"),
    )
    n_d = F.col("n").cast("double")
    return ranked.select(
        "word",
        "n",
        "rnk",
        dround(n_d / F.col("total")).alias("share"),
        dround(F.col("cum").cast("double") / F.col("total")).alias("cum_share"),
        dround(F.col("rnk").cast("double") * n_d / F.col("total")).alias(
            "zipf_rn_share"
        ),
    )


#: Co-occurrence is computed only among the top-V most document-frequent
#: words: bounds the pair space to V² regardless of corpus size.
_COOCCUR_V = 20


@query(
    "text_cooccur_lift",
    oracle=f"""
WITH doc_words AS (
  SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
), df AS (
  SELECT word, COUNT(*) AS n_docs FROM doc_words GROUP BY word
), vocab AS (
  SELECT word, n_docs FROM df ORDER BY n_docs DESC, word LIMIT {_COOCCUR_V}
), dw AS (
  SELECT d.doc_id, d.word FROM doc_words d JOIN vocab v USING (word)
), pairs AS (
  SELECT a.word AS w1, b.word AS w2, COUNT(*) AS n_pair
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
), n AS (SELECT COUNT(*) AS n_total FROM documents)
SELECT w1, w2, n_pair,
       {dround_sql('CAST(n_pair AS DOUBLE) * n_total / (v1.n_docs * v2.n_docs)')}
         AS lift
FROM pairs
JOIN vocab v1 ON v1.word = w1
JOIN vocab v2 ON v2.word = w2
CROSS JOIN n
ORDER BY lift DESC, w1, w2
LIMIT 20
""",
)
def text_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence lift (NORTH: text analysis — collocation mining
    over the corpus): among the top-V document-frequent words, count docs
    containing each pair and score lift = P(w1,w2)/(P(w1)·P(w2)); the
    top-20 pairs by lift come back. The vocab cap makes the pair space V²
    — corpus-size-independent — and the vocab/df frames are broadcast to
    the pair join, so the only big shuffles are the distinct(doc,word)
    dedup and the pair count, both partial-aggregated. Lift is an exact-
    integer ratio: identical doubles on both engines, rounded in decimal
    space. Deterministic total order (lift DESC, w1, w2)."""
    d = load_table(spark, sf_dir, "documents")
    doc_words = d.select(
        "doc_id", F.explode(F.expr(_TOKS)).alias("word")
    ).distinct()
    df_counts = doc_words.groupBy("word").agg(F.count("*").alias("n_docs"))
    vocab = df_counts.orderBy(F.desc("n_docs"), F.asc("word")).limit(_COOCCUR_V)
    dw = doc_words.join(F.broadcast(vocab.select("word")), "word")
    a = dw.select(F.col("doc_id"), F.col("word").alias("w1"))
    b = dw.select(F.col("doc_id"), F.col("word").alias("w2"))
    pairs = (
        a.join(b, ["doc_id"])
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
    )
    n_total = d.count()  # driver scalar: one count, reused as a literal
    v1 = vocab.select(F.col("word").alias("w1"), F.col("n_docs").alias("n1"))
    v2 = vocab.select(F.col("word").alias("w2"), F.col("n_docs").alias("n2"))
    lift = (
        F.col("n_pair").cast("double")
        * F.lit(n_total)
        / (F.col("n1") * F.col("n2"))
    )
    return (
        pairs.join(F.broadcast(v1), "w1")
        .join(F.broadcast(v2), "w2")
        .select("w1", "w2", "n_pair", dround(lift).alias("lift"))
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# BPE-training pair counts (NORTH: the inner loop of tokenizer training —
# the highest-count adjacent pair is the next merge)
# ---------------------------------------------------------------------------


@query(
    "text_bpe_pair_counts",
    oracle="""
WITH words AS (
  SELECT UNNEST(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS w
  FROM documents
), wf AS (
  SELECT w, COUNT(*) AS freq FROM words WHERE length(w) >= 2 GROUP BY w
), pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
  FROM wf, UNNEST(range(1, length(w))) t(i)
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
""",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair statistics (NORTH: the merge rule every
    BPE/WordPiece vocabulary is built from — count adjacent symbol pairs,
    merge the winner, repeat): the top-20 adjacent character pairs by
    corpus frequency. The scale trick is the one real tokenizer trainers
    use: reduce the corpus to its word VOCABULARY with multiplicities
    FIRST (one token-keyed shuffle), then explode the pair positions of
    each distinct word exactly once and weight by word frequency — pair
    work is O(vocab × word-length), independent of corpus row count.
    Exact integer counts; deterministic (n DESC, pair) ordering."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_pairs_over(docs).orderBy(F.desc("n"), "pair").limit(20)


def bpe_pairs_over(docs: DataFrame) -> DataFrame:
    """Adjacent-pair count kernel over a ``text``-column frame: returns the
    UNLIMITED ``(pair, n)`` counts (the query applies the top-20 cut).
    Factored out of ``text_bpe_pair_counts`` so the property suite can
    drive it with arbitrary corpora against a Python Counter reference."""
    words = docs.select(
        F.explode(F.expr(_TOKS)).alias("w")
    ).filter(F.length("w") >= 2)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return pairs.groupBy("pair").agg(F.sum("freq").alias("n"))


#: Cross-entropy keep-threshold for the unigram-LM quality filter, in
#: nats. CCNet's protocol scores documents with a language-model
#: perplexity and drops the worst (least fluent) tail; the corpus's own
#: unigram model puts docs at xent ≈ 3.38–3.72, and 3.52 drops the ~1%
#: worst tail at every SF with a ≥6e-3 margin to the nearest doc
#: (tools/margin_audit.py pins it — xent is engine-identical exact, so
#: the margin only guards testdata regeneration, not float error).
_XENT_KEEP_MAX = 3.52


@query(
    "text_perplexity_unigram",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
), dw AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
), lm AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM dw GROUP BY w
), lm2 AS (
  SELECT w, cw, CAST(SUM(cw) OVER () AS BIGINT) AS total FROM lm
), scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.c) AS BIGINT) AS n_tokens,
         {dec_scaled_sql('d.c * -ln(CAST(l.cw AS DOUBLE) / l.total)')} AS nll_e6
  FROM dw d JOIN lm2 l USING (w)
  GROUP BY d.doc_id
), x AS (
  SELECT doc_id, n_tokens,
         {dratio_sql('nll_e6', 'n_tokens')} AS xent
  FROM scored
)
SELECT doc_id, n_tokens, xent,
       {dround_sql('exp(xent)', 4)} AS ppl,
       xent <= {_XENT_KEEP_MAX!r} AS keep
FROM x
""",
)
def text_perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity quality filter (NORTH: the CCNet-style
    "score every document against a language model, keep the fluent
    tail" gate, with the corpus's own unigram model standing in for the
    external KenLM — self-contained and still separates boilerplate/
    repetitive docs from typical prose). Train and score in one plan:
    per-(doc, word) counts → corpus word counts → P(w) = cw/total (MLE;
    every scored token is in-vocabulary by construction, so no smoothing
    term) → per-doc cross-entropy Σ c·(−ln p) / n_tokens and perplexity
    exp(xent), keep = xent ≤ {_XENT_KEEP_MAX} nats.

    Shape at scale: the (doc, word) pre-aggregation collapses repeated
    words BEFORE the model join, so the join carries one row per
    distinct word per doc, not one per token; the corpus token total is
    a 1-row broadcast scalar computed from a row-local size() scan
    (round-8 rework — the vocab frame is reduced but not bounded, so the
    former total-over-() window was a funnel), and the model join
    auto-broadcasts under the threshold — beyond it, the
    stopword-skewed join key is exactly what AQE skew-split handles.
    Float discipline: each −ln p term is decimal-accumulated and the
    per-doc mean is rounded with dratio's EXACT integer half-away — not
    by rounding the double quotient, which diverges between engines with
    probability ~1/n_tokens when a 6-decimal sum is divided by a small
    integer (stable.py QUOTIENT hazard, discovered on THIS op: doc 147's
    sum_nll/84 scaled to exactly 3397428.5). The exp() libm 1-ulp class
    on the already-identical xent is absorbed by 4-decimal rounding
    (tools/margin_audit.py category)."""
    d = load_table(spark, sf_dir, "documents")
    dw = (
        d.select("doc_id", F.explode(F.expr(_TOKS)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    lm = dw.groupBy("w").agg(F.sum("c").cast("long").alias("cw"))
    # corpus token total (≡ Σ cw, exactly — every token occurrence counts
    # once in cw) from a ROW-LOCAL size() scan: no explode, no vocab
    # shuffle, one map-side-combined row. Round-8 rework: the vocab frame
    # is reduced but NOT bounded (noisy web vocab grows with the corpus),
    # so the former total-over-() window was a single-task funnel; the
    # 1-row broadcast attach keeps the cw/total doubles bit-identical.
    total_row = d.select(
        F.size(F.expr(_TOKS)).cast("long").alias("nt")
    ).agg(F.sum("nt").cast("long").alias("total"))
    lm2 = lm.crossJoin(F.broadcast(total_row))
    term = F.col("c") * -F.log(F.col("cw").cast("double") / F.col("total"))
    scored = (
        dw.join(lm2, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            dec_scaled(term).alias("nll_e6"),
        )
    )
    xent = dratio(F.col("nll_e6"), F.col("n_tokens"))
    return scored.select(
        "doc_id",
        "n_tokens",
        xent.alias("xent"),
        dround(F.exp(xent), 4).alias("ppl"),
        (xent <= F.lit(_XENT_KEEP_MAX)).alias("keep"),
    )
