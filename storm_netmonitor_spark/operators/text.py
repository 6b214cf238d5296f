"""Text analysis + deduplication (SURVEY §2.K / BASELINE.json north star).

The LLM-training-data-pipeline surface over the ``documents`` table:
exact dedup, MinHash-LSH and SimHash near-dedup, n-gram Jaccard, token
stats, n-grams, TF-IDF, quality scoring, fingerprinting, language profile.

Scale notes (100 TB):
- Exact dedup is hash-groupBy: shuffle on the 256-bit digest, no string
  comparison across the cluster.
- MinHash-LSH: cost is rows × shingles for signatures, then the self-join
  happens ONLY within LSH band buckets — worst case is per-bucket², never
  corpus². Band/row parameters (4 bands × 2 rows) target Jaccard ≳ 0.5.
- SimHash: signatures are one Arrow-batched pandas UDF pass; candidate
  pairs come from 7 disjoint band buckets per doc (lossless for the
  hamming ≤ 6 threshold by pigeonhole), hamming-verified.
- All hash seeds are FIXED literals — no RNG at query time (SURVEY §7.4.8).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import LongType

from ..functions.stable import davg, davg_sql, dround, dround_sql
from ..io import disk_artifact_frame, load_table, scatter, session_memo
from ..registry import query

#: Tokenizer shared by every text operator: lowercase, split on single
#: spaces (documents are space-joined lowercase words — FIXTURES.md).
#: Column objects need an active session, hence a function not a constant.
def _tokens():
    return F.split(F.lower("text"), " ")


_TOKENS_SQL = "string_split(lower(text), ' ')"

_STOPWORDS = ("the", "a", "b", "of", "and")
_STOP_SQL = "('" + "', '".join(_STOPWORDS) + "')"


@query(
    "text_exact_dedup",
    oracle="""
SELECT sha256(text) AS content_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY sha256(text)
""",
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by SHA-256 content hash. Group-by (not dropDuplicates)
    so the kept representative is deterministic: min(doc_id)."""
    return exact_dedup_by_hash(load_table(spark, sf_dir, "documents"))


def exact_dedup_by_hash(docs: DataFrame) -> DataFrame:
    """Exact-dedup kernel over a ``(doc_id, text)`` frame: one keyed
    aggregate on the map-side-computed digest — blobs/texts never shuffle
    twice, and min(doc_id) makes the keeper deterministic."""
    return docs.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "text_token_stats",
    oracle=f"""
SELECT
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(len(list_filter({_TOKENS_SQL}, t -> t <> ''))) AS BIGINT) AS total_tokens,
  {davg_sql("len(list_filter(" + _TOKENS_SQL + ", t -> t <> ''))")} AS avg_tokens_per_doc,
  {davg_sql('n_chars')} AS avg_chars
FROM documents
GROUP BY lang
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts per language (whitespace tokenizer)."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.filter(_tokens(), lambda t: t != ""))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).alias("total_tokens"),
        davg(ntok).alias("avg_tokens_per_doc"),
        davg("n_chars").alias("avg_chars"),
    )


@query(
    "text_ngrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS tok,
         generate_subscripts({_TOKENS_SQL}, 1) AS pos
  FROM documents
)
SELECT a.tok || ' ' || b.tok AS bigram, COUNT(*) AS n
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 25
""",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigrams. Spark builds bigrams array-side (transform over
    positions — no self-join needed); the oracle does the classic
    positional self-join. Same bag of bigrams either way."""
    d = scatter(load_table(spark, sf_dir, "documents"))
    # materialize the token array as a real column first: element_at over
    # an inline split() re-splits the whole text per lambda element
    # (O(len²) per doc — measured 2.9 s → 0.4 s at sf0.1)
    tk = d.select(F.split(F.lower("text"), " ").alias("tk"))
    # n >= 2 guard: Spark sequence(1, 0) DESCENDS instead of emitting
    # empty (unlike DuckDB generate_series) — a 1-token doc would crash
    # element_at under ANSI mode
    bigrams = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("tk"), i), F.element_at(F.col("tk"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        tk.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(25)
    )


@query(
    "text_tfidf_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM toks WHERE word <> '' GROUP BY doc_id, word
), df AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks WHERE word <> '' GROUP BY word
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT
    tf.doc_id, tf.word,
    {dround_sql('tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)')} AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word, tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
  FROM scored
)
WHERE rn <= 3
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — tf × ln(N/df) with joins only;
    deterministic (score desc, word) tiebreak. The word-keyed DF join is
    deliberately UNHINTED (round 8; the text_perplexity_unigram model
    join rule): the DF frame is vocab-sized — reduced but not bounded on
    web corpora — so Spark's size stats pick broadcast while it is small
    and a shuffle join beyond the threshold; forcing the hint would OOM
    a billion-word vocab onto every executor. Only the 1-row corpus
    count is hint-broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(_tokens()).alias("word")
    ).filter(F.col("word") != "")
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row aggregate cross-join — keeps the plan
    # fully lazy (no driver-side d.count() action / extra eager scan)
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            dround(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "tfidf")
    )


@query(
    "text_lang_profile",
    oracle=f"""
SELECT
  lang,
  source,
  COUNT(*) AS n_docs,
  {davg_sql('n_chars')} AS avg_chars,
  MIN(n_chars) AS min_chars,
  MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
""",
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language × source distribution with char stats."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT
    doc_id,
    list_filter({_TOKENS_SQL}, t -> t <> '') AS toks,
    n_chars
  FROM documents
)
SELECT
  doc_id,
  len(toks) AS n_tokens,
  {dround_sql('CAST(n_chars AS DOUBLE) / len(toks)', 4)} AS avg_token_len,
  {dround_sql('CAST(len(list_filter(toks, t -> t IN ' + _STOP_SQL + ')) AS DOUBLE) / len(toks)', 4)} AS stopword_ratio,
  {dround_sql('CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)', 4)} AS uniq_ratio
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features (length / stopword / uniqueness ratios) —
    the heuristics a pretraining filter runs before anything expensive."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(_tokens(), lambda t: t != "")
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    uniq = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        dround(F.col("n_chars").cast("double") / n, 4).alias("avg_token_len"),
        dround(stop.cast("double") / n, 4).alias("stopword_ratio"),
        dround(uniq.cast("double") / n, 4).alias("uniq_ratio"),
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT
  doc_id,
  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fingerprint,
  sha256(substr(text, 1, 64)) AS head_hash
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 of whitespace-normalized text +
    sha256 of the 64-char head (cheap prefilter key for dedup joins)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower("text")), " +", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.sha2(F.substring("text", 1, 64), 256).alias("head_hash"),
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection (no SQL oracle — DuckDB lacks xxhash64; semantics
# covered by planted-duplicate unit tests in tests/test_semantics.py)
# ---------------------------------------------------------------------------

#: 8 MinHash permutations as xxhash64 seeds; 4 bands × 2 rows.
MINHASH_SEEDS = (101, 211, 307, 401, 503, 601, 701, 809)
MINHASH_BANDS = 4
SHINGLE_K = 3


def _with_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) — per-doc array of DISTINCT word-3-shingles, computed
    row-local (no explode, no shuffle): at 100 TB the whole signature
    stage is a single codegen'd scan. Tokens are materialized as a column
    FIRST — slice over an inline split() re-splits the text per lambda
    element (O(len²)/doc; same fix as text_ngrams)."""
    tk = docs.select(
        "doc_id",
        F.expr("array_remove(split(lower(text), ' '), '')").alias("tk"),
    )
    return tk.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(size(tk) - {SHINGLE_K - 1}, 1)),"
            f" i -> concat_ws(' ', slice(tk, i, {SHINGLE_K}))))"
        ).alias("sh"),
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_7): min over word-3-shingle xxhash64 per seed.
    Pure per-row array math — zero shuffles."""
    # NB: the lambda must be single-arg — a 2-arg lambda would be bound by
    # pyspark as (element, index) and silently replace the seed.
    def hash_with(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    sh = _with_shingles(docs)
    return sh.select(
        "doc_id",
        *[
            F.array_min(F.transform("sh", hash_with(seed))).alias(f"mh_{i}")
            for i, seed in enumerate(MINHASH_SEEDS)
        ],
    )


@query(
    "text_near_dedup_minhash",
    # Full independent oracle (VERDICT r4 #5 — upgraded from rows-only):
    # the pipeline's OUTPUT CONTRACT is "every pair with exact word-3-
    # shingle Jaccard ≥ 0.5 that LSH surfaces, with its exact Jaccard" —
    # and on any corpus whose near-dup pairs sit well above the banding
    # threshold (all 25 pairs in the testdata have J ≥ 0.9; 4 bands × 2
    # rows catch J ≥ 0.9 with certainty under the fixed seeds) that equals
    # ALL such pairs. The oracle computes exact all-pairs Jaccard from the
    # raw text in SQL: tokens → distinct word-3-shingles (size<3 docs
    # collapse to one whole-text shingle, mirroring greatest(size-2, 1)) →
    # shingle-join intersections → Jaccard filter, rounded like dround(4).
    oracle="""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(tk[i:i+2], ' ')
                   FOR i IN range(1, greatest(len(tk) - 2, 1) + 1)]) AS sh
  FROM tk
), ex AS (
  SELECT doc_id, unnest(sh) AS s FROM sh
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, len(sh) AS n FROM sh
)
SELECT doc_a, doc_b,
       ROUND(ninter / (sa.n + sb.n - ninter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE ROUND(ninter / (sa.n + sb.n - ninter), 4) >= 0.5
""",
)
def text_near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dedup: signatures → band buckets → candidate pairs
    within buckets → exact shingle-Jaccard verification ≥ 0.5.

    Join complexity is bounded per LSH bucket; at 100 TB the bucket join is
    the only quadratic term and buckets stay small by construction.

    The verified pair list is the MAINTAINED ARTIFACT of a production
    dedup pipeline (rebuilt when the corpus changes, read by every
    consumer — the same class as ``dedup_edges``), so it persists to the
    fingerprint-keyed artifact store (VERDICT r9 #3): a fresh process
    reads O(pairs) parquet instead of re-running the signature+bucket
    pipeline; a regenerated corpus invalidates the key and retrains.
    """
    import os

    return session_memo(
        spark,
        ("minhash_pairs", os.path.abspath(sf_dir)),
        lambda: disk_artifact_frame(
            spark,
            "minhash_pairs",
            "v1",
            sf_dir,
            lambda: near_dup_minhash_pairs(
                scatter(load_table(spark, sf_dir, "documents"))
            ),
        ),
        sf_dir=sf_dir,
    )


def near_dup_minhash_pairs(d: DataFrame) -> DataFrame:
    """MinHash-LSH near-dup kernel over a ``(doc_id, text)`` frame:
    returns verified ``(doc_a, doc_b, jaccard)`` pairs with shingle
    Jaccard ≥ 0.5. Banded signatures bound the candidate join per LSH
    bucket — the only pairwise term at any scale."""
    sig = minhash_signatures(d)
    rows_per_band = len(MINHASH_SEEDS) // MINHASH_BANDS
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
            F.lit(b),
        ).alias(f"band_{b}")
        for b in range(MINHASH_BANDS)
    ]
    banded = sig.select("doc_id", *band_cols)
    bands = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash"))
                for b in range(MINHASH_BANDS)
            ])
        ).alias("bh"),
    ).select("doc_id", "bh.band_idx", "bh.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact Jaccard verification: candidates (tiny) join the per-doc
    # shingle-set arrays; intersection/union are row-local JVM array ops —
    # the candidate set is the only pairwise term, and LSH keeps it small.
    sh_tbl = _with_shingles(d)
    sh_a = sh_tbl.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    sh_b = sh_tbl.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    n_inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dround(
                n_inter
                / (F.size("sa") + F.size("sb") - n_inter).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash from md5 token hashes — deterministic, vectorized:
    token→±1-bit-vector lookups are cached across the batch (corpus
    vocabularies are tiny relative to token count) and the weight sum is
    one numpy reduction per doc. Bit order matches the scalar definition
    (bit i of the big-endian md5[:8] integer)."""
    import hashlib

    import numpy as np

    cache: dict[str, "np.ndarray"] = {}

    def tok_vec(tok: str) -> "np.ndarray":
        v = cache.get(tok)
        if v is None:
            digest = hashlib.md5(tok.encode()).digest()[:8]
            bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[::-1]
            v = bits.astype(np.int32) * 2 - 1
            cache[tok] = v
        return v

    out = []
    for t in texts:
        # single-space split + empty filter — the SAME tokenizer as every
        # other text operator (_tokens / _TOKENS_SQL) and as the SQL
        # oracle's string_split(' '); Python .split() (any whitespace)
        # would silently diverge on tab/newline-bearing corpora
        toks = [w for w in str(t).lower().split(" ") if w]
        if toks:
            w = np.sum([tok_vec(tok) for tok in toks], axis=0)
        else:
            w = np.zeros(64, dtype=np.int32)
        sig = 0
        for i in np.nonzero(w > 0)[0]:
            sig |= 1 << int(i)
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out)


#: Band layout for the simhash candidate join: (shift, width) blocks
#: partitioning the 64 signature bits. Pigeonhole: a pair within hamming
#: ≤ 6 differs in at most 6 blocks, so with SEVEN disjoint blocks at
#: least one block matches exactly — banding recall is TOTAL for the
#: ≤ 6 threshold (4×16 bands only guaranteed ≤ 3 and measurably missed
#: 17/78 true pairs on the test corpus). ~9-bit bands mean fewer buckets,
#: so this trades bucket size for the guarantee; at extreme corpus sizes
#: deployments either accept the 4×16 ≤ 3 guarantee or use the
#: permute-and-sort multi-block scheme — the threshold/guarantee pairing
#: is the tunable, the join shape is identical.
SIMHASH_BANDS: tuple[tuple[int, int], ...] = (
    (0, 10), (10, 9), (19, 9), (28, 9), (37, 9), (46, 9), (55, 9),
)
SIMHASH_MAX_HAMMING = 6


@query(
    "text_near_dedup_simhash",
    # Full independent oracle (VERDICT r4 #5 — upgraded from rows-only):
    # with the 7-block banding the candidate stage is LOSSLESS for the
    # hamming ≤ 6 threshold (pigeonhole), so the output contract is
    # exactly "all pairs within hamming 6" — which SQL recomputes from
    # scratch: md5 per token occurrence (DuckDB md5 == Python hashlib.md5;
    # bit i of the big-endian first-8-bytes integer extracted per hex
    # nibble), ±1 bit votes, packed signature, pairwise popcount.
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, md5(tok) AS h FROM toks
), bits AS (
  SELECT doc_id, b.i AS bit,
         ((strpos('0123456789abcdef', substr(h, 16 - (b.i // 4), 1)) - 1)
          >> (b.i % 4)) & 1 AS bv
  FROM th, (SELECT unnest(range(0, 64)) AS i) b(i)
), votes AS (
  SELECT doc_id, bit, SUM(2 * bv - 1) AS w FROM bits GROUP BY 1, 2
), packed AS (
  SELECT doc_id,
         SUM(CASE WHEN w > 0
                  THEN (CAST(1 AS UBIGINT) << CAST(bit AS INTEGER))
                  ELSE 0 END) AS s
  FROM votes GROUP BY 1
), sig AS (
  SELECT d.doc_id, COALESCE(p.s, 0) AS s
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN packed p USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {SIMHASH_MAX_HAMMING}
""",
)
def text_near_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dedup: Arrow-batched pandas UDF computes 64-bit
    signatures; candidates bucket on the 7-block band layout (lossless
    for the threshold — see SIMHASH_BANDS); pairs kept when hamming ≤ 6.
    Hash oracle (r5) recomputes the full pipeline in SQL; planted-pair
    semantics stay unit-tested."""
    return near_dup_simhash_pairs(scatter(load_table(spark, sf_dir, "documents")))




def near_dup_simhash_pairs(d: DataFrame) -> DataFrame:
    """SimHash near-dup kernel over a ``(doc_id, text)`` frame: returns
    ``(doc_a, doc_b, hamming)`` pairs with hamming ≤ 6 over 64-bit
    signatures; candidates bucket on the SIMHASH_BANDS blocks, whose
    7-block layout makes the candidate stage lossless for the threshold
    (see above) — the output is exactly the all-pairs hamming ≤ 6 set."""
    simhash = F.pandas_udf(_simhash_batch, LongType())
    # localCheckpoint: both sides of the band self-join consume sig, which
    # would otherwise re-run the UDF per branch (plan showed 4
    # ArrowEvalPython nodes). The frame is two longs per doc —
    # signature-scale, not text-scale.
    sig = d.select("doc_id", simhash("text").alias("sig")).localCheckpoint()
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftrightunsigned("sig", off)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("band_val"),
                )
                for b, (off, width) in enumerate(SIMHASH_BANDS)
            ])
        ).alias("bh"),
    ).select("doc_id", "sig", "bh.band_idx", "bh.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= SIMHASH_MAX_HAMMING
    )


#: Grams present in more docs than this (within a block) are dropped from
#: both sets before the pair join — a ubiquitous shingle ("one of the")
#: makes the per-gram fan-out quadratic at 100 TB while carrying no dedup
#: signal. Standard practice in shingle-based dedup pipelines. Must match
#: the literal 1000 in the oracle's HAVING clause.
NGRAM_DF_CAP = 1000


#: The pair-generation CTE chain, shared verbatim with the
#: text_dedup_components oracle (corpus.py) so the two stages of the
#: dedup pipeline — pair discovery and component resolution — are checked
#: against the SAME edge definition.
NGRAM_PAIRS_CTE = f"""toks AS (
  SELECT doc_id, lang, source, list_filter({_TOKENS_SQL}, t -> t <> '') AS tk
  FROM documents
), grams AS (
  SELECT DISTINCT * FROM (
    SELECT doc_id, lang, source,
           unnest(list_transform(generate_series(1, len(tk) - 2),
                  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
    FROM toks
  )
), kept AS (
  -- df-cap: a gram shared by > 1000 docs in a block (stopword shingle)
  -- would fan the pair join out quadratically; drop it from both sets
  SELECT g.* FROM grams g
  JOIN (
    SELECT lang, source, gram
    FROM grams GROUP BY lang, source, gram
    HAVING COUNT(*) <= 1000
  ) f USING (lang, source, gram)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b
    ON a.lang = b.lang AND a.source = b.source
   AND a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""

#: Jaccard threshold for a pair to count as near-duplicate (shared with
#: the component-resolution stage).
NGRAM_JACCARD_MIN = 0.05


@query(
    "text_ngram_jaccard",
    oracle=f"""
WITH {NGRAM_PAIRS_CTE}
SELECT
  doc_a, doc_b,
  {dround_sql('CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)', 4)} AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.05
""",
)
def text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity for doc pairs, BLOCKED by
    (lang, source) so the pairwise term is per-block, not corpus-wide —
    the exact-verification stage of an n-gram dedup pipeline. Hot grams
    (document frequency > NGRAM_DF_CAP within a block) are removed from
    both sets, bounding the pair-join fan-out per key.

    Like ``text_near_dedup_minhash``, the verified pair list is the
    maintained artifact of the pipeline — fingerprint-keyed disk persist
    (VERDICT r9 #3); ``text_dedup_components``'s edge staging composes
    on top of this artifact."""
    import os

    return session_memo(
        spark,
        ("jaccard_pairs", os.path.abspath(sf_dir)),
        lambda: disk_artifact_frame(
            spark, "jaccard_pairs", "v1", sf_dir,
            lambda: _ngram_jaccard_pairs(spark, sf_dir),
        ),
        sf_dir=sf_dir,
    )


def _ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pair pipeline (the artifact BUILDER for
    ``text_ngram_jaccard``)."""
    d = scatter(load_table(spark, sf_dir, "documents"))
    # materialize the token array before the gram lambda: slice over an
    # inline split() re-splits the whole text per element (O(len²)/doc —
    # same fix as text_ngrams)
    t = d.select(
        "doc_id",
        "lang",
        "source",
        F.expr("array_remove(split(lower(text), ' '), '')").alias("tk"),
    )
    # size >= 3 guard: sequence(1, 0) descends (see text_ngrams note)
    grams_expr = F.expr(
        "CASE WHEN size(tk) >= 3 THEN"
        " transform(sequence(1, size(tk) - 2),"
        " i -> concat_ws(' ', slice(tk, i, 3)))"
        " ELSE CAST(array() AS array<string>) END"
    )
    # the distinct gram frame feeds the DF census AND the filtered join;
    # the filtered frame then feeds sizes and BOTH pair-join sides —
    # materialize each once (multiply-consumed-frame rule) instead of
    # re-running the explode+distinct lineage up to five times
    all_grams = (
        t.select("doc_id", "lang", "source", F.explode(grams_expr).alias("gram"))
        .distinct()
        .localCheckpoint()
    )
    rare = (
        all_grams.groupBy("lang", "source", "gram")
        .agg(F.count(F.lit(1)).alias("gram_df"))
        .filter(F.col("gram_df") <= NGRAM_DF_CAP)
        .select("lang", "source", "gram")
    )
    grams = all_grams.join(rare, ["lang", "source", "gram"]).localCheckpoint()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(
        F.col("doc_id").alias("doc_a"), "lang", "source", "gram"
    )
    b = grams.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("gram").alias("gram_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("source") == F.col("source_b"))
            & (F.col("gram") == F.col("gram_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        pairs.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .filter(jac >= NGRAM_JACCARD_MIN)
        .select("doc_a", "doc_b", dround(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Language identification (north star: LLM-pipeline text analysis)
# ---------------------------------------------------------------------------

#: Per-language marker-token lists for the n-gram/stopword heuristic. On
#: REAL multilingual text these separate languages sharply; the synthetic
#: corpus is English-vocabulary word salad under every `lang` label
#: (measured — see tests), so here everything scores as 'en'/'unknown'.
#: The operator is still fully hash-checked: the oracle runs the IDENTICAL
#: heuristic in SQL, so any scoring/tie-break drift breaks parity.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def _lang_score(lang: str):
    toks = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return F.expr(f"size(filter(split(lower(text), ' '), t -> t IN ({toks})))")


def _lang_score_sql(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return f"len(list_filter(string_split(lower(text), ' '), t -> t IN ({toks})))"


_LANG_ORDER = ("en", "de", "es", "fr")  # deterministic tie-break priority


@query(
    "text_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
    {", ".join(f"{_lang_score_sql(lg)} AS s_{lg}" for lg in _LANG_ORDER)}
  FROM documents
), pred AS (
  SELECT doc_id,
    CASE
      WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'unknown'
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      WHEN s_es >= s_fr THEN 'es'
      ELSE 'fr'
    END AS lang_pred
  FROM scored
)
SELECT lang_pred, COUNT(*) AS n_docs FROM pred GROUP BY lang_pred
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language identification (north star: route documents by
    language before per-language pipeline stages). Marker-stopword scoring
    per language with a fixed tie-break order — pure JVM higher-order
    functions, no UDF, so the 100 TB path is one codegen'd scan + a tiny
    final aggregation."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", *[_lang_score(lg).alias(f"s_{lg}") for lg in _LANG_ORDER]
    )
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_ORDER}
    pred = scored.select(
        "doc_id",
        F.when(
            (s["en"] == 0) & (s["de"] == 0) & (s["es"] == 0) & (s["fr"] == 0),
            F.lit("unknown"),
        )
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), F.lit("de"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
        .alias("lang_pred"),
    )
    return pred.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


#: GPT-2-style pre-tokenizer, restricted to the Java<->RE2 common regex
#: subset (no lookahead): contraction suffixes, space-prefixed letter runs,
#: digit runs, punctuation runs, residual whitespace. On real text this
#: approximates a BPE pre-tokenization's fragment count.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"
_BPE_RE_SQL = _BPE_RE.replace("'", "''")


@query(
    "text_token_bpe",
    oracle=f"""
WITH per_doc AS (
  SELECT source,
         len(list_filter({_TOKENS_SQL}, t -> t <> '')) AS ws_tokens,
         len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS bpe_tokens
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       {davg_sql('bpe_tokens')} AS avg_bpe_tokens
FROM per_doc
GROUP BY source
""",
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex next to the plain
    whitespace count (north star: cost estimation for LLM training data).
    Pure JVM regex in a codegen'd scan — no UDF on the 100 TB path; the
    identical RE2-safe pattern runs in the DuckDB oracle."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(_tokens(), lambda t: t != ""))
    bpe = F.size(F.expr(f"regexp_extract_all(text, \"{_BPE_RE}\", 0)"))
    per_doc = d.select(
        "source", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        davg("bpe_tokens").alias("avg_bpe_tokens"),
    )


#: Patterns in the Java<->RE2 common subset. NB: DuckDB regexp_replace
#: replaces only the first match unless the 'g' flag is passed; Spark
#: always replaces all — the oracle must say 'g' explicitly.
_TAG_RE = "<[^>]*>"
_URL_RE = "https?://[^ <>]+"
_WS_RE = "  +"


@query(
    "text_clean_html",
    oracle=f"""
WITH cleaned AS (
  SELECT source,
    len(regexp_extract_all(text, '{_URL_RE}')) AS n_urls,
    length(trim(regexp_replace(regexp_replace(text, '{_TAG_RE}', ' ', 'g'),
                               '{_WS_RE}', ' ', 'g'))) AS clean_chars,
    length(text) AS raw_chars
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_urls) AS BIGINT) AS total_urls,
       CAST(SUM(clean_chars) AS BIGINT) AS total_clean_chars,
       CAST(SUM(raw_chars) AS BIGINT) AS total_raw_chars
FROM cleaned
GROUP BY source
""",
)
def text_clean_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data cleaning pass: strip markup tags, collapse runs of
    spaces, count embedded URLs — per-source totals so the pipeline can
    rank sources by markup noise. Pure JVM regex (one codegen'd scan);
    identical RE2-safe patterns run in the oracle. The synthetic corpus
    contains no markup (clean == raw there); actual stripping is verified
    on planted HTML in tests/test_semantics.py."""
    d = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace("text", _TAG_RE, " "), _WS_RE, " "
        )
    )
    per_doc = d.select(
        "source",
        F.size(F.expr(f"regexp_extract_all(text, '{_URL_RE}', 0)")).alias("n_urls"),
        F.length(clean).alias("clean_chars"),
        F.length("text").alias("raw_chars"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_urls").alias("total_urls"),
        F.sum("clean_chars").alias("total_clean_chars"),
        F.sum("raw_chars").alias("total_raw_chars"),
    )
