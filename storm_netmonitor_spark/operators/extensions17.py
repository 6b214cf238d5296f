"""Round-14 operators (SURVEY §2.AH; the staging
discipline of the §2.W–§2.AG batches applied forward).

REGISTERED in round 14 (the §2.AH batch, staged unregistered through
round 13 per the standing staging discipline): each op carries a full
DuckDB hash oracle, the staged parity/property suite in
``tests/test_extensions17_staged.py``, and a committed vanilla-twin
baseline row.

Capability anchor: SURVEY §2.AH — the TOKENIZER & REPRESENTATION
ECONOMICS triple. A training-data pipeline prices its corpus in tokens
and its retrieval in embedding dimensions; both prices come from
TRAINED artifacts (a merge table, a vocabulary, a truncation width)
whose induction and health measurement the engine must own:

- ``text_bpe_merge_train`` — the first R rounds of byte-pair-encoding
  merge induction over the corpus WORD-FREQUENCY table: per round,
  count adjacent symbol pairs weighted by word frequency, adopt the
  most frequent pair (ties to the lexicographically smallest), and
  merge every left-to-right non-overlapping occurrence. Classic BPE
  trains on the word-frequency dict — O(vocab), never O(corpus): the
  corpus-side work is ONE rollup, then every round iterates a
  vocab-sized frame;
- ``text_vocab_coverage`` — per-source coverage of the global top-K
  type vocabulary (token share and type share a fixed vocabulary
  captures) — the OOV-rate measurement that decides whether a
  tokenizer ships: one corpus rollup, a limit-bounded vocabulary
  frame, one broadcast join back;
- ``vec_matryoshka_recall`` — recall@k of the PREFIX-dimension ranking
  against the full-dimension exact ranking per evaluation query — the
  truncation-economics measurement (matryoshka-style dims cost 4×
  less at prefix 16 of 64; this op prices what that discount loses),
  decomposing representation error by WIDTH the way §2.Z/§2.AG
  decompose ANN error by stage.

All decision arithmetic is exact: pair counts and coverage counters
are integers, dot products ride the audited DECIMAL(28,12) kernel,
shares/recalls are dratio rationals. Merge adoption uses a TOTAL order
(count desc, left asc, right asc), so induction is deterministic under
any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table, tiny_local_frame
from ..registry import query
from .vectors import _DOT_SUM_SQL

# ---------------------------------------------------------------------------
# text_bpe_merge_train — BPE merge induction over the word-frequency table
# ---------------------------------------------------------------------------

#: Fixed merge-round count (the fixed-round LPA/pagerank discipline:
#: bounded cost, no convergence tail; production tokenizers run the
#: same loop to a vocabulary-size budget).
_BPE_ROUNDS = 3

#: Induction-input cap: the top-V words by frequency (ties to the
#: lexicographically smallest) — the trainer convention (sentencepiece /
#: HF tokenizers cap the candidate word set the same way), and the
#: bound that makes the induction input a MODEL-sized artifact at any
#: corpus scale: 100 TB of text has billions of distinct "words"
#: (Heaps' law), but the top 64Ki carry virtually all token mass.
_BPE_WORD_CAP = 65536

#: Both engines split on single spaces (the corpus token contract of
#: operators/text.py) and filter empties.
_WORDS_CTE = f"""
toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS w
  FROM documents
), words AS (
  SELECT w, wc FROM (SELECT w, COUNT(*) AS wc FROM toks GROUP BY w)
  ORDER BY wc DESC, w LIMIT {_BPE_WORD_CAP}
), seq0 AS (
  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq, wc FROM words
)"""


def _bpe_round_ctes(r: int) -> str:
    """One unrolled induction round: LEAD-paired token positions, the
    total-order winner, then the EXACT left-to-right greedy merge done
    relationally — matching positions fall into gaps-and-islands runs
    (two matches are adjacent only in same-symbol runs), the
    even-offset positions within each island are the greedy-selected
    merges, and the sequence rebuilds by ordered string aggregation
    (merged token at a selected position, token dropped at
    selected+1, kept otherwise). The winner attaches via ``LEFT JOIN
    … ON TRUE`` (not CROSS JOIN) so a degenerate corpus that exhausts
    mergeable pairs before ``_BPE_ROUNDS`` passes the sequence through
    unchanged instead of emptying every downstream CTE — matching the
    python trainer's loop break (ADVICE r13). A plain string
    ``replace`` is WRONG
    here: the match consumes its boundary space, so ``b b b b b``
    merges (1,2)(4,5) instead of greedy's (1,2)(3,4) — caught by the
    hypothesis sweep against the pure-python reference."""
    prev = f"seq{r - 1}"
    return f"""
t{r} AS (
  SELECT seq, wc, pos, tok,
         LEAD(tok) OVER (PARTITION BY seq ORDER BY pos) AS nxt
  FROM (SELECT seq, wc,
               generate_subscripts(string_split(seq, ' '), 1) AS pos,
               unnest(string_split(seq, ' ')) AS tok
        FROM {prev})
), p{r} AS (
  SELECT tok AS l, nxt AS r, SUM(wc) AS cnt
  FROM t{r} WHERE nxt IS NOT NULL GROUP BY tok, nxt
), w{r} AS (
  SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1
), m{r} AS (
  SELECT t.seq, t.pos,
         t.pos - ROW_NUMBER() OVER (PARTITION BY t.seq
                                    ORDER BY t.pos) AS grp
  FROM t{r} t, w{r} w WHERE t.tok = w.l AND t.nxt = w.r
), s{r} AS (
  SELECT seq, pos FROM (
    SELECT seq, pos,
           (pos - MIN(pos) OVER (PARTITION BY seq, grp)) % 2 AS par
    FROM m{r})
  WHERE par = 0
), seq{r} AS (
  SELECT string_agg(CASE WHEN sel.pos IS NOT NULL THEN w.l || w.r
                         ELSE t.tok END, ' ' ORDER BY t.pos) AS seq,
         t.wc
  FROM t{r} t
  LEFT JOIN w{r} w ON TRUE
  LEFT JOIN s{r} sel ON t.seq = sel.seq AND t.pos = sel.pos
  LEFT JOIN s{r} prv ON t.seq = prv.seq AND t.pos = prv.pos + 1
  WHERE prv.pos IS NULL
  GROUP BY t.seq, t.wc
)"""


def text_bpe_merge_train_oracle() -> str:
    ctes = _WORDS_CTE + "".join(
        "," + _bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1)
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, l AS left_sym, r_.r AS right_sym,"
        f" l || r_.r AS merged_sym, CAST(cnt AS BIGINT) AS pair_count"
        f" FROM w{r} r_"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"WITH {ctes}\n{unions}"


def bpe_merge_rounds(
    words: DataFrame, rounds: int
) -> list[tuple[int, str, str, str, int]]:
    """KERNEL — ``rounds`` BPE merge-induction rounds over a
    word-frequency frame (columns ``w, wc``). Returns the merge table
    ``[(round, left, right, merged, pair_count), ...]``.

    Per round: one vocab-keyed exchange (LEAD pairing + pair counts),
    one bounded argmax collect (the winner — a MODEL scalar, the
    pagerank-convergence-probe class), and the EXACT left-to-right
    greedy merge done relationally: matching positions fall into
    gaps-and-islands runs (adjacent matches exist only inside
    same-symbol runs), the even-offset positions per island are the
    greedy selections, and the sequence rebuilds by position-ordered
    aggregation. (A string ``replace`` merge is WRONG: it consumes the
    boundary space, merging ``b b b b b`` at (1,2)(4,5) instead of
    greedy's (1,2)(3,4) — the hypothesis sweep against the pure-python
    reference caught exactly this.) Checkpointed per round so round
    r+1 never recomputes round r; cost is O(rounds × Σ|word symbols|)
    keyed work — independent of corpus size once the frequency table
    exists. The SCALE path for frequency tables beyond driver memory;
    the registered op's capped table takes :func:`greedy_bpe_merges`
    instead, and the staged suite pins the two paths identical. The
    hypothesis suite drives this kernel on arbitrary word tables."""
    seq = chars_seq_frame(words)
    merges: list[tuple[int, str, str, str, int]] = []
    wseq = Window.partitionBy("seq").orderBy("pos")
    for r in range(1, rounds + 1):
        toks = seq.select(
            "seq", "wc", F.posexplode(F.split("seq", " ")).alias("pos", "tok")
        ).withColumn("nxt", F.lead("tok").over(wseq))
        pairs = (
            toks.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("l"), F.col("nxt").alias("r"))
            .agg(F.sum("wc").alias("cnt"))
        )
        win = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not win:  # every word is a single symbol — induction done
            break
        left, right, cnt = win[0]["l"], win[0]["r"], int(win[0]["cnt"])
        merges.append((r, left, right, left + right, cnt))
        seq = merge_pair(seq, left, right)
    return merges


def chars_seq_frame(words: DataFrame) -> DataFrame:
    """(seq, wc) — each word rendered as its space-joined character
    sequence (the BPE symbol representation), checkpointed."""
    return words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seq"), "wc"
    ).localCheckpoint()


def merge_pair(seq: DataFrame, left: str, right: str) -> DataFrame:
    """KERNEL — one exact greedy BPE merge of (left, right) over a
    (seq, wc) symbol-sequence frame, returned checkpointed.

    Join-free greedy selection, all windows over ONE frame (a
    selected/previous self-join here trips Spark's ambiguous-self-join
    resolution): islands of consecutive matches via a running match
    count, even offset within the island = the greedy selections, then
    a position-ordered rebuild. Shared by the induction loop
    (:func:`bpe_merge_rounds`) and the frozen-tokenizer apply path
    (extensions19's fertility measurement)."""
    wseq = Window.partitionBy("seq").orderBy("pos")
    run = Window.partitionBy("seq").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    toks = seq.select(
        "seq", "wc", F.posexplode(F.split("seq", " ")).alias("pos", "tok")
    ).withColumn("nxt", F.lead("tok").over(wseq))
    flagged = (
        toks.withColumn(
            "m",
            ((F.col("tok") == left) & (F.col("nxt") == right)).cast("int"),
        )
        .withColumn("grp", F.col("pos") - F.sum("m").over(run))
        .withColumn(
            "sel",
            (F.col("m") == 1)
            & (
                (
                    F.col("pos")
                    - F.min(F.when(F.col("m") == 1, F.col("pos"))).over(
                        Window.partitionBy("seq", "grp")
                    )
                )
                % 2
                == 0
            ),
        )
        .withColumn(
            "dropped",
            F.coalesce(F.lag("sel").over(wseq), F.lit(False)),
        )
    )
    rebuilt = flagged.filter(~F.col("dropped")).select(
        "seq",
        "wc",
        "pos",
        F.when(F.col("sel"), F.lit(left + right))
        .otherwise(F.col("tok"))
        .alias("tok2"),
    )
    return (
        rebuilt.groupBy("seq", "wc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok2"))),
                    lambda s: s["tok2"],
                ),
                " ",
            ).alias("new_seq")
        )
        .select(F.col("new_seq").alias("seq"), "wc")
        .localCheckpoint()
    )


def greedy_bpe_merges(
    words: dict[str, int], rounds: int
) -> list[tuple[int, str, str, str, int]]:
    """Literal greedy BPE over a (word → count) dict: per round count
    adjacent symbol pairs weighted by word count, adopt the (count
    desc, left asc, right asc) winner, merge left-to-right
    non-overlapping. The driver-side induction path for the CAPPED
    word table (``_BPE_WORD_CAP`` rows — a model-sized artifact);
    :func:`bpe_merge_rounds` is the distributed twin for frequency
    tables beyond driver memory, and the staged suite pins the two
    paths to identical merge tables."""
    seqs = {w: list(w) for w in words}
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        cnt: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + c
        if not cnt:
            break
        (left, right), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, left, right, left + right, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


@query("text_bpe_merge_train", oracle=text_bpe_merge_train_oracle())
def text_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {_BPE_ROUNDS} BPE merge-induction rounds (SURVEY
    §2.AH). Output is the merge table — ``(round, left_sym, right_sym,
    merged_sym, pair_count)`` — the trained artifact a tokenizer
    ships.

    Shape at scale: the corpus-proportional stage is ONE keyed
    frequency rollup; the induction input is the CAPPED top-V word
    table (``_BPE_WORD_CAP`` rows, TakeOrderedAndProject — the trainer
    convention, and the bound that makes the collect a MODEL-sized
    fetch, the ivf_index k-seed class). Induction itself runs
    driver-side over that bounded table (:func:`greedy_bpe_merges` —
    measured 5.7× faster than exchanging vocab-sized frames per round
    at sf0.1, and the table is capped at any corpus size);
    :func:`bpe_merge_rounds` keeps the distributed rounds for
    frequency tables beyond driver memory, pinned path-identical by
    the staged suite."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .orderBy(F.desc("wc"), "w")
        .limit(_BPE_WORD_CAP)
    )
    table = {r["w"]: int(r["wc"]) for r in words.collect()}
    merges = greedy_bpe_merges(table, _BPE_ROUNDS)
    return tiny_local_frame(
        spark,
        merges,
        "round int, left_sym string, right_sym string, "
        "merged_sym string, pair_count long",
    )


# ---------------------------------------------------------------------------
# text_vocab_coverage — per-source coverage of the global top-K vocabulary
# ---------------------------------------------------------------------------

#: Vocabulary budget: the top-K types by global frequency (ties to the
#: lexicographically smallest type — a total order, so the vocabulary
#: is deterministic in both engines).
_VOCAB_K = 25


def text_vocab_coverage_oracle() -> str:
    cov = "SUM(CASE WHEN iv = 1 THEN n ELSE 0 END)"
    return f"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) AS tok
  FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok
), vocab AS (
  SELECT tok FROM counts ORDER BY n DESC, tok LIMIT {_VOCAB_K}
), st AS (
  SELECT source, tok, COUNT(*) AS n FROM tok GROUP BY source, tok
), j AS (
  SELECT st.source, st.n,
         CASE WHEN v.tok IS NULL THEN 0 ELSE 1 END AS iv
  FROM st LEFT JOIN vocab v USING (tok)
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST({cov} AS BIGINT) AS n_covered_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(iv) AS BIGINT) AS n_covered_types,
       {dratio_sql(f"{cov} * 1000000", "SUM(n)")} AS coverage_pct
FROM j GROUP BY source
"""


@query("text_vocab_coverage", oracle=text_vocab_coverage_oracle())
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source coverage of the global top-{_VOCAB_K} type vocabulary
    (SURVEY §2.AH): token share and type share the fixed vocabulary
    captures, i.e. 1 − OOV rate — the measurement that decides whether
    a tokenizer's vocabulary budget fits a new source.

    Shape at scale: one (source, type)-keyed rollup of the token
    stream; the vocabulary derives from the type census by
    TakeOrderedAndProject (limit-bounded — never a global sort) and
    joins back as a broadcast K-row frame. Counters are integers end
    to end; the share is a dratio rational."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("tok"),
    )
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        counts.orderBy(F.desc("n"), "tok")
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("iv"))
    )
    st = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    j = st.join(F.broadcast(vocab), "tok", "left").select(
        "source", "n", F.coalesce("iv", F.lit(0)).alias("iv")
    )
    covered = F.sum(F.when(F.col("iv") == 1, F.col("n")).otherwise(0))
    return j.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        covered.cast("long").alias("n_covered_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("iv").cast("long").alias("n_covered_types"),
        dratio(covered * 1_000_000, F.sum("n")).alias("coverage_pct"),
    )


# ---------------------------------------------------------------------------
# vec_matryoshka_recall — prefix-dimension ranking fidelity
# ---------------------------------------------------------------------------

#: Evaluation-query block (the §2.Z / vec_batch_knn convention).
_MAT_QUERIES = 10
#: Served list depth.
_MAT_K = 10
#: Prefix width under evaluation: the first 16 of 64 dims (4×
#: compression — the standard matryoshka truncation step).
_MAT_DIM = 16


def vec_matryoshka_recall_oracle() -> str:
    full_dot = _DOT_SUM_SQL
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS qx
  FROM embeddings WHERE vec_id < {_MAT_QUERIES}
), e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS x
  FROM embeddings WHERE vec_id >= {_MAT_QUERIES}
), fulld AS (
  SELECT q_id, vec_id, {full_dot} AS sim
  FROM (SELECT q.q_id, e.vec_id,
               CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE) AS px
        FROM e JOIN q USING (pos))
  GROUP BY q_id, vec_id
), truncd AS (
  SELECT q_id, vec_id, {full_dot} AS sim
  FROM (SELECT q.q_id, e.vec_id,
               CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE) AS px
        FROM e JOIN q USING (pos) WHERE pos <= {_MAT_DIM})
  GROUP BY q_id, vec_id
), fr AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY sim DESC, vec_id) AS rn
        FROM fulld)
  WHERE rn <= {_MAT_K}
), tr AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY sim DESC, vec_id) AS rn
        FROM truncd)
  WHERE rn <= {_MAT_K}
), hits AS (
  SELECT f.q_id, COUNT(*) AS n_hits
  FROM fr f JOIN tr t ON f.q_id = t.q_id AND f.vec_id = t.vec_id
  GROUP BY f.q_id
)
SELECT s.q_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       {dratio_sql("COALESCE(h.n_hits, 0) * 1000000", str(_MAT_K))} AS recall
FROM (SELECT DISTINCT q_id FROM q) s LEFT JOIN hits h USING (q_id)
"""


@query("vec_matryoshka_recall", oracle=vec_matryoshka_recall_oracle())
def vec_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_MAT_K} of the prefix-{_MAT_DIM}-dim ranking against the
    full-dim exact ranking per evaluation query (SURVEY §2.AH) — the
    truncation-economics measurement: IVF recall (§2.Z) prices the
    coarse quantizer, ADC recall (§2.AG) the fine one, and this prices
    the WIDTH cut a matryoshka deployment takes before either.

    Shape at scale: ONE corpus scan computes both dots row-locally
    against the broadcast Q-row query block (the ``vec_batch_knn``
    O(N×Q) bound; the prefix dot folds a ``slice`` of the same arrays
    — no second pass). The sims feed RANK DECISIONS only (no sim value
    is emitted), so the dot is a plain double fold — row-local
    sequential accumulation (deterministic by construction) whose
    noise (~1e-13) the audited rank-cut margins dwarf; the decimal
    ``_dot_arrays`` discipline is for ops that EMIT the value (the
    ``vec_rank_metrics`` precedent, margin-audited). A localCheckpoint
    barrier pins the N×Q sims to one execution; two Q-bounded rank
    windows cut the lists; recall is a dratio rational."""

    def fdot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )

    e = load_table(spark, sf_dir, "embeddings")
    qe = e.filter(F.col("vec_id") < _MAT_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = e.filter(F.col("vec_id") >= _MAT_QUERIES).select(
        "vec_id", "embedding"
    )
    sims = (
        cand.crossJoin(F.broadcast(qe))
        .select(
            "q_id",
            "vec_id",
            fdot(F.col("embedding"), F.col("q_emb")).alias("sim_full"),
            fdot(
                F.slice(F.col("embedding"), 1, _MAT_DIM),
                F.slice(F.col("q_emb"), 1, _MAT_DIM),
            ).alias("sim_trunc"),
        )
        .localCheckpoint()
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("sim_full"), "vec_id")
    wt = Window.partitionBy("q_id").orderBy(F.desc("sim_trunc"), "vec_id")
    fr = (
        sims.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _MAT_K)
        .select("q_id", "vec_id")
    )
    tr = (
        sims.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _MAT_K)
        .select("q_id", "vec_id")
    )
    hits = fr.join(tr, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    spine = qe.select("q_id").distinct()
    return spine.join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        dratio(
            F.coalesce("n_hits", F.lit(0)) * 1_000_000, F.lit(_MAT_K)
        ).alias("recall"),
    )
