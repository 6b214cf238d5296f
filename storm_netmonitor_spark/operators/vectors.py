"""Vector similarity search + multimodal columns (SURVEY §2.K).

Embeddings are 64-dim L2-normalized float32 (FIXTURES.md) → cosine ≡ dot
product. Dot products are computed by posexplode → per-position multiply →
exact decimal sum: identical in both engines AND shuffle-parallel (the form
that distributes across 1000 executors — each (vec, pos) partial is
map-side combined before the per-vector reduce).

Scale notes:
- Brute-force knn against ONE query is a broadcast of 64 floats + a single
  scan — linear, perfect at any scale.
- Pairwise ops are BLOCKED by label (↔ IVF cells): the quadratic term is
  per-block. `vec_ann_ivf` is the explicit two-stage ANN path: route the
  query to the nearest centroid blocks, search only those.
- Multimodal decode runs in mapInPandas over binary columns; the heavy
  codec work is stubbed (no image libs in this container) but schema,
  batching and partition flow are real.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.stable import dround
from ..io import (
    disk_artifact_frame,
    disk_artifact_json,
    load_table,
    scatter,
    session_memo,
)
from ..registry import query

#: Decimal grain for dot-product accumulation: products ≤ 1 in magnitude,
#: 12 fractional digits → truncation identical in both engines.
_DOT_DEC = "DECIMAL(28,12)"

_DOT_SUM_SQL = f"CAST(ROUND(SUM(CAST(px AS {_DOT_DEC})), 6) AS DOUBLE)"


def _pos_explode(df: DataFrame, id_col: str) -> DataFrame:
    """(id, pos, x) rows from (id, embedding) — pos is 1-based to match
    DuckDB generate_subscripts."""
    return df.select(
        F.col(id_col),
        F.posexplode("embedding").alias("pos0", "xf"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )


def _dot_arrays(a, b):
    """Decimal-stable dot product of two array columns, row-local: each
    product cast to DECIMAL(28,12), exact decimal accumulation, rounded to
    6 — order-independent and bit-identical to the oracle's SUM over
    DECIMAL, with zero explode/shuffle (the scale path for pairwise ops)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    acc = F.aggregate(
        prods,
        F.lit(0).cast(_DOT_DEC),
        lambda acc, p: (acc + p.cast(_DOT_DEC)).cast(_DOT_DEC),
    )
    return F.round(acc, 6).cast("double")


#: Row-strip width for the chunked per-block gram scan: bounds the
#: transient numpy memory of a pairwise candidate kernel at
#: O(chunk × block) doubles (≤ cap-sized blocks: 1024 × 10000 × 8 B
#: ≈ 80 MB) instead of materializing the full block² gram + triangle
#: index arrays (> 2 GB at the cap) in one Python worker.
_GRAM_CHUNK = 1024


def _gram_candidates(pdf: pd.DataFrame, select) -> pd.DataFrame:
    """Per-label candidate kernel shared by the pairwise operators: sort
    the block by vec_id, scan the upper triangle of the gram matrix in
    row strips (one ``strip @ block.T`` matmul each), and let ``select``
    pick candidate pair positions from each strip's (fs, a_idx, b_idx)
    arrays. Returns a (label, a_id, b_id) frame."""
    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"label": [], "a_id": [], "b_id": []})
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    a_parts, b_parts, fs_parts = [], [], []
    for lo in range(0, n - 1, _GRAM_CHUNK):
        hi = min(lo + _GRAM_CHUNK, n - 1)
        strip = m[lo:hi] @ m.T
        # upper triangle only: for row i, columns i+1..n-1
        rows, cols = np.nonzero(
            np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
        )
        a_idx, b_idx = rows + lo, cols
        keep = select(strip[rows, cols], a_idx, b_idx)
        a_parts.append(a_idx[keep])
        b_parts.append(b_idx[keep])
        fs_parts.append(strip[rows, cols][keep])
    a_all = np.concatenate(a_parts)
    b_all = np.concatenate(b_parts)
    fs_all = np.concatenate(fs_parts)
    # a second select over the merged survivors lets top-k kernels merge
    # per-strip shortlists exactly (threshold kernels pass everything)
    keep = select(fs_all, a_all, b_all)
    return pd.DataFrame(
        {
            "label": pdf["label"].iloc[0],
            "a_id": ids[a_all[keep]],
            "b_id": ids[b_all[keep]],
        }
    )


def _rescore_pairs(e: DataFrame, cand: DataFrame) -> DataFrame:
    """Join candidate (label, a_id, b_id) rows back to their embeddings
    and emit the exact decimal sim — the shared verification stage of the
    pairwise operators."""
    ea = e.select(
        "label", F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea")
    )
    eb = e.select(
        "label", F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb")
    )
    return (
        cand.join(ea, ["label", "a_id"])
        .join(eb, ["label", "b_id"])
        .select("label", "a_id", "b_id", _dot_arrays("ea", "eb").alias("sim"))
    )


#: Largest label block admitted to the EXACT pairwise self-join path. A
#: block of n rows costs O(n²) comparisons; past this bound the bucketed
#: ANN operators (vec_ann_ivf / vec_ann_lsh) are the scale path. Must match
#: the literal 10000 in the pairwise oracles' HAVING clauses.
PAIRWISE_BLOCK_CAP = 10_000


def _cap_blocks(e: DataFrame) -> DataFrame:
    """Drop label blocks larger than PAIRWISE_BLOCK_CAP before an exact
    pairwise self-join — bounds the quadratic term per block at 100 TB.
    The block census is a map-side-combined count on the join key, so the
    guard itself adds one cheap aggregate, no extra wide shuffle."""
    ok = (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("block_n"))
        .filter(F.col("block_n") <= PAIRWISE_BLOCK_CAP)
        .select("label")
    )
    return e.join(F.broadcast(ok), "label")


@query(
    "vec_knn_cosine",
    oracle=f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS qx
  FROM embeddings WHERE vec_id = 0
), e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
  FROM embeddings WHERE vec_id <> 0
), dots AS (
  SELECT vec_id, {_DOT_SUM_SQL} AS cos_sim
  FROM (SELECT vec_id, CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE) AS px
        FROM e JOIN q USING (pos))
  GROUP BY vec_id
)
SELECT vec_id, cos_sim FROM dots
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",
)
def vec_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — exact top-10 nearest neighbors to the vec_id=0 query
    vector (brute-force cosine = the ANN ground-truth baseline)."""
    return knn_cosine(load_table(spark, sf_dir, "embeddings"))


def knn_cosine(e: DataFrame, query_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k kernel over a ``(vec_id, embedding)`` frame: broadcast
    the query vector, row-local decimal dot, TakeOrderedAndProject cut
    with the (cos_sim DESC, vec_id) total order."""
    q = _pos_explode(e.filter(F.col("vec_id") == query_id), "vec_id").select(
        "pos", F.col("x").alias("qx")
    )
    cand = _pos_explode(e.filter(F.col("vec_id") != query_id), "vec_id")
    dots = (
        cand.join(F.broadcast(q), "pos")
        .select("vec_id", (F.col("x") * F.col("qx")).alias("px"))
        .groupBy("vec_id")
        .agg(F.round(F.sum(F.col("px").cast(_DOT_DEC)), 6).cast("double").alias("cos_sim"))
    )
    return dots.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


@query(
    "vec_pairwise_topk",
    oracle=f"""
WITH ok AS (
  SELECT label FROM embeddings GROUP BY label HAVING COUNT(*) <= 10000
), e AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
  FROM embeddings JOIN ok USING (label)
), dots AS (
  SELECT label, a_id, b_id, {_DOT_SUM_SQL} AS sim
  FROM (SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS px
        FROM e a JOIN e b
          ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id)
  GROUP BY label, a_id, b_id
)
SELECT label, a_id, b_id, sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY sim DESC, a_id, b_id) AS rn
  FROM dots
)
WHERE rn = 1
""",
)
def vec_pairwise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-similar pair within each label block — label-blocked self-join
    keeps the pairwise term per-block (the IVF-cell pattern).

    Blocks larger than PAIRWISE_BLOCK_CAP rows are excluded from this
    EXACT path (O(block²) is unbounded at 100 TB otherwise); oversized
    blocks belong on the bucketed ANN route (``vec_ann_ivf`` /
    ``vec_ann_lsh``), whose per-cell work is bounded by construction."""
    e = _cap_blocks(load_table(spark, sf_dir, "embeddings"))

    # per-label BLAS shortlist via the shared chunked gram kernel (the old
    # shape materialized BOTH embedding arrays per candidate pair through
    # a prefilter UDF — block² × 2·dim doubles over Arrow): keep the 16
    # best pairs per strip and again after the merge, under the same
    # (fs desc, a_id, b_id) order the old window used. Float-order
    # differences vs the old einsum are ~1e-13 — far inside the 16-deep
    # shortlist margin — and the emitted sim is the exact decimal rescore.
    def top16(fs, a_idx, b_idx):
        return np.lexsort((b_idx, a_idx, -fs))[:16]

    short = e.groupBy("label").applyInPandas(
        lambda pdf: _gram_candidates(pdf, top16),
        "label int, a_id long, b_id long",
    )
    rescored = _rescore_pairs(e, short)
    w = Window.partitionBy("label").orderBy(
        F.col("sim").desc(), F.col("a_id").asc(), F.col("b_id").asc()
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "a_id", "b_id", "sim")
    )


@query(
    "vec_centroid_label",
    oracle=f"""
WITH e AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
  FROM embeddings
), c AS (
  SELECT label, pos,
         CAST(ROUND(CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
              / COUNT(*) AS {_DOT_DEC}), 6) AS DOUBLE) AS cx
  FROM e GROUP BY label, pos
)
SELECT label,
       array_to_string(list(CAST(cx AS DECIMAL(10,6)) ORDER BY pos), ',') AS centroid
FROM c GROUP BY label
""",
)
def vec_centroid_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean vector per label — per-(label,pos) decimal-exact average,
    re-assembled in position order (the centroid step of k-means / IVF).

    The centroid is serialized as a comma-joined DECIMAL(10,6) string: the
    driver's canonicalizer cannot sort list cells (same crash class as
    agg_collect_sorted, CORRECTNESS_r01), and fixed-point decimal rendering
    avoids the Spark ``1.0E-5`` vs DuckDB ``1e-05`` exponent-notation split
    a raw double→string cast would hit."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = _pos_explode(e.select(F.col("label").alias("vid_label"), "embedding"), "vid_label")
    cent = ex.groupBy(F.col("vid_label").alias("label"), "pos").agg(
        F.round(
            (F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).cast(
                _DOT_DEC
            ),
            6,
        )
        .cast("double")
        .alias("cx")
    )
    return cent.groupBy("label").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s.cx.cast("decimal(10,6)").cast("string"),
            ),
        ).alias("centroid")
    )


#: IVF parameters. Measured on the sf0.01 embeddings (near-uniform random
#: unit vectors — the HARD case for ANN; real text/image embeddings cluster
#: far more strongly): K=16, 5 Lloyd iterations, nprobe=6 → ~38 % of the
#: corpus scanned, 8/10 recall vs the exact top-10.
IVF_K = 16
IVF_ITERS = 5
IVF_NPROBE = 6


def _assign_rowlocal(e: DataFrame, cents: list[list[float]]) -> DataFrame:
    """``e`` + column ``k`` = nearest centroid by dot product. The K×dim
    model ships inside an Arrow-vectorized pandas UDF (numpy batch matmul,
    first-max tie-break = smallest k via ``argmax``) — assignment is pure
    ROUTING, so it takes the fast float path (numpy batch matmul); every
    EMITTED similarity is still rescored with the exact decimal dot. The
    step moves no data at all — at 100 TB this is a map over the corpus,
    not a 64×-exploded join."""
    cmat = np.array(cents, dtype=np.float64).T  # dim × K

    @F.pandas_udf("int")
    def nearest(emb: pd.Series) -> pd.Series:
        m = np.array(emb.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(m @ cmat, axis=1).astype("int32"))

    return e.withColumn("k", nearest("embedding"))


def _lloyd_round(
    spark: SparkSession, corpus: DataFrame, cents: list[list[float]]
) -> list[list[float]]:
    """One distributed Lloyd iteration returning L2-normalized centroid
    means, as ONE mapInPandas pass: each partition assigns its vectors
    (numpy batch matmul) and emits K partial (sum-vector, count) rows —
    assignment and update share the same scan, nothing shuffles, and the
    collect is P×K model-scale rows (the flat form of MLlib KMeans'
    ``treeAggregate``; tree-reduce instead when partition count is huge).
    Deterministic run-to-run: the cached corpus pins partition contents,
    numpy reductions are fixed-order per array, and the driver reduces
    partials in partition order (Spark collects partitions in order)."""
    k_n, dim = len(cents), len(cents[0])
    cmat = np.array(cents, dtype=np.float64).T  # dim × K

    def partials(batches):
        sums = np.zeros((k_n, dim))
        cnts = np.zeros(k_n, dtype=np.int64)
        for pdf in batches:
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ks = np.argmax(m @ cmat, axis=1)
            for k in np.unique(ks):
                sums[k] += m[ks == k].sum(axis=0)
            cnts += np.bincount(ks, minlength=k_n)
        yield pd.DataFrame(
            {"k": np.arange(k_n), "s": list(sums), "n": cnts}
        )

    rows = corpus.select("embedding").mapInPandas(
        partials, "k int, s array<double>, n bigint"
    ).collect()
    sums = np.zeros((k_n, dim))
    cnts = np.zeros(k_n, dtype=np.int64)
    for r in rows:
        sums[r["k"]] += np.asarray(r["s"])
        cnts[r["k"]] += r["n"]
    out = []
    for k in range(k_n):
        if cnts[k] == 0:  # emptied cluster keeps its previous centroid
            out.append(cents[k])
            continue
        m = sums[k] / cnts[k]
        nrm = math.sqrt(float(m @ m)) or 1.0
        out.append([float(x) for x in m / nrm])
    return out


def lloyd_rounds_sql(p: str, e: str, iters: int) -> str:
    """The unrolled Lloyd per-iteration CTE blocks — assignment argmax,
    per-cluster mean, L2 normalization with the zero-norm guard,
    empty-cluster carryover — shared by EVERY IVF/SemDeDup oracle chain
    (``_ivf_oracle``, the SemDeDup twin in corpus.py, the sd_-prefixed
    and iv_-prefixed chains in extensions6, the base-trained chain in
    extensions7). ONE source of truth: a numeric fix here lands in every
    twin at once instead of five hand-synced copies. ``p`` prefixes the
    generated CTE names ({p}a/{p}m/{p}n/{p}c); ``e`` names the
    pos-exploded corpus CTE; requires ``{p}c0`` (the seeds) upstream."""
    rounds = []
    for i in range(iters):
        rounds.append(
            lloyd_route_sql(f"{p}a{i}", e, f"{p}c{i}")
            + f""", {p}m{i} AS MATERIALIZED (
  SELECT a.cid, {e}.pos, SUM({e}.x) / COUNT(*) AS mx
  FROM {e} JOIN {p}a{i} a USING (vec_id) GROUP BY 1, 2
), {p}n{i} AS MATERIALIZED (
  SELECT cid, sqrt(SUM(mx * mx)) AS nrm FROM {p}m{i} GROUP BY 1
), {p}c{i + 1} AS MATERIALIZED (
  SELECT c.cid, c.pos,
         COALESCE(m.mx / (CASE WHEN n.nrm = 0 THEN 1.0 ELSE n.nrm END),
                  c.cx) AS cx
  FROM {p}c{i} c
  LEFT JOIN {p}m{i} m ON m.cid = c.cid AND m.pos = c.pos
  LEFT JOIN {p}n{i} n ON n.cid = c.cid
)"""
        )
    return "".join(rounds)


def lloyd_route_sql(name: str, e: str, cents: str) -> str:
    """One ROW_NUMBER argmax-routing CTE: corpus ``e`` assigned to its
    max-dot centroid in ``cents`` (ties to the smallest cid — the exact
    tie-break ``route_to_centroids``' np.argmax applies). Emits
    ``, {name} AS MATERIALIZED (…)``."""
    return f""", {name} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT t.vec_id, t.cid,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY t.dot DESC, t.cid) AS rn
    FROM (SELECT {e}.vec_id, c.cid, SUM({e}.x * c.cx) AS dot
          FROM {e} JOIN {cents} c USING (pos) GROUP BY 1, 2) t
  ) WHERE rn = 1
)"""


def _ivf_cand_ctes() -> str:
    """The IVF pipeline's CTE chain up to and including ``cand`` (the
    probed-cell candidate set): 5 unrolled Lloyd rounds, final cell
    assignment ``afin``, query-to-centroid dots ``qd``, nprobe choice
    ``probe``, and ``cand``. Also defines ``e`` (pos-exploded corpus,
    vec_id <> 0) and ``q`` (pos-exploded query vector, columns pos/qx)
    for downstream reuse. Shared verbatim by ``_ivf_oracle`` and the
    composed ``vec_ann_ivfpq`` twin — one source of truth for the
    probe semantics."""
    head = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id <> 0
), q AS MATERIALIZED (
  SELECT generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS qx
  FROM embeddings WHERE vec_id = 0
), c0 AS MATERIALIZED (
  SELECT vec_id - 1 AS cid, pos, x AS cx FROM e
  WHERE vec_id BETWEEN 1 AND {IVF_K}
)"""
    rounds = [lloyd_rounds_sql("", "e", IVF_ITERS)]
    n_fin = IVF_ITERS
    tail = lloyd_route_sql("afin", "e", f"c{n_fin}") + f""", qd AS MATERIALIZED (
  SELECT c.cid, SUM(q.qx * c.cx) AS dot
  FROM q JOIN c{n_fin} c USING (pos) GROUP BY 1
), probe AS MATERIALIZED (
  SELECT cid FROM (
    SELECT cid, ROW_NUMBER() OVER (ORDER BY dot DESC, cid) AS rn FROM qd
  ) WHERE rn <= {IVF_NPROBE}
), cand AS MATERIALIZED (
  SELECT vec_id FROM afin WHERE cid IN (SELECT cid FROM probe)
)"""
    return head + "".join(rounds) + tail


def _ivf_oracle() -> str:
    """Full SQL twin of the IVF pipeline (VERDICT r4 #5 — upgraded from
    rows-only): the 5 Lloyd rounds, final cell assignment, nprobe cell
    choice, and decimal top-10 are unrolled as one generated CTE chain.
    The engine's Lloyd accumulates in float (numpy partials) while the
    oracle uses SQL double sums — different orders — but every DECISION
    the pipeline takes has enormous margin over the ~1e-13 accumulation
    error (measured at sf0.01: min assign margin 2.3e-4 across all
    rounds, probe margin 9.2e-3, shortlist cut margin 3.3e-4), so both
    arithmetics choose identical cells/candidates, and every EMITTED
    number is the order-independent decimal dot. CTEs are MATERIALIZED:
    the round-over-round references otherwise inline exponentially."""
    return _ivf_cand_ctes() + f""", dots AS MATERIALIZED (
  SELECT vec_id, {_DOT_SUM_SQL} AS cos_sim
  FROM (SELECT e.vec_id, e.x * q.qx AS px
        FROM e JOIN q USING (pos)
        WHERE e.vec_id IN (SELECT vec_id FROM cand))
  GROUP BY vec_id
)
SELECT vec_id, cos_sim FROM dots
ORDER BY cos_sim DESC, vec_id
LIMIT 10"""


def ivf_index(spark: SparkSession, sf_dir: str):
    """The TRAINED IVF index — (cached corpus handle, K×dim centroid
    model) — shared by the registered ``vec_ann_ivf`` and the §2.W
    streaming-serve candidate (one index semantics, two consumers).

    - cache: the corpus is re-scanned once per Lloyd iteration — on a
      cluster this is the persisted training set of the index build;
    - scatter(…, 8): every Lloyd round is an Arrow pass, and
      per-partition Python round-trips dominate at this width;
    - the K×dim centroid MODEL persists across PROCESSES (VERDICT r9
      #3): the driver's harness and any production scheduler use a fresh
      session per run, and at 100 TB the Lloyd re-train is the whole job
      — a fresh process reads the seeded, fingerprint-keyed artifact
      instead (json float round-trip is bit-exact, so downstream hashes
      are unchanged)."""
    e = load_table(spark, sf_dir, "embeddings")

    def train():
        corpus = scatter(
            e.filter(F.col("vec_id") != 0).select("vec_id", "embedding"), 8
        ).cache()

        def lloyd():
            # deterministic init: the first K non-query vectors are the
            # seeds
            seeds = corpus.filter(F.col("vec_id").between(1, IVF_K)).orderBy(
                "vec_id"
            )
            cents = [
                [float(x) for x in r["embedding"]] for r in seeds.collect()
            ]
            for _ in range(IVF_ITERS):
                cents = _lloyd_round(spark, corpus, cents)
            return cents

        cents = disk_artifact_json(
            "ivf_cents", "v1", sf_dir, lloyd, extra=(IVF_K, IVF_ITERS)
        )
        return corpus, cents

    return session_memo(
        spark, ("ivf_index", os.path.abspath(sf_dir)), train, sf_dir=sf_dir
    )


def ivf_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVED index's posting-list view: the corpus's ``(vec_id,
    cid)`` assignments under the ``ivf_index`` centroids, persisted in
    the artifact store next to the model. An IVF index IS its posting
    lists — serving reads them, it never re-routes the standing corpus
    — so evaluation passes that need every vector's cell under the
    served snapshot (the §2.Z recall curve) read this artifact instead
    of re-running the O(N·K·dim) routing per invocation (the
    ``base_routed_assignments`` discipline applied to the serving
    snapshot; VERDICT r13 #5). Routing is deterministic, and the
    consumers are join/census-shaped, so the parquet round-trip's order
    loss is invisible."""
    from .extensions7 import route_to_centroids

    corpus, cents = ivf_index(spark, sf_dir)
    return session_memo(
        spark,
        ("ivf_posting_lists", os.path.abspath(sf_dir)),
        lambda: disk_artifact_frame(
            spark,
            "ivf_posting_lists",
            "v1",
            sf_dir,
            lambda: route_to_centroids(corpus, cents),
            extra=(IVF_K, IVF_ITERS),
        ),
        sf_dir=sf_dir,
    )


@query("vec_ann_ivf", oracle=_ivf_oracle())
def vec_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbor — the 100 TB scale path next to the
    ``vec_knn_cosine`` brute-force baseline.

    Coarse quantizer: spherical k-means (K=16, 5 Lloyd iterations) trained
    with the standard Spark pattern — the DATA stays distributed, only the
    K×dim centroid model is collected/broadcast per iteration.
    Deterministic throughout: init = embeddings 1..K, decimal-stable
    centroid means, fixed tie-breaks — no RNG, no clocks. The query probes
    its nprobe=6 nearest cells and brute-forces only those blocks.

    At scale the trained centroids are an artifact (write once, reuse per
    query); training cost here is 5 small shuffles. Hash oracle (r5): the
    unrolled Lloyd/probe twin in ``_ivf_oracle`` — decision margins dwarf
    the float-vs-SQL accumulation differences, emitted values are decimal.
    Recall vs the exact top-10 is additionally asserted in
    tests/test_semantics.py.
    """
    e = load_table(spark, sf_dir, "embeddings")
    corpus, cents = ivf_index(spark, sf_dir)

    # the query vector is one row — fetched like the LSH query row; probing
    # is model-side math (K dots on the driver), not a Spark job
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    sims = sorted(
        ((sum(c[i] * qvec[i] for i in range(len(qvec))), -k) for k, c in enumerate(cents)),
        reverse=True,
    )
    probe_ks = [-nk for _, nk in sims[:IVF_NPROBE]]

    # one routing pass: cell assignment + float query dot per vector (the
    # vectorized prefilter, same discipline as vec_pairwise_topk); only
    # vectors in probed cells survive, a 4×-overfetched shortlist is
    # exact-decimal rescored (float vs decimal dots differ < 1e-9 — far
    # inside the overfetch margin), and the emitted cos_sim is decimal
    cmat = np.array(cents, dtype=np.float64).T
    qarr = np.array(qvec, dtype=np.float64)

    @F.pandas_udf("k int, fs double")
    def route(emb: pd.Series) -> pd.DataFrame:
        m = np.array(emb.tolist(), dtype=np.float64)
        return pd.DataFrame(
            {"k": np.argmax(m @ cmat, axis=1).astype("int32"), "fs": m @ qarr}
        )

    # asNondeterministic: the UDF IS deterministic, but without the marker
    # Catalyst pushes the probe filter through the projection by
    # SUBSTITUTING the expression — the plan then evaluates route() twice
    # (once for .k in the filter, once for .fs). The marker pins one pass.
    routed = corpus.withColumn(
        "r", route.asNondeterministic()("embedding")
    ).select(
        "vec_id", "embedding", F.col("r.k").alias("k"), F.col("r.fs").alias("fs")
    )
    short = (
        routed.filter(F.col("k").isin(probe_ks))
        .orderBy(F.col("fs").desc(), F.col("vec_id").asc())
        .limit(40)
    )
    q_lit = F.array(*[F.lit(v) for v in qvec])
    dots = short.select(
        "vec_id", _dot_arrays(F.col("embedding"), q_lit).alias("cos_sim")
    )
    return dots.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)


@query(
    "vec_near_dup_cosine",
    oracle=f"""
WITH ok AS (
  SELECT label FROM embeddings GROUP BY label HAVING COUNT(*) <= 10000
), e AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
  FROM embeddings JOIN ok USING (label)
), dots AS (
  SELECT a_id, b_id, {_DOT_SUM_SQL} AS sim
  FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS px
        FROM e a JOIN e b
          ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id)
  GROUP BY a_id, b_id
)
SELECT a_id, b_id, sim FROM dots WHERE sim >= 0.8
""",
)
def vec_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.8), label-blocked.
    The decimal dot is identical in both engines, so the threshold cannot
    flip between them. Blocks over PAIRWISE_BLOCK_CAP are excluded from
    this exact path (see vec_pairwise_topk) — route them through
    ``text_near_dedup_simhash``-style banding or ``vec_ann_*``."""
    return near_dup_cosine_pairs(_cap_blocks(load_table(spark, sf_dir, "embeddings")))


def near_dup_cosine_pairs(e: DataFrame) -> DataFrame:
    """Blocked cosine near-dup kernel over a ``(vec_id, embedding,
    label)`` frame: pairs within a block with decimal-exact sim ≥ 0.8.

    The candidate stage is a per-label BLAS prefilter (same shape as
    ``vec_pairwise_topk``): one gram matmul per block, survivors at a
    0.79 guard band — float-vs-decimal dots differ < 1e-9, so the band
    cannot drop a true ≥ 0.8 pair. The old pair self-join materialized
    both embedding arrays per candidate pair through the Arrow UDF
    (block² × 2·dim doubles). The exact threshold is applied on the
    decimal rescore of the tiny survivor set, matching the oracle."""

    def above_band(fs, a_idx, b_idx):
        return fs >= 0.79

    cand = e.groupBy("label").applyInPandas(
        lambda pdf: _gram_candidates(pdf, above_band),
        "label int, a_id long, b_id long",
    )
    dots = _rescore_pairs(e, cand).select("a_id", "b_id", "sim")
    return dots.filter(F.col("sim") >= 0.8)


@query(
    "multimodal_binary",
    oracle="""
SELECT
  doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS content_md5,
  CAST(n_chars AS BIGINT) AS n_chars
FROM documents
""",
)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: utf-8 encode → BinaryType, byte
    length, content digest — the schema pattern image/audio payloads use
    (binary blob + typed metadata columns)."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@query(
    "multimodal_decode_stub",
    # Full hash oracle (VERDICT r4 #5 — upgraded from rows-only): the
    # stubbed codec emits DETERMINISTIC byte statistics of the utf-8
    # payload, which SQL reproduces exactly for the ASCII test corpus
    # (octet_length == length there; byte values == codepoints). A real
    # codec would be rows-only again — the oracle pins the PLUMBING
    # (schema, Arrow batching, per-row fidelity), which is the part that
    # exists today.
    oracle="""
SELECT doc_id,
       'text/plain' AS mime,
       octet_length(encode(text)) AS n_bytes,
       CASE WHEN length(text) = 0 THEN -1 ELSE ascii(text) END AS first_byte,
       CAST(COALESCE(list_sum([ascii(x) FOR x IN string_split(text, '')]), 0)
            % 65536 AS BIGINT) AS byte_sum_mod
FROM documents
""",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extraction plumbing over binary payloads via
    mapInPandas: real schema / Arrow batching / partition flow, stubbed
    codec (no image/audio libs in this container — the 'decode' is a
    deterministic byte-statistics fake, clearly marked).

    At 100 TB this is the pattern: binary column + metadata in, fixed-width
    feature struct out, one Python worker pass per partition, no shuffle.
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )

    def decode_features(batches):
        for pdf in batches:
            # STUB: a real implementation would decode pdf["payload"]
            # (image/audio bytes) with a codec library here. Deterministic
            # byte statistics stand in for codec output.
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": raw.map(len),
                    "first_byte": raw.map(lambda b: b[0] if len(b) else -1),
                    "byte_sum_mod": raw.map(lambda b: sum(b) % 65536),
                }
            )

    return payloads.mapInPandas(
        decode_features,
        "doc_id long, mime string, n_bytes long, first_byte integer, byte_sum_mod long",
    )


#: Random-hyperplane LSH: fixed hyperplanes drawn once from a seeded
#: generator (deterministic across runs/engines — constants, not RNG at
#: query time). Tuned on the sf0.01 embeddings (near-uniform random unit
#: vectors, the ANN hard case: true neighbors sit at ~72°, so each sign
#: bit disagrees with p≈0.4): 8 planes probed to hamming ≤ 3 → ~35 % of
#: the corpus scanned, 6/10 recall — the same scan/recall tradeoff as the
#: IVF path. Clustered real-world embeddings do far better.
LSH_PLANES = 8
LSH_PROBE_HAMMING = 3


def _lsh_hyperplanes(dim: int) -> "np.ndarray":
    """Fixed-seed hyperplanes, parametric in the embedding dim (the
    driver has regenerated testdata shapes between rounds before; for the
    current dim=64 the values are bit-identical to prior rounds)."""
    rng = np.random.RandomState(20260813)
    return rng.standard_normal((LSH_PLANES, dim))


def _lsh_sig_udf(dim: int):
    planes = _lsh_hyperplanes(dim)
    weights = (1 << np.arange(LSH_PLANES)).astype(np.int64)

    @F.pandas_udf("long")
    def lsh_sig(emb: pd.Series) -> pd.Series:
        v = np.array(emb.tolist(), dtype=np.float64)
        bits = (v @ planes.T) > 0
        return pd.Series(bits @ weights)

    return lsh_sig


def _lsh_oracle(sf_dir: str | None = None) -> str:
    """Full SQL twin of the LSH probe (VERDICT r4 #5 — upgraded from
    rows-only): the hyperplanes are fixed CONSTANTS (seeded at build, no
    query-time RNG), so the whole pipeline — sign-bit signatures, hamming-
    ≤-3 probe, exact decimal rescore, top-10 — is reproducible in SQL with
    the 8×64 plane matrix embedded as literals (repr() round-trips each
    double exactly). Sign bits are float sums, but the smallest |dot| in
    the corpus is ~7e-5 against ~1e-13 accumulation error — nine orders
    of margin, so both engines agree on every bit. The plane literals are
    generated for the dim of the ACTUAL sf0.01 testdata (parquet footer
    read at registration — the driver has regenerated testdata between
    rounds before; falls back to the historical 64), keeping oracle and
    operator in lockstep; the operator itself is parametric in dim.

    LAZY factory (ADVICE r5): resolved by ``registry.resolve_oracle`` at
    ``oracle_sql()`` call time, never at import. The dim probe reads ONE
    row of the embeddings file of the sf_dir actually under verification
    — callers that know it pass it; the driver's dict export resolves
    with ``$SPARK_GRAFT_ORACLE_SF_DIR`` or the contract-pinned sf0.01.
    A failed probe logs the fallback instead of silently assuming 64."""
    probe_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    dim = 64
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(os.path.join(probe_dir, "embeddings.parquet"))
        batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
        dim = len(batch.column("embedding")[0].as_py())
    except Exception as exc:
        import logging

        logging.getLogger(__name__).warning(
            "LSH oracle dim probe failed for %s (%s); falling back to "
            "dim=64 — a mismatch with the dataset under check would "
            "surface as a driver hash red", probe_dir, exc,
        )
    planes = _lsh_hyperplanes(dim)
    vals = ", ".join(
        "(%d, %d, %s)" % (p, i + 1, repr(float(planes[p, i])))
        for p in range(LSH_PLANES)
        for i in range(dim)
    )
    return f"""
WITH pl(plane, pos, w) AS (VALUES {vals}),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), pd AS (
  SELECT e.vec_id, pl.plane, SUM(e.x * pl.w) AS d
  FROM e JOIN pl USING (pos) GROUP BY 1, 2
), sig AS (
  SELECT vec_id,
         SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END) AS sig
  FROM pd GROUP BY 1
), qsig AS (
  SELECT sig AS qs FROM sig WHERE vec_id = 0
), cand AS (
  SELECT s.vec_id FROM sig s, qsig
  WHERE s.vec_id <> 0 AND bit_count(xor(s.sig, qsig.qs)) <= {LSH_PROBE_HAMMING}
), q AS (
  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS qx
  FROM embeddings WHERE vec_id = 0
), dots AS (
  SELECT vec_id, {_DOT_SUM_SQL} AS cos_sim
  FROM (SELECT e.vec_id, CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE) AS px
        FROM e JOIN q USING (pos)
        WHERE e.vec_id IN (SELECT vec_id FROM cand))
  GROUP BY vec_id
)
SELECT vec_id, cos_sim FROM dots
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


@query("vec_ann_lsh", oracle=_lsh_oracle)
def vec_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbor — the second ANN scale
    path next to ``vec_ann_ivf``: random-hyperplane sign bits bucket the
    corpus; the query probes every bucket within hamming distance
    ``LSH_PROBE_HAMMING`` of its own signature (93 of 256 buckets) and
    exact-rescores only those candidates. Signature computation is one
    Arrow-vectorized pass; the probe set is a tiny IN-list semi-join on
    the signature — no pairwise term outside the probed buckets.
    Hash oracle (r5): the fixed-constant planes make the whole probe
    SQL-reproducible (see ``_lsh_oracle``); recall vs the exact top-10 is
    additionally asserted in tests/test_semantics.py."""
    from itertools import combinations

    e = load_table(spark, sf_dir, "embeddings")
    # the query row is ONE collect (LSH's one sanctioned row fetch); its
    # length sizes the hyperplanes and its signature is the same numpy
    # arithmetic the UDF runs
    q_emb_vals = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    planes = _lsh_hyperplanes(len(q_emb_vals))
    weights = (1 << np.arange(LSH_PLANES)).astype(np.int64)
    q_sig = int(
        ((np.array(q_emb_vals) @ planes.T) > 0) @ weights
    )
    sig = e.select(
        "vec_id",
        "embedding",
        _lsh_sig_udf(len(q_emb_vals))("embedding").alias("sig"),
    )

    probe_sigs = {q_sig}
    for k in range(1, LSH_PROBE_HAMMING + 1):
        for bits in combinations(range(LSH_PLANES), k):
            flipped = q_sig
            for b in bits:
                flipped ^= 1 << b
            probe_sigs.add(flipped)

    cand = sig.filter(
        (F.col("vec_id") != 0) & F.col("sig").isin(*[int(s) for s in probe_sigs])
    )
    q_emb = F.array(*[F.lit(x) for x in q_emb_vals])
    scored = cand.select(
        "vec_id", _dot_arrays(q_emb, F.col("embedding")).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)


# ---------------------------------------------------------------------------
# MMR diversified retrieval (NORTH: dedup-aware top-k — the re-ranking that
# keeps a retrieved training batch from being 8 copies of the same document)
# ---------------------------------------------------------------------------

_MMR_CAND = 20  # relevance shortlist (exact brute-force top-k baseline)
_MMR_PICK = 8  # diversified picks emitted
#: trade-off weight: score = 0.75·rel − 0.25·max-sim-to-selected. 0.75 and
#: 0.25 are EXACT binary doubles, so the score arithmetic is two correctly
#: rounded IEEE ops on identical inputs — bit-equal across engines.
_MMR_LAMBDA = 0.75


def _mmr_oracle() -> str:
    """Unrolled greedy-argmax MMR in SQL (the ts_downsample_lttb unrolled-
    recursion precedent): step i picks the (mmr_score DESC, vec_id) argmax
    among candidates not yet selected, penalized by MAX sim to the
    selected set so far."""
    steps = ["""
s1 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS pick_order, vec_id, rel, rel AS mmr_score
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
), sel1 AS MATERIALIZED (SELECT vec_id FROM s1)"""]
    for i in range(2, _MMR_PICK + 1):
        steps.append(f"""
s{i} AS MATERIALIZED (
  SELECT CAST({i} AS BIGINT) AS pick_order, c.vec_id, c.rel,
         CAST({_MMR_LAMBDA!r} AS DOUBLE) * c.rel
           - CAST({1.0 - _MMR_LAMBDA!r} AS DOUBLE) * MAX(m.sim) AS mmr_score
  FROM cand c
  JOIN sims m ON m.a_id = c.vec_id AND m.b_id IN (SELECT vec_id FROM sel{i - 1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  GROUP BY c.vec_id, c.rel
  ORDER BY mmr_score DESC, c.vec_id LIMIT 1
), sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i})""")
    union = "\nUNION ALL\n".join(f"SELECT * FROM s{i}" for i in range(1, _MMR_PICK + 1))
    return f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS qx
  FROM embeddings WHERE vec_id = 0
), e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
  FROM embeddings WHERE vec_id <> 0
), dots AS (
  SELECT vec_id, {_DOT_SUM_SQL} AS cos_sim
  FROM (SELECT vec_id, CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE) AS px
        FROM e JOIN q USING (pos))
  GROUP BY vec_id
), cand AS MATERIALIZED (
  SELECT vec_id, cos_sim AS rel FROM dots
  ORDER BY cos_sim DESC, vec_id LIMIT {_MMR_CAND}
), cx AS (
  SELECT em.vec_id AS id, generate_subscripts(em.embedding, 1) AS pos,
         unnest(em.embedding) AS x
  FROM embeddings em JOIN cand c ON em.vec_id = c.vec_id
), sims AS MATERIALIZED (
  SELECT a_id, b_id, {_DOT_SUM_SQL.replace('px', 'sx')} AS sim
  FROM (SELECT a.id AS a_id, b.id AS b_id,
               CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS sx
        FROM cx a JOIN cx b ON a.pos = b.pos AND a.id <> b.id)
  GROUP BY a_id, b_id
), {','.join(steps)}
{union}
"""


@query("vec_mmr_diversify", oracle=_mmr_oracle())
def vec_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of the vec_id=0 query's top-{_MMR_CAND} cosine shortlist: greedily pick
    {_MMR_PICK} items maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-picked — the dedup-aware retrieval every curation pipeline
    wants when brute top-k returns near-copies (NORTH: similarity search
    as a first-class training-data op).

    Float discipline: rel and pairwise sims are decimal-dot 6-decimal
    doubles (identical across engines); λ = 0.75 and 1−λ = 0.25 are exact
    binary, so each greedy score is two correctly-rounded IEEE ops on
    identical inputs — the emitted mmr_score is BIT-IDENTICAL raw, not
    dround-ed: 0.75a−0.25b over 6-decimal inputs lands on a 1e-6 rounding
    boundary with probability ~1/4 (×10^6 it is (3A−B)/4), exactly the
    stable.py QUOTIENT-hazard shape, so rounding it would CREATE the
    cross-engine divergence it usually prevents.

    Shape at scale: the shortlist is the brute-force knn kernel (broadcast
    query, row-local decimal dot, TakeOrderedAndProject); everything after
    operates on the CONSTANT-size candidate set (≤{_MMR_CAND} rows /
    ≤{_MMR_CAND}² sims) — the greedy recursion is O(k²·pick) driver-free
    work in one Python task, independent of corpus size. The ANN scale
    path (vec_ann_ivf/lsh) slots in as the shortlist source unchanged."""
    return mmr_diversify_over(load_table(spark, sf_dir, "embeddings"))


def mmr_diversify_over(
    e: DataFrame,
    query_id: int = 0,
    n_cand: int = _MMR_CAND,
    n_pick: int = _MMR_PICK,
) -> DataFrame:
    """MMR kernel over a ``(vec_id, embedding)`` frame: exact cosine
    shortlist, pairwise decimal sims, greedy λ-penalized selection in one
    Python task. Factored out of ``vec_mmr_diversify`` (holt_fold_over
    convention) so the property suite can drive it with arbitrary frames
    against a straight-line greedy reference."""
    import pandas as pd

    cand = knn_cosine(e, query_id, n_cand).select(
        "vec_id", F.col("cos_sim").alias("rel")
    )
    ce = e.join(F.broadcast(cand.select("vec_id")), "vec_id").select(
        "vec_id", "embedding"
    )
    pa = _pos_explode(ce, "vec_id").withColumnRenamed("vec_id", "a_id")
    pb = (
        _pos_explode(ce, "vec_id")
        .withColumnRenamed("vec_id", "b_id")
        .withColumnRenamed("x", "y")
    )
    sims = (
        pa.join(pb, "pos")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", (F.col("x") * F.col("y")).alias("px"))
        .groupBy("a_id", "b_id")
        .agg(
            F.round(F.sum(F.col("px").cast(_DOT_DEC)), 6)
            .cast("double")
            .alias("sim")
        )
    )
    kf = sims.join(F.broadcast(cand), sims.a_id == cand.vec_id).select(
        "a_id", "rel", "b_id", "sim"
    )

    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA

    def _greedy(pdf_iter):
        rel: dict[int, float] = {}
        sim: dict[tuple[int, int], float] = {}
        for pdf in pdf_iter:
            for a, r, b, s in zip(
                pdf["a_id"].values, pdf["rel"].values,
                pdf["b_id"].values, pdf["sim"].values,
            ):
                rel[int(a)] = float(r)
                sim[(int(a), int(b))] = float(s)
        out = {"pick_order": [], "vec_id": [], "rel": [], "mmr_score": []}
        selected: list[int] = []
        remaining = dict(rel)
        while remaining and len(selected) < n_pick:
            best_id, best_score = None, None
            for c in sorted(remaining):
                if not selected:
                    score = remaining[c]
                else:
                    ms = max(sim[(c, s)] for s in selected)
                    score = lam * remaining[c] - mu * ms
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            out["pick_order"].append(len(selected))
            out["vec_id"].append(best_id)
            out["rel"].append(rel[best_id])
            out["mmr_score"].append(best_score)
            del remaining[best_id]
        yield pd.DataFrame(out)

    return kf.coalesce(1).mapInPandas(
        _greedy,
        schema="pick_order long, vec_id long, rel double, mmr_score double",
    )


# ---------------------------------------------------------------------------
# kNN-graph triangle census (NORTH: embedding-space structure QA — a
# healthy corpus's neighborhood graph is clustered; a synthetic or
# collapsed embedding space shows it immediately in the triangle rate)
# ---------------------------------------------------------------------------

_TRI_K = 3  # neighbors per node in the kNN graph
#: float-prefilter depth per node for the kNN-graph candidate kernel —
#: ≫ _TRI_K so 6-decimal rounding ties at the exact cut cannot reach past
#: the shortlist (margin-audited: per-node gap s[k-1] − s[depth-1] must
#: exceed 2× the 1e-6 rounding quantum).
_TRI_SHORTLIST = 16


def _knn_candidates(pdf: pd.DataFrame, depth: int) -> pd.DataFrame:
    """Per-label k-NN candidate kernel: strip-chunked gram scan
    (bounded worker memory, _GRAM_CHUNK discipline) emitting each node's
    ``depth`` most-similar neighbors by FLOAT sim as DIRECTED
    (label, a_id, b_id) candidates. Unlike :func:`_gram_candidates`
    (upper-triangle pair kernel), each strip row carries sims to ALL
    columns, so a node's cut needs no cross-strip merge."""
    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"label": [], "a_id": [], "b_id": []})
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    d = min(depth, n - 1)
    a_parts, b_parts = [], []
    for lo in range(0, n, _GRAM_CHUNK):
        hi = min(lo + _GRAM_CHUNK, n)
        strip = m[lo:hi] @ m.T
        rows = np.arange(lo, hi)
        strip[np.arange(hi - lo), rows] = -np.inf  # mask self-sims
        # stable argsort on -sim ⇒ float ties fall to ascending position
        # = ascending vec_id (ids are sorted); exactness comes from the
        # decimal rescore downstream, not from this order
        idx = np.argsort(-strip, axis=1, kind="stable")[:, :d]
        a_parts.append(np.repeat(rows, d))
        b_parts.append(idx.ravel())
    a_idx = np.concatenate(a_parts)
    b_idx = np.concatenate(b_parts)
    return pd.DataFrame(
        {
            "label": pdf["label"].iloc[0],
            "a_id": ids[a_idx],
            "b_id": ids[b_idx],
        }
    )


@query(
    "graph_knn_triangles",
    oracle=f"""
WITH ok AS (
  SELECT label FROM embeddings GROUP BY label HAVING COUNT(*) <= 10000
), e AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS x
  FROM embeddings JOIN ok USING (label)
), dots AS (
  SELECT label, a_id, b_id, {_DOT_SUM_SQL} AS sim
  FROM (SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS px
        FROM e a JOIN e b
          ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id)
  GROUP BY label, a_id, b_id
), sym AS (
  SELECT label, a_id, b_id, sim FROM dots
  UNION ALL
  SELECT label, b_id, a_id, sim FROM dots
), knn AS (
  SELECT label, a_id, b_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY label, a_id
                                 ORDER BY sim DESC, b_id) AS rn
    FROM sym
  ) WHERE rn <= {_TRI_K}
), edges AS (
  SELECT DISTINCT label, LEAST(a_id, b_id) AS lo, GREATEST(a_id, b_id) AS hi
  FROM knn
), tri AS (
  SELECT e1.label, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.label = e1.label AND e2.lo = e1.hi
  JOIN edges e3 ON e3.label = e1.label AND e3.lo = e1.lo AND e3.hi = e2.hi
  GROUP BY e1.label
), nodes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM embeddings JOIN ok USING (label) GROUP BY label
), ecnt AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges GROUP BY label
)
SELECT nodes.label, nodes.n_nodes,
       COALESCE(ecnt.n_edges, 0) AS n_edges,
       COALESCE(tri.n_triangles, 0) AS n_triangles
FROM nodes
LEFT JOIN ecnt ON ecnt.label = nodes.label
LEFT JOIN tri ON tri.label = nodes.label
""",
)
def graph_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the within-label {_TRI_K}-NN graph (NORTH:
    embedding-space QA — neighborhood clustering is the first structural
    signal that an embedding space is healthy vs collapsed/synthetic):
    per label, each vector links to its {_TRI_K} most-similar neighbors
    (decimal sims, (sim DESC, id) tiebreak — a TOTAL order, so ties need
    no margin), edges are undirected-deduped, and triangles are counted
    by the canonical ordered two-join (lo<mid<hi orientation = each
    triangle exactly once).

    Shape at scale: the pairwise term is label-blocked and capped
    (PAIRWISE_BLOCK_CAP — oversized blocks belong on the ANN route) and
    runs as the strip-chunked BLAS gram kernel inside one grouped-pandas
    stage (bounded worker memory; O(block²) flops but only
    O(nodes·shortlist) rows ever leave the kernel — the r6 rewrite that
    replaced a 100M-product-row exchange); the exact decimal rescore +
    (sim DESC, b_id) rank on the candidate frame preserves the total
    order the oracle recomputes, with the float shortlist cut
    margin-audited. The edge frame is O(nodes·k) SPARSE by
    construction, and the triangle two-join runs on that sparse frame
    with (label, vertex) join keys — the standard distributed
    triangle-count shape."""
    e = _cap_blocks(load_table(spark, sf_dir, "embeddings"))
    # per-node float shortlist via the chunked BLAS gram scan (r6 perf
    # rewrite: the old pos-explode self-join pushed O(Σ block²·dim) product
    # rows through an exchange — 100M rows / 18.5 s cold at sf0.1; the
    # kernel's strip @ block.T sees each row's sims to ALL columns, so the
    # per-node cut is complete within its strip), then the EXACT decimal
    # rescore + rank picks the true (sim DESC, b_id) top-k from the
    # 16-deep candidates — float-vs-decimal reorder at the cut is audited
    # by tools/margin_audit.py (shortlist-gap row).
    cand = e.groupBy("label").applyInPandas(
        lambda pdf: _knn_candidates(pdf, _TRI_SHORTLIST),
        "label int, a_id long, b_id long",
    )
    sims = _rescore_pairs(e, cand)
    w = Window.partitionBy("label", "a_id").orderBy(
        F.desc("sim"), F.asc("b_id")
    )
    knn = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TRI_K)
        .select("label", "a_id", "b_id")
    )
    # Materialize the sparse O(nodes·k) edge frame ONCE: four consumers
    # follow (the three triangle-join branches + the edge census), and
    # without the lineage cut each would replay the grouped-pandas kernel
    # + decimal rescore subtree — 4 python-eval stages in one plan and 4×
    # the kernel's work. The frame is the maintained kNN GRAPH of a
    # production embedding-QA pipeline, so it stages to the cross-process
    # artifact store (VERDICT r9 #3): a fresh session reads O(nodes·k)
    # parquet instead of re-running the gram kernel; downstream is
    # joins/aggregates, so the round-trip's row-order loss is immaterial.
    edges = session_memo(
        spark,
        ("knn_graph_edges", os.path.abspath(sf_dir)),
        lambda: disk_artifact_frame(
            spark,
            "knn_graph_edges",
            "v1",
            sf_dir,
            lambda: knn.select(
                "label",
                F.least("a_id", "b_id").alias("lo"),
                F.greatest("a_id", "b_id").alias("hi"),
            ).distinct(),
            extra=(_TRI_K, _TRI_SHORTLIST),
        ),
        sf_dir=sf_dir,
    )
    tri = triangle_count_over(edges)
    nodes = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    ecnt = edges.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    return (
        nodes.join(ecnt, "label", "left")
        .join(tri, "label", "left")
        .select(
            "label",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
    )


# ---------------------------------------------------------------------------
# Product-quantization encode (NORTH: the memory side of ANN serving —
# 64-dim float32 → 8 bytes/vector with a bounded reconstruction error)
# ---------------------------------------------------------------------------

_PQ_SUBS = 8  # subspaces (64 dims → 8 per subspace)
_PQ_CODES = 16  # codebook entries per subspace (seeded: vec_id 1.._PQ_CODES)


@query(
    "vec_pq_encode",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), sub AS (
  SELECT vec_id, CAST((pos - 1) // 8 AS BIGINT) AS sub, pos, x FROM ex
), seeds AS (
  SELECT vec_id AS code, sub, pos, x FROM sub
  WHERE vec_id BETWEEN 1 AND {_PQ_CODES}
), dist AS (
  SELECT s.vec_id, s.sub, c.code,
         CAST(ROUND(SUM(CAST((s.x - c.x) * (s.x - c.x) AS DECIMAL(28,12))), 6)
              AS DOUBLE) AS d2
  FROM sub s JOIN seeds c ON c.sub = s.sub AND c.pos = s.pos
  GROUP BY s.vec_id, s.sub, c.code
), best AS (
  SELECT vec_id, sub, code, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2, code) AS rn
    FROM dist
  ) WHERE rn = 1
)
SELECT vec_id, sub, CAST(code AS BIGINT) AS code, d2
FROM best
""",
)
def vec_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding with seeded codebooks (NORTH: the
    ANN serving memory path — each 64-dim vector becomes {_PQ_SUBS}
    codes of log2({_PQ_CODES}) bits; the codebooks here are the first
    {_PQ_CODES} vectors' subvectors, deterministic by construction — the
    Lloyd-TRAINED variant is pinned by vec_kmeans_assign/vec_ann_ivf,
    this op pins the ENCODE semantics: per-subspace squared-distance
    argmin with a (d2, code) total order on decimal-identical distances,
    so ties need no margin). Emits one row per (vector, subspace) with
    the chosen code and its exact decimal d2 (Σ d2 over subspaces = the
    vector's reconstruction error).

    Shape at scale: the codebook is {_PQ_CODES}×64 floats — broadcast;
    distances are row-local per (vec, sub) after a posexplode
    partial-agg (map-side combined on (vec_id, sub, code)); the argmin
    window partitions on (vec_id, sub) — the same exchange the distance
    agg already produced. Never a pairwise term: O(N · subs · codes)."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("CAST((pos0) div 8 AS BIGINT)").alias("sub"),
        F.col("xf").cast("double").alias("x"),
    )
    seeds = ex.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= _PQ_CODES)
    ).select(
        F.col("vec_id").alias("code"), "sub", "pos", F.col("x").alias("cx")
    )
    diff = F.col("x") - F.col("cx")
    dist = (
        ex.join(F.broadcast(seeds), ["sub", "pos"])
        .select("vec_id", "sub", "code", (diff * diff).alias("sq"))
        .groupBy("vec_id", "sub", "code")
        .agg(
            F.round(F.sum(F.col("sq").cast(_DOT_DEC)), 6)
            .cast("double")
            .alias("d2")
        )
    )
    w = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", F.col("code").cast("long").alias("code"), "d2")
    )


def triangle_count_over(edges: DataFrame) -> DataFrame:
    """Ordered-two-join triangle count kernel over an undirected
    ``(label, lo, hi)`` edge frame (lo < hi, deduped): joins e(a,b)⋈e(b,c)
    ⋈e(a,c), counting each triangle exactly once via the lo<mid<hi
    orientation. Returns ``(label, n_triangles)`` (labels with none are
    absent — callers left-join and coalesce). Factored out of
    ``graph_knn_triangles`` so the property suite can drive it with
    arbitrary graphs against a brute-force reference."""
    e1 = edges.select(
        F.col("label").alias("l1"), F.col("lo").alias("a"), F.col("hi").alias("b")
    )
    e2 = edges.select(
        F.col("label").alias("l2"), F.col("lo").alias("b2"), F.col("hi").alias("c")
    )
    e3 = edges.select(
        F.col("label").alias("l3"), F.col("lo").alias("a3"), F.col("hi").alias("c3")
    )
    return (
        e1.join(e2, (F.col("l1") == F.col("l2")) & (F.col("b") == F.col("b2")))
        .join(
            e3,
            (F.col("l1") == F.col("l3"))
            & (F.col("a") == F.col("a3"))
            & (F.col("c") == F.col("c3")),
        )
        .groupBy(F.col("l1").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


# ---------------------------------------------------------------------------
# Fixed-block chunk dedup census (NORTH: storage-level dedup for
# multimodal payloads — how many bytes does block-level dedup reclaim)
# ---------------------------------------------------------------------------

_CHUNK_BYTES = 64


@query(
    "multimodal_chunk_dedup",
    oracle=f"""
WITH b AS (
  -- DuckDB v1.0 cannot slice BLOBs; for this ASCII-pinned corpus
  -- (tools/margin_audit.py) char slices of text ARE the byte slices of
  -- encode(text), so the twin chunks the VARCHAR directly
  SELECT doc_id, source, text FROM documents WHERE length(text) > 0
), c AS (
  SELECT b.source,
         md5(substring(b.text, {_CHUNK_BYTES} * i + 1, {_CHUNK_BYTES})) AS h
  FROM b, LATERAL (
    SELECT unnest(range((length(b.text) + {_CHUNK_BYTES - 1})
                        // {_CHUNK_BYTES})) AS i
  )
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
       CAST((COUNT(*) - COUNT(DISTINCT h)) * {_CHUNK_BYTES} AS BIGINT)
         AS bytes_dedupable
FROM c
GROUP BY source
""",
)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-block chunk-dedup census over binary payloads (NORTH: the
    storage-dedup question for a multimodal corpus — if blobs are split
    into {_CHUNK_BYTES}-byte blocks and stored content-addressed, how
    many bytes does each source reclaim). Blobs are chunked row-locally
    (codegen `sequence` explode + binary `substring`), each chunk
    reduced to its digest, and the per-source census runs as a
    distinct-agg on digests — BLOBS NEVER SHUFFLE, only 16-byte digests
    do (the multimodal_dedup_binary discipline at sub-file granularity).

    Oracle note: DuckDB v1.0 has no BLOB slicing or BLOB md5, so the
    twin chunks the VARCHAR text — char slices equal the byte slices of
    encode(text) for this corpus, whose ASCII-cleanliness is pinned by
    tools/margin_audit.py; Spark chunks and hashes the raw binary. Rolling-hash (CDC) chunking would shift
    boundaries under insertions — fixed-block is the deliberate,
    deterministic baseline (VDO-style)."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "source", F.encode("text", "utf-8").alias("blob")
    ).filter(F.octet_length("blob") > 0)
    n_chunks = F.expr(
        f"(octet_length(blob) + {_CHUNK_BYTES - 1}) div {_CHUNK_BYTES}"
    )
    c = b.select(
        "source",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "i"
        ),
        "blob",
    ).select(
        "source",
        F.md5(
            F.expr(
                f"substring(blob, i * {_CHUNK_BYTES} + 1, {_CHUNK_BYTES})"
            )
        ).alias("h"),
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.countDistinct("h").cast("long").alias("n_distinct"),
        (
            (F.count(F.lit(1)) - F.countDistinct("h")) * _CHUNK_BYTES
        ).cast("long").alias("bytes_dedupable"),
    )
