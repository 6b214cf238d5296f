"""Round-11 candidate operators, PRE-STAGED (SURVEY §2.W; VERDICT r9 #7).

NOTHING in this module is registered: the registry is frozen at 282 for
round 10, so there is no ``@query`` decorator here — each candidate ships
as a plain callable plus a module-level oracle builder, wired into
``tests/test_extensions6_staged.py`` for the same vanilla-session +
DuckDB-hash verification the driver will run once they ARE registered in
round 11. Registration then is a 3-line diff per op.

Capability anchor: SURVEY §2.W (the three proposed ops compose EXISTING
audited kernels — the IVF router, the banded/shingled pair CTEs, the
SemDeDup clustering, connected components — into the serving/incremental/
joined-modality shapes a production corpus pipeline runs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import disk_artifact_frame, load_table, session_memo
from .corpus import (
    SEMDEDUP_CLUSTER_TARGET,
    SEMDEDUP_ITERS,
    SEMDEDUP_K_MIN,
    SEMDEDUP_TAU,
    _symmetrized,
    connected_components,
    semantic_dup_pairs,
)
from .text import NGRAM_JACCARD_MIN, NGRAM_PAIRS_CTE, text_ngram_jaccard


# ---------------------------------------------------------------------------
# multimodal_joined_dedup — documents and their embeddings vote together
# ---------------------------------------------------------------------------


def _sd_pairs_ctes() -> str:
    """The SemDeDup chain from ``corpus._semdedup_oracle`` re-emitted with
    an ``sd_`` prefix (the unprefixed chain's ``sizes`` collides with
    ``NGRAM_PAIRS_CTE``'s) and a PAIR tail instead of the census tail:
    ``sd_pairs(doc_a, doc_b)`` = within-cluster pairs with decimal cosine
    ≥ tau. Same Lloyd rounds, same seeds, same assignment tie-breaks —
    one clustering semantics, two consumers."""
    head = f"""sd_kk AS MATERIALIZED (
  SELECT GREATEST({SEMDEDUP_K_MIN}, COUNT(*) // {SEMDEDUP_CLUSTER_TARGET}) AS k
  FROM embeddings
), sd_e AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), sd_c0 AS MATERIALIZED (
  SELECT vec_id - 1 AS cid, pos, x AS cx FROM sd_e
  WHERE vec_id BETWEEN 1 AND (SELECT k FROM sd_kk)
)"""
    rounds = []
    for i in range(SEMDEDUP_ITERS):
        rounds.append(f""", sd_a{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT t.vec_id, t.cid,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY t.dot DESC, t.cid) AS rn
    FROM (SELECT sd_e.vec_id, c.cid, SUM(sd_e.x * c.cx) AS dot
          FROM sd_e JOIN sd_c{i} c USING (pos) GROUP BY 1, 2) t
  ) WHERE rn = 1
), sd_m{i} AS MATERIALIZED (
  SELECT a.cid, sd_e.pos, SUM(sd_e.x) / COUNT(*) AS mx
  FROM sd_e JOIN sd_a{i} a USING (vec_id) GROUP BY 1, 2
), sd_n{i} AS MATERIALIZED (
  SELECT cid, sqrt(SUM(mx * mx)) AS nrm FROM sd_m{i} GROUP BY 1
), sd_c{i + 1} AS MATERIALIZED (
  SELECT c.cid, c.pos,
         COALESCE(m.mx / (CASE WHEN n.nrm = 0 THEN 1.0 ELSE n.nrm END),
                  c.cx) AS cx
  FROM sd_c{i} c
  LEFT JOIN sd_m{i} m ON m.cid = c.cid AND m.pos = c.pos
  LEFT JOIN sd_n{i} n ON n.cid = c.cid
)""")
    n_fin = SEMDEDUP_ITERS
    tail = f""", sd_afin AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT t.vec_id, t.cid,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY t.dot DESC, t.cid) AS rn
    FROM (SELECT sd_e.vec_id, c.cid, SUM(sd_e.x * c.cx) AS dot
          FROM sd_e JOIN sd_c{n_fin} c USING (pos) GROUP BY 1, 2) t
  ) WHERE rn = 1
), sd_pairs AS MATERIALIZED (
  SELECT a.vec_id AS doc_a, a2.vec_id AS doc_b
  FROM sd_afin a
  JOIN sd_afin a2 ON a.cid = a2.cid AND a.vec_id < a2.vec_id
  JOIN sd_e ea ON ea.vec_id = a.vec_id
  JOIN sd_e eb ON eb.vec_id = a2.vec_id AND eb.pos = ea.pos
  GROUP BY 1, 2
  HAVING SUM(CAST(ea.x * eb.x AS DECIMAL(28,12))) >= {SEMDEDUP_TAU}
)"""
    return head + "".join(rounds) + tail


def multimodal_joined_dedup_oracle() -> str:
    """Both pair definitions verbatim from their registered twins
    (``NGRAM_PAIRS_CTE`` + the prefixed SemDeDup chain), unioned, then
    components via the ``text_dedup_components`` recursive-CTE
    precedent."""
    return f"""
WITH RECURSIVE {NGRAM_PAIRS_CTE}, tsim AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
        >= {NGRAM_JACCARD_MIN}
), {_sd_pairs_ctes()}, allp AS (
  SELECT doc_a, doc_b FROM tsim
  UNION
  SELECT doc_a, doc_b FROM sd_pairs
), bi AS (
  SELECT doc_a AS s, doc_b AS d FROM allp
  UNION ALL
  SELECT doc_b, doc_a FROM allp
), reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT b.d, r.lbl FROM reach r JOIN bi b ON b.s = r.node
)
SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component
FROM reach GROUP BY node
"""


def multimodal_joined_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joined-modality dedup (SURVEY §2.W): a pair is duplicate iff its
    TEXT is near-duplicate (word-3-gram Jaccard ≥ {NGRAM_JACCARD_MIN},
    the ``text_ngram_jaccard`` definition) OR its EMBEDDING is
    near-duplicate (within-SemDeDup-cluster cosine ≥ {SEMDEDUP_TAU});
    components elected over the UNION edge set so a doc caught by either
    modality lands in the same cluster as its twins. doc_id ≡ vec_id by
    the testdata contract (1:1, verified in
    tests/test_extensions6_staged.py).

    Shape at scale: BOTH edge lists already exist as bounded pipelines —
    the df-capped blocked shingle join and the cluster-blocked BLAS pair
    scan — so the union adds no new pairwise term anywhere; the combined
    symmetric edge frame stages to the cross-process artifact store like
    ``dedup_edges``, and component resolution is the standard
    min-label-propagation loop on that sparse frame."""
    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def build_edges() -> DataFrame:
        text_edges = text_ngram_jaccard(spark, sf_dir).select(
            "doc_a", "doc_b"
        )
        vec_edges = semantic_dup_pairs(
            spark, emb, cache_key=os.path.abspath(sf_dir)
        ).select(
            F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b")
        )
        return _symmetrized(text_edges.unionByName(vec_edges).distinct())

    bi = session_memo(
        spark,
        ("joined_dedup_edges", os.path.abspath(sf_dir)),
        lambda: disk_artifact_frame(
            spark, "joined_dedup_edges", "v1", sf_dir, build_edges
        ),
        sf_dir=sf_dir,
    )
    return connected_components(d.select("doc_id"), bi, pre_symmetrized=True)
