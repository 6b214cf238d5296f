"""Round-15 candidate operators, fifth batch, PRE-STAGED (SURVEY
§2.AP; the staging discipline of the §2.W–§2.AO batches applied
forward).

NOTHING in this module is registered: the registry closed the round-14
registrations at 327, so there is no ``@query`` decorator here — each
candidate ships as a plain callable plus a module-level oracle builder,
wired into ``tests/test_extensions25_staged.py``.

Capability anchor: SURVEY §2.AP — GRAPH HYGIENE & RELATIONAL PROFILE.
The graph family is the registry's thinnest (pagerank, LPA
communities, knn triangles); what a graph owner reads BEFORE running
any of those is the graph's own census — the degree distribution
(skew, orphans, hubs) and the k-core skeleton (how much of the graph
survives peeling — the denoising cut community detection stands on).
And the relational twin of that pre-read is the per-column profile
census every ingest audit starts from:

- ``graph_degree_census`` — the per-side degree histogram of the
  link graph (the pagerank edge set): for each side and degree, how
  many nodes — the skew/hub/orphan read in one census;
- ``graph_kcore_decompose`` — unrolled k-core peeling: per round,
  how many nodes fall and what survives (nodes + undirected edges) —
  the cascade census that prices a core-filtered downstream;
- ``quality_column_profile`` — the per-column (rows, nulls,
  null-ppm, distinct) census of a relational table in ONE pass —
  the schema-level profile the §2.AF/§2.AK stream gates assume was
  taken of the standing corpus.

All decision arithmetic is integers (degrees, node/edge counts, null
and distinct counts); shares are dratio rationals on emitted values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dratio, dratio_sql
from ..io import load_table

#: The link graph shared with ``graph_pagerank_links``: the DISTINCT
#: part→supplier supply edges ('p'-nodes → 's'-nodes).
_EDGES_SQL = """
  SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
  FROM lineitem
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()


# ---------------------------------------------------------------------------
# graph_degree_census — per-side degree histogram
# ---------------------------------------------------------------------------


def graph_degree_census_oracle() -> str:
    share = dratio_sql("n_nodes * 1000000", "st.t")
    return f"""
WITH e AS ({_EDGES_SQL}),
deg AS (
  SELECT 'src' AS side, src AS node, COUNT(*) AS degree
  FROM e GROUP BY src
  UNION ALL
  SELECT 'dst' AS side, dst AS node, COUNT(*) AS degree
  FROM e GROUP BY dst
), census AS (
  SELECT side, degree, COUNT(*) AS n_nodes
  FROM deg GROUP BY side, degree
), st AS (
  SELECT side, SUM(n_nodes) AS t FROM census GROUP BY side
)
SELECT census.side, CAST(degree AS BIGINT) AS degree,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       {share} AS node_share_pct
FROM census JOIN st ON st.side = census.side
"""


def degree_census_over(edges: DataFrame) -> DataFrame:
    """KERNEL — the per-side degree histogram over any (src, dst)
    edge frame. Factored out of :func:`graph_degree_census` so the
    staged suite can plant a star graph (one hub, many leaves) and
    assert the histogram reads it."""
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("src").alias("side"), "degree")
        .unionByName(
            edges.groupBy(F.col("dst").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .select(F.lit("dst").alias("side"), "degree")
        )
    )
    census = deg.groupBy("side", "degree").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    st = census.groupBy("side").agg(F.sum("n_nodes").alias("t"))
    return census.join(F.broadcast(st), "side").select(
        "side",
        F.col("degree").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        dratio(F.col("n_nodes") * 1_000_000, F.col("t")).alias(
            "node_share_pct"
        ),
    )


def graph_degree_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution census of the link graph (SURVEY §2.AP):
    per side (parts = src, suppliers = dst) and degree, how many
    nodes — the one-census read of skew, hubs, and orphan risk an
    owner takes before pagerank/LPA/core filtering runs.

    Shape at scale: two keyed map-side-combining degree folds (the
    exchange carries node-count partials, never edges), one
    (side, degree)-keyed census fold over the degree table, side
    totals from the CENSUS (census-sized) attached broadcast."""
    return degree_census_over(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# graph_kcore_decompose — unrolled peeling census
# ---------------------------------------------------------------------------

#: Core threshold and unrolled peel rounds. k sits inside the part-side
#: degree band (13..41 at the test SFs) so the cascade is non-trivial;
#: rounds past the fixpoint legitimately report zero removals (the
#: census says "converged", it does not stop early — both engines
#: unroll the same fixed depth).
_KCORE_K = 30
_KCORE_ROUNDS = 4
#: localCheckpoint cadence for the Spark peeling loop (the pagerank
#: round precedent — truncate lineage, keep the loop plan-sized).
_KCORE_CKPT_EVERY = 2


def graph_kcore_decompose_oracle() -> str:
    # undirected rendering: each bipartite edge contributes both
    # directions; degrees read over the direction-doubled list, the
    # surviving-edge count divides the doubled census by two.
    parts = [f"""
u0 AS (
  SELECT src AS a, dst AS b FROM e
  UNION ALL
  SELECT dst AS a, src AS b FROM e
)"""]
    rows = []
    prev = "u0"
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f"""
d{r} AS (
  SELECT a, COUNT(*) AS deg FROM {prev} GROUP BY a
), rm{r} AS (
  SELECT a FROM d{r} WHERE deg < {_KCORE_K}
), u{r} AS (
  SELECT u.a, u.b FROM {prev} u
  WHERE u.a NOT IN (SELECT a FROM rm{r})
    AND u.b NOT IN (SELECT a FROM rm{r})
)""")
        rows.append(
            f"SELECT {r} AS round,"
            f" (SELECT COUNT(*) FROM rm{r}) AS n_removed,"
            f" (SELECT COUNT(DISTINCT a) FROM u{r}) AS n_nodes,"
            f" (SELECT COUNT(*) FROM u{r}) // 2 AS n_edges"
        )
        prev = f"u{r}"
    body = ",".join(parts)
    union = " UNION ALL ".join(rows)
    return f"""
WITH e AS ({_EDGES_SQL}),{body}
SELECT CAST(round AS BIGINT) AS round,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges
FROM ({union})
"""


def kcore_rounds_over(
    edges: DataFrame, k: int, rounds: int
) -> list[tuple[int, int, int, int]]:
    """KERNEL — the peeling cascade over any (src, dst) bipartite
    edge frame: per round (round, n_removed, n_nodes, n_edges of the
    survivor graph, undirected counts). Factored out of
    :func:`graph_kcore_decompose` so the staged suite can plant a
    chain-plus-clique graph with a hand-traceable cascade.

    Each round is ONE degree fold + one anti-join pair; lineage is
    truncated every {_KCORE_CKPT_EVERY} rounds (the pagerank cadence).
    The per-round driver fetch is the 3-integer census row — the
    model-scalar class, never nodes or edges."""
    u = edges.selectExpr("src AS a", "dst AS b").unionByName(
        edges.selectExpr("dst AS a", "src AS b")
    )
    out = []
    for r in range(1, rounds + 1):
        # the degree census is NODE-sized — checkpoint it so the
        # edge-set fold runs ONCE per round (both the removal count
        # and the anti-join consume it; without the barrier each
        # driver action re-executes the fold over the edges)
        deg = (
            u.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint()
        )
        rm = deg.filter(F.col("deg") < k).select("a")
        u = (
            u.join(rm, "a", "left_anti")
            .join(rm.withColumnRenamed("a", "b"), "b", "left_anti")
            .select("a", "b")
        )
        if r % _KCORE_CKPT_EVERY == 0:
            u = u.localCheckpoint()
        stats = u.agg(
            F.countDistinct("a").alias("n_nodes"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        ).collect()[0]
        n_removed = rm.count()
        out.append(
            (r, int(n_removed), int(stats["n_nodes"]), int(stats["n_edges"]))
        )
    return out


def graph_kcore_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling census (SURVEY §2.AP): {_KCORE_ROUNDS} unrolled
    rounds of "remove every node with degree < {_KCORE_K}" over the
    undirected link graph, reporting per round how many nodes fell
    and what survives (nodes + undirected edges). Rounds past the
    fixpoint report zero removals — the census SHOWS convergence
    instead of stopping early, so both engines compute the same fixed
    depth. The surviving core is the denoised skeleton community
    detection and embedding propagation should run on.

    Shape at scale: per round one degree fold (map-side-combined) +
    two anti-joins on the node key; lineage truncated on the pagerank
    checkpoint cadence; the driver sees only 3-integer census rows
    per round (the model-scalar collect class, audited)."""
    from ..io import tiny_local_frame

    rows = kcore_rounds_over(_edges(spark, sf_dir), _KCORE_K, _KCORE_ROUNDS)
    return tiny_local_frame(
        spark,
        rows,
        "round long, n_removed long, n_nodes long, n_edges long",
    )


# ---------------------------------------------------------------------------
# quality_column_profile — one-pass per-column profile census
# ---------------------------------------------------------------------------

#: The profiled table and its column contract (a constant of the op —
#: the profile is a SCHEMA-level census, so the column list is the
#: schema, not data).
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def quality_column_profile_oracle() -> str:
    null_ppm = dratio_sql("n_nulls * 1000000", "n_rows")
    selects = " UNION ALL ".join(
        f"""SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct
FROM orders"""
        for c in _PROFILE_COLS
    )
    return f"""
SELECT column_name,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       {null_ppm} AS null_ppm,
       CAST(n_distinct AS BIGINT) AS n_distinct
FROM ({selects})
"""


def column_profile_over(df: DataFrame, cols) -> DataFrame:
    """KERNEL — the per-column profile census of any frame in ONE
    aggregation pass (no per-column scan): a single agg computes
    count/non-null/distinct for every column, then a stack unpivots
    the 1×(3·C) row into the C-row census. Factored out of
    :func:`quality_column_profile` so the staged suite can plant
    nulls and duplicates with hand-checkable counts."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    long = one.selectExpr(
        "__rows",
        f"stack({len(cols)}, {stack}) AS (column_name, n_nonnull, n_distinct)",
    )
    return long.select(
        "column_name",
        F.col("__rows").cast("long").alias("n_rows"),
        (F.col("__rows") - F.col("n_nonnull")).cast("long").alias("n_nulls"),
        dratio(
            (F.col("__rows") - F.col("n_nonnull")) * 1_000_000,
            F.col("__rows"),
        ).alias("null_ppm"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile census of ``orders`` (SURVEY §2.AP): for
    every column of the schema contract, row/null/distinct counts and
    the null ppm — the one-pass schema-level profile every ingest
    audit starts from (and the standing-corpus read the §2.AF/§2.AK
    gates implicitly assume exists).

    Shape at scale: ONE aggregation pass over the table computes all
    3·C measures with map-side partial aggregation (multiple
    count-distincts expand to a single multi-distinct Expand plan —
    C-way, schema-bounded, not data-bounded); the stack unpivot runs
    on the single result row. No per-column rescans."""
    return column_profile_over(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )
