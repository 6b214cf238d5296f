"""§2.W operator verification (staged in r10, REGISTERED in r11).

Each §2.W op runs the exact same vanilla-shaped check the driver applies:
Spark result vs its DuckDB oracle, column names + row count + canonical
values. These tests predate the registration (they were the first half
of the registration gate) and stay as the module-local parity+property
suite; the registry-wide sweeps now cover the two batch ops too, while
``stream_ann_serve``'s per-batch shape is pinned here (it is excluded
from the batch plan sweeps like every streaming-drain op).
"""

from __future__ import annotations

import pytest

from tests.parity import canon_rows, run_oracle, run_spark

SF = "/root/testdata/sf0.01"


def _assert_staged_parity(fn, oracle_sql: str, spark, sf_dir: str = SF):
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_multimodal_joined_dedup_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions6 import (
        multimodal_joined_dedup,
        multimodal_joined_dedup_oracle,
    )

    _assert_staged_parity(
        multimodal_joined_dedup, multimodal_joined_dedup_oracle(), spark
    )


def test_joined_dedup_components_refine_both_modalities(spark):
    """The union-edge components must be a COARSENING of each single
    modality's components (every text-only or vec-only duplicate pair
    stays together), and doc_id ≡ vec_id (the §2.W contract) must hold."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.corpus import (
        text_dedup_components,
    )
    from storm_netmonitor_spark.operators.extensions6 import (
        multimodal_joined_dedup,
    )

    d = load_table(spark, SF, "documents").select("doc_id")
    e = load_table(spark, SF, "embeddings").select("vec_id")
    assert d.join(e, d.doc_id == e.vec_id).count() == d.count() == e.count()

    joined = {
        r["doc_id"]: r["component"]
        for r in multimodal_joined_dedup(spark, SF).collect()
    }
    text_only = {
        r["doc_id"]: r["component"]
        for r in text_dedup_components(spark, SF).collect()
    }
    assert set(joined) == set(text_only)
    # same text component => same joined component (coarsening)
    by_text: dict = {}
    for doc, comp in text_only.items():
        by_text.setdefault(comp, set()).add(joined[doc])
    assert all(len(v) == 1 for v in by_text.values())
    # and the joined clustering is at least as coarse
    assert len(set(joined.values())) <= len(set(text_only.values()))


def test_stream_ann_serve_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions6 import (
        stream_ann_serve,
        stream_ann_serve_oracle,
    )

    _assert_staged_parity(stream_ann_serve, stream_ann_serve_oracle(), spark)


def test_stream_ann_serve_agrees_with_registered_op(spark):
    """qid 0 is the registered op's canonical query: its served top-10
    must equal vec_ann_ivf's output row-for-row (one index semantics,
    two consumers), and every query's probe choice must carry a healthy
    margin (the float-vs-SQL-double accumulation difference is ~1e-13;
    demand 6 orders of magnitude)."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators.extensions6 import (
        IVF_NPROBE,
        STREAM_ANN_QUERY_IDS,
        stream_ann_serve,
    )
    from storm_netmonitor_spark.operators.vectors import (
        ivf_index,
        vec_ann_ivf,
    )
    from storm_netmonitor_spark.io import load_table

    served = stream_ann_serve(spark, SF)
    q0 = sorted(
        (r["vec_id"], r["cos_sim"])
        for r in served.filter(F.col("qid") == 0).collect()
    )
    reg = sorted(
        (r["vec_id"], r["cos_sim"]) for r in vec_ann_ivf(spark, SF).collect()
    )
    assert q0 == reg

    _, cents = ivf_index(spark, SF)
    e = load_table(spark, SF, "embeddings")
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in e.filter(
            F.col("vec_id").isin(*STREAM_ANN_QUERY_IDS)
        ).collect()
    }
    for qid, qvec in qvecs.items():
        dots = sorted(
            (sum(c[i] * qvec[i] for i in range(len(qvec))) for c in cents),
            reverse=True,
        )
        margin = dots[IVF_NPROBE - 1] - dots[IVF_NPROBE]
        assert margin > 1e-7, f"probe margin too tight for qid {qid}: {margin}"


def test_text_minhash_index_merge_matches_oracle(spark):
    from storm_netmonitor_spark.operators.extensions6 import (
        text_minhash_index_merge,
        text_minhash_index_merge_oracle,
    )

    _assert_staged_parity(
        text_minhash_index_merge, text_minhash_index_merge_oracle(), spark
    )


def test_index_merge_equals_full_rerun_delta(spark):
    """Incrementality contract: the merge's newly-discovered pairs must be
    EXACTLY the registered full op's pairs restricted to those touching
    the delta (doc_b >= split) — nothing lost by skipping the
    standing×standing term, nothing invented by the band-bucket join."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import load_table
    from storm_netmonitor_spark.operators.extensions6 import (
        _MERGE_SPLIT_DEN,
        _MERGE_SPLIT_NUM,
        text_minhash_index_merge,
    )
    from storm_netmonitor_spark.operators.text import text_near_dedup_minhash

    d = load_table(spark, SF, "documents")
    max_id = d.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    split = (int(max_id) + 1) * _MERGE_SPLIT_NUM // _MERGE_SPLIT_DEN

    merged = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in text_minhash_index_merge(spark, SF).collect()
    )
    full_delta = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in text_near_dedup_minhash(spark, SF)
        .filter(F.col("doc_b") >= split)
        .collect()
    )
    assert merged == full_delta and len(merged) > 0


def test_staged_plan_shapes(spark):
    """The staged candidates escape the registry-wide plan sweeps until
    they register (r11) — pin their scale shapes here: no cartesian
    product anywhere, and the merge's candidate join keys on the band
    bucket (an equi-join, broadcast or shuffled — never nested-loop)."""
    from storm_netmonitor_spark.operators.extensions6 import (
        multimodal_joined_dedup,
        text_minhash_index_merge,
    )
    from tests.test_plans import plan

    merge_plan = plan(text_minhash_index_merge(spark, SF), mode="simple")
    assert "CartesianProduct" not in merge_plan
    assert "BroadcastNestedLoopJoin" not in merge_plan

    joined_plan = plan(multimodal_joined_dedup(spark, SF), mode="simple")
    assert "CartesianProduct" not in joined_plan
    assert "BroadcastNestedLoopJoin" not in joined_plan


def test_disk_artifact_frame_roundtrip_is_bit_exact(spark, tmp_path, monkeypatch):
    """Doubles and longs must survive the parquet publish+read bit-exactly
    — the property every artifact-served op's hash stability rests on."""
    import math
    import os as _os

    from pyspark.sql import functions as F

    from storm_netmonitor_spark.io import disk_artifact_frame

    monkeypatch.setenv("NM_ARTIFACT_DIR", str(tmp_path / "store"))
    d = str(tmp_path / "in")
    _os.makedirs(d)
    with open(_os.path.join(d, "x.parquet"), "wb") as fh:
        fh.write(b"fingerprint-source")

    vals = [
        (1, 0.1), (2, 2.0 / 3.0), (3, 1e-300), (4, -0.0),
        (5, math.pi), (6, float("inf")), (7, 6.02214076e23),
    ]

    def build():
        return spark.createDataFrame(vals, "k long, v double")

    out1 = disk_artifact_frame(spark, "rt", "v1", d, build)
    got = sorted((r["k"], r["v"]) for r in out1.collect())
    assert got == sorted(vals)  # Python float == is bitwise for finite reprs
    # -0.0 sign must survive too (== can't see it)
    neg = [v for k, v in got if k == 4][0]
    assert math.copysign(1.0, neg) == -1.0
    # second read serves the published copy (builder not re-run)
    out2 = disk_artifact_frame(
        spark, "rt", "v1", d,
        lambda: (_ for _ in ()).throw(AssertionError("re-built")),
    )
    assert sorted((r["k"], r["v"]) for r in out2.collect()) == got


def test_serve_plan_size_independent_of_batch(spark):
    """VERDICT r11 hygiene gate: the serving batch plan must not embed
    query vectors as literals — its analyzed-plan text must stay the
    same size whether the batch holds 2 queries or 64 (the old
    map_from_arrays-of-literals shape grew O(batch × dim)), and the
    probe routing must be the executor-side mapInPandas pass, not a
    driver loop feeding a literal frame."""
    from pyspark.sql import functions as F

    from storm_netmonitor_spark.operators.extensions6 import (
        _ivf_cells,
        serve_topk_plan,
    )
    from storm_netmonitor_spark.operators.vectors import ivf_index

    corpus, cents = ivf_index(spark, SF)
    cells = _ivf_cells(spark, SF)

    def qframe(n):
        base = corpus.limit(n)
        return base.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )

    plans = {}
    for n in (2, 64):
        plan = serve_topk_plan(cells, corpus, cents, qframe(n))
        txt = plan._jdf.queryExecution().analyzed().toString()
        assert "map_from_arrays" not in txt
        plans[n] = len(txt)
    # limit(2) vs limit(64) differ by a couple of digits at most; any
    # per-element literal rendering would add thousands of chars
    assert abs(plans[64] - plans[2]) < 64, plans
    # executor-side routing: the probe stage is a mapInPandas node
    txt = (
        serve_topk_plan(cells, corpus, cents, qframe(2))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "mapInPandas" in txt or "MapInPandas" in txt
