"""Public kernel facade — the engine's reusable building blocks.

The registry queries (``__spark_entry__.queries()``) bind these kernels to
the testdata tables for the correctness harness; THIS module is the
library surface for using them on your own DataFrames. Every kernel takes
a DataFrame with a documented column contract and returns a DataFrame
(except ``lttb_select``, a pure-Python list kernel), is deterministic,
and carries its scale shape in its docstring. All are covered by the
parity/property/plan suites.

Sequence analytics (input: ``user_id, ts, event_id, ...`` sample frames):

- ``counter_increase_by_key`` — reset-aware Prometheus ``increase()``
- ``interval_union_islands`` — gaps-and-islands uptime ledger
- ``dwell_by_type`` — per-state dwell-time accounting
- ``path_trigrams_over`` — ordered event-path mining
- ``flaps_by_source`` — A→B→A flap counting
- ``step_changepoint_over`` — regime-change argmax over an hourly series
- ``holt_fold_over`` — Holt level/trend forecasting fold
- ``ewma_fold_over`` — irregular-interval time-decay EWMA fold (libm-free)
- ``dratio``/``dec_scaled`` — exact half-away decimal-ratio rounding (boundary-proof)
- ``gini_over`` — traffic-concentration scoring

Scans / rollups:

- ``concurrency_over`` — distributed two-level prefix sum over a
  sweep-line delta frame (the global-running-total idiom)
- ``burn_rate_over`` / ``burn_windows_over`` — SRE multiwindow burn rate
- ``rolling_actives_over`` — DAU / rolling 7-day distinct actives
- ``lttb_select`` — exact-integer LTTB downsampling point selection

Corpus / dedup (input: ``doc_id, text`` document frames):

- ``exact_dedup_by_hash`` — SHA-256 exact dedup with deterministic keeper
- ``near_dup_minhash_pairs`` — MinHash-LSH verified near-dup pairs
- ``near_dup_simhash_pairs`` — SimHash banded near-dup pairs
- ``minhash_signatures`` — the signature stage alone
- ``connected_components`` — iterative min-label propagation (duplicate
  cluster resolution)

Vectors (input: ``vec_id, embedding[, label]`` frames):

- ``knn_cosine`` — exact top-k by decimal-stable cosine
- ``near_dup_cosine_pairs`` — blocked cosine near-dup pairs (sim ≥ 0.8)
- ``semantic_dedup_summary`` — SemDeDup k-means-blocked duplicate counts
- ``semantic_dup_pairs`` — SemDeDup pair-level edges (cos ≥ tau within
  cluster; the joined-modality dedup's vec edge source)
- ``semdedup_assignment`` — the clustering stage alone
  (signature: ``(spark, emb, ...)`` — it trains the cluster model)
- ``hamming_topk`` — binary-quantization (sign-signature popcount) top-k
  with exact decimal-cosine re-rank

Sketches / robust statistics:

- ``cms_counters`` / ``cms_point_estimates`` — relational count-min
  sketch: bounded-cardinality mergeable counters + min-row point query
- ``rolling_median_over`` — bounded-frame rolling lower median (pure
  order-statistic selection)
- ``ppl_tercile_buckets_over`` — CCNet perplexity-tercile bucketing via
  the two-level band-census quantile search (degenerate-shape behavior
  hypothesis-pinned)
- ``pagerank_over`` — PageRank iterated to tolerance (fixed-point LONG
  contributions, broadcast-guarded edge pass, checkpointed lineage; the
  production facade of the fixed-iteration registry op)

Index lifecycle (input: ``vec_id, embedding`` frames / ``doc_id, text``
document frames):

- ``route_to_centroids`` — argmax-dot cell routing against a fixed
  centroid model (one Arrow pass, zero shuffles; the IVF insert path);
  ``passthrough`` columns let one pass route several tagged populations
- ``index_drift_over`` — per-cell census drift between two routed
  populations with exact shares and an integer-exact drift flag
- ``index_drift_tagged`` — the fused one-frame variant: a ``pop``
  column labels the population, census is one conditional-count groupBy
- ``drift_from_census`` — the census→drift-table tail for callers that
  fold their own ``(cid, n_base, n_delta)`` counts (streaming monitors)
- ``minhash_band_rows`` — (doc_id, band_idx, band_hash) LSH index rows
  for a document frame (signature + banding, zero shuffles — the rows a
  standing dedup index stores and a delta merge appends)
- ``verify_band_candidates`` — bucket-join two band-row frames and
  verify candidates by exact shingle Jaccard (the merge/fold pair
  discovery stage, O(|probe| + matches))

Planning / integrity audits (arbitrary frames):

- ``ri_edge_audit`` — one FK edge's orphan census (child cardinality,
  NULL keys, orphans, exact orphan share) over arbitrary child/parent
  frames — the between-tables contract check
"""

from __future__ import annotations

from .functions.stable import dec_scaled, dec_scaled_sql, dratio, dratio_sql
from .operators.aggregations import approx_distinct_estimates, weighted_median_over
from .operators.corpus import (
    connected_components,
    semantic_dedup_summary,
    semantic_dup_pairs,
    semdedup_assignment,
)
from .operators.extras import approx_quantile_estimates
from .operators.surface import hll_sketch_estimates
from .streaming.windows import stream_distinct_estimates
from .operators.vectors import (
    knn_cosine,
    mmr_diversify_over,
    near_dup_cosine_pairs,
    triangle_count_over,
)
from .operators.text import (
    exact_dedup_by_hash,
    minhash_signatures,
    near_dup_minhash_pairs,
    near_dup_simhash_pairs,
)
from .operators.events_analytics import (
    counter_increase_by_key,
    ewma_fold_over,
    gini_over,
    holt_fold_over,
    interval_union_islands,
    step_changepoint_over,
)
from .operators.scale_probes import replicate_rows, scoped_confs
from .operators.extensions3 import pagerank_over
from .operators.extensions6 import minhash_band_rows, verify_band_candidates
from .operators.extensions7 import (
    drift_from_census,
    index_drift_over,
    index_drift_tagged,
    route_to_centroids,
    route_to_centroids_codegen,
)
from .operators.extensions5 import (
    cms_counters,
    cms_point_estimates,
    hamming_topk,
    ppl_tercile_buckets_over,
    rolling_median_over,
)
from .operators.extensions11 import ri_edge_audit
from .operators.extensions4 import (
    _lttb_select as lttb_select,
    burn_rate_over,
    burn_windows_over,
    concurrency_over,
    dwell_by_type,
    flaps_by_source,
    path_trigrams_over,
    rolling_actives_over,
)

__all__ = [
    "approx_distinct_estimates",
    "approx_quantile_estimates",
    "burn_rate_over",
    "burn_windows_over",
    "cms_counters",
    "cms_point_estimates",
    "concurrency_over",
    "connected_components",
    "counter_increase_by_key",
    "dec_scaled",
    "dec_scaled_sql",
    "dratio",
    "dratio_sql",
    "drift_from_census",
    "dwell_by_type",
    "ewma_fold_over",
    "exact_dedup_by_hash",
    "flaps_by_source",
    "gini_over",
    "hamming_topk",
    "hll_sketch_estimates",
    "holt_fold_over",
    "index_drift_over",
    "index_drift_tagged",
    "interval_union_islands",
    "knn_cosine",
    "lttb_select",
    "minhash_band_rows",
    "minhash_signatures",
    "mmr_diversify_over",
    "near_dup_cosine_pairs",
    "near_dup_minhash_pairs",
    "near_dup_simhash_pairs",
    "pagerank_over",
    "path_trigrams_over",
    "ppl_tercile_buckets_over",
    "replicate_rows",
    "ri_edge_audit",
    "rolling_actives_over",
    "rolling_median_over",
    "route_to_centroids",
    "route_to_centroids_codegen",
    "scoped_confs",
    "semantic_dedup_summary",
    "semantic_dup_pairs",
    "semdedup_assignment",
    "step_changepoint_over",
    "stream_distinct_estimates",
    "triangle_count_over",
    "verify_band_candidates",
    "weighted_median_over",
]
