"""Driver-gate query registry, split per lane.

Each lane module exports ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLES`` (name -> DuckDB SQL).  :func:`all_queries` /
:func:`all_oracles` merge the lanes and apply the driver-window rotation.

Rotation policy: the driver's correctness gate only runs the FIRST 50
entries of ``queries()``, so the order rotates per round — flagship (slot
1, always), then last round's reds (so the driver confirms their fixes),
then this round's new queries, then least-recently-driver-verified, then
the most-recently-green tail.  The union of CORRECTNESS_r01..r03 covers
all pre-r4 queries; tools/check_oracle.py (a strict local replica of the
driver compare, including signed-zero hashing) sweeps the full registry
between rounds.
"""

from __future__ import annotations

from . import core, extended, io_misc, parity, streaming, training

_LANES = (core, training, parity, streaming, io_misc, extended)

# Round-4 window (per VERDICT.md r3 "Next round" #3): flagship first, then
# the three round-3 reds so the driver confirms their fixes
# (streaming_sessions: NTZ cast; resample_mercator / vector_reproject:
# signed-zero hash normalization), then queries never checked after r1, then
# new round-4 queries, then the r2/r3-green tail (least-recently-verified
# first as space allows).
_R3_REDS = ["streaming_sessions", "resample_mercator", "vector_reproject"]

# Verified in r1 only — least recently checked of the verified set.
_R1_ONLY = [
    "multimodal_features", "streaming_daily_sum", "reduce_any",
    "reduce_count_condition", "filter_spatial", "mask_polygon",
    "apply_polygon", "trim_cube", "order_argsort",
]

# New queries added in round 4 (never driver-verified by construction).
_NEW_R4: list[str] = [
    "dedup_clusters_star", "segment_dedup", "decontaminate",
    "streaming_dedup_static", "zorder_roundtrip", "tfidf_top_terms",
    "random_projection", "load_raster_tiles", "logreg_quality",
    "subsequence_topk", "multimodal_dedup",
]

# r2-green queries, in r2-window order — least recently confirmed tail.
_R2_GREEN = [
    "filter_temporal", "reduce_mean_over_time", "aggregate_dekad",
    "merge_multiply", "mask_high_discount", "cumsum", "interpolate_gaps",
    "dedup_exact", "minhash_near_dups", "simhash_near_dups", "text_quality",
    "cosine_topk", "ndvi_events", "apply_scale_clip", "resample_asof",
    "aggregate_spatial_zonal", "filter_bands", "filter_bbox",
    "filter_labels_text", "add_drop_dimension", "reduce_first",
    "reduce_product", "reduce_variance", "reduce_spatial_sum",
    "sort_along_dim", "date_ops", "fit_curve_linear", "random_forest",
    "run_udf_plus1", "kmeans_clusters", "lsh_topk", "pq_topk",
    "embedding_near_dups", "ngram_jaccard", "dedup_incremental",
    "gopher_filter", "repetition_stats", "language_id", "token_count",
    "sample_stratified", "split_assign", "cap_per_source", "pack_contiguous",
    "training_pipeline", "apply_dimension_center", "apply_kernel_grid",
    "aggregate_temporal_halves", "aggregate_week_median", "vector_buffer",
    "process_graph",
]

_PRIORITY = (
    ["flagship_daily_mean"]
    + _R3_REDS
    + _NEW_R4
    + _R1_ONLY
    + _R2_GREEN
)


def _merged(attr: str) -> dict:
    base: dict = {}
    for lane in _LANES:
        base.update(getattr(lane, attr))
    ordered = {k: base[k] for k in _PRIORITY if k in base}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered


def all_queries() -> dict:
    return _merged("QUERIES")


#: builder-function -> SQL memo, so repeated all_oracles() calls don't
#: re-run the expensive replay builders (RF retrain, logreg GD replay)
_ORACLE_MEMO: dict = {}


def all_oracles() -> dict:
    """ORACLES values may be SQL strings or zero-arg callables returning
    SQL (ADVICE r04: the replay builders read ORACLE_SF_DIR parquet and
    retrain models — resolving them HERE instead of at module import keeps
    ``import openeo_processes_dask_spark.gates`` working on machines
    without the fixture data)."""
    out = {}
    for k, v in _merged("ORACLES").items():
        if callable(v):
            if v not in _ORACLE_MEMO:
                _ORACLE_MEMO[v] = v()
            v = _ORACLE_MEMO[v]
        out[k] = v
    return out
