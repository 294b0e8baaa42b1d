"""Driver-gate query registry, split per lane.

Each lane module exports ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLES`` (name -> DuckDB SQL).  :func:`all_queries` /
:func:`all_oracles` merge the lanes and apply the driver-window rotation.

Rotation policy (round 3, per VERDICT.md "What's wrong" #1): the driver's
correctness gate only runs the FIRST 50 entries of ``queries()``.  Round 2
left 46 registry entries with no driver row ever, and ``process_graph``
(round 1's sole FAIL, fixed in d5008b7) rotated out before the driver could
confirm the fix.  So the order is now: flagship (slot 1, always), then
``process_graph``, then every never-driver-verified query, then this round's
new queries, then least-recently-verified (r1-only), then the r2-green tail.
Future rounds should keep rotating: move freshly driver-verified names to
the back, never-verified names to the front.
"""

from __future__ import annotations

from . import core, extended, io_misc, parity, streaming, training

_LANES = (core, training, parity, streaming, io_misc, extended)

# Driver-verified in neither CORRECTNESS_r01 nor r02 (46 entries).
_NEVER_DRIVER_VERIFIED = [
    "streaming_dedup", "streaming_sliding_sum", "save_load_roundtrip",
    "resample_cubic", "reduce_quantiles", "resample_cubicspline",
    "resample_gauss", "apply_neighborhood_2d", "apply_neighborhood_2d_mean",
    "resample_lanczos", "resample_mode", "resample_rms", "load_url_geojson",
    "rearrange", "resample_spatial_grid", "resample_cube_spatial_coarse",
    "resample_cube_spatial_near", "rename_labels_enumerated",
    "apply_neighborhood_mean", "cummax", "rename_labels_dim",
    "dimension_labels", "predict_curve_linear", "array_ops", "ddmc",
    "text_ops", "rqa_trend", "streaming_sessions", "resample_mercator",
    "multimodal_av", "multimodal_resize", "load_stac_catalog", "crs_utm",
    "cummin", "cumproduct", "merge_concat", "merge_disjoint_bands",
    "merge_case4_subcube", "array_ops2", "dedup_clusters", "salted_reduce",
    "resample_bilinear", "mask_triangle", "apply_dimension_dropnull",
    "vector_reproject", "ivf_topk",
]

# New queries added in round 3 (never driver-verified by construction).
_NEW_R3: list[str] = []

# Verified in r1 only — least recently checked of the verified set.
_R1_ONLY = [
    "multimodal_features", "streaming_daily_sum", "reduce_any",
    "reduce_count_condition", "filter_spatial", "mask_polygon",
    "apply_polygon", "trim_cube", "order_argsort",
]

_PRIORITY = (
    ["flagship_daily_mean", "process_graph"]
    + _NEVER_DRIVER_VERIFIED
    + _NEW_R3
    + _R1_ONLY
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


def all_oracles() -> dict:
    return _merged("ORACLES")
