"""Filter processes (reference: cubes/_filter.py — SURVEY.md §2.2).

All of these compile to ``WHERE`` predicates on dimension columns, which
Catalyst pushes down into the parquet scan (PushedFilters) — at 100 TB these
are the operators that decide whether a query reads 100 TB or 1 TB, so they
must stay pure relational predicates (no UDFs).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube, DimensionNotAvailable


from openeo_processes_dask_spark.exceptions import (  # noqa: F401
    TemporalExtentEmpty,
)


def _single_temporal_dim(data: DataCube, dimension: Optional[str]) -> str:
    if dimension is not None:
        return data.assert_dim(dimension)
    tdims = data.meta.temporal_dims
    if len(tdims) != 1:
        # reference: cubes/_filter.py:62-65
        raise DimensionNotAvailable(
            f"Exactly one temporal dimension required, found {tdims}"
        )
    return tdims[0]


@process
def filter_temporal(
    data: DataCube, extent: Sequence, dimension: Optional[str] = None
) -> DataCube:
    """Half-open ``[start, end)`` slice on the temporal dim
    (reference: cubes/_filter.py:42-106; the reference subtracts 1 ms from
    ``end`` because xarray slices are closed — a strict ``<`` gives the same
    semantics directly). NULL timestamps are dropped (reference :101)."""
    dim = _single_temporal_dim(data, dimension)
    start, end = extent[0], extent[1]
    if start is not None and end is not None and str(start) > str(end):
        raise TemporalExtentEmpty(f"Empty temporal extent [{start}, {end})")
    col = F.col(dim)
    pred = col.isNotNull()
    if start is not None:
        pred = pred & (col >= F.lit(start).cast("timestamp"))
    if end is not None:
        pred = pred & (col < F.lit(end).cast("timestamp"))

    # Pushdown partner: when the dim was derived from a TIMESTAMP(NANOS)
    # bigint column (sources/load.py), a twin range predicate on the raw
    # nanos column reaches the parquet scan and prunes rowgroups — the
    # predicate on the derived timestamp alone cannot (verified via
    # .explain: only IsNotNull pushed). Semantically redundant, physically
    # the difference between a pruned scan and a full scan at 100 TB.
    from openeo_processes_dask_spark.sources.load import NANOS_PARTNER_ATTR

    raw_col = data.meta.attrs.get(NANOS_PARTNER_ATTR, {}).get(dim)
    if raw_col and raw_col in data.df.columns:
        import pandas as pd

        raw = F.col(raw_col)
        if start is not None:
            ns = int(pd.Timestamp(start).value)
            pred = pred & (raw >= F.lit(ns))
        if end is not None:
            ns = int(pd.Timestamp(end).value)
            pred = pred & (raw < F.lit(ns))
    return data.with_df(data.df.where(pred))


@process
def filter_bbox(data: DataCube, extent: dict) -> DataCube:
    """Bounding-box filter on the spatial dims (reference:
    cubes/_filter.py:171-281). CRS reprojection of the bbox happens on the
    driver (pure metadata, reference :184-186); the data-side predicate is a
    plain, pushdown-friendly ``BETWEEN`` on x and y."""
    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    if x_dim is None or y_dim is None:
        raise DimensionNotAvailable(
            f"No spatial dimensions found in {data.meta.dims}"
        )
    crs = extent.get("crs")
    west, east = extent["west"], extent["east"]
    south, north = extent["south"], extent["north"]
    if crs is not None and data.meta.crs is not None and str(crs) != str(data.meta.crs):
        west, east, south, north = _reproject_bbox(
            west, east, south, north, str(crs), str(data.meta.crs)
        )
    pred = F.col(x_dim).between(west, east) & F.col(y_dim).between(south, north)
    return data.with_df(data.df.where(pred))


def _reproject_bbox(west, east, south, north, src_crs: str, dst_crs: str):
    """Driver-side bbox transform (reference: cubes/_filter.py:284-320).
    EPSG:4326<->3857 corners go through the native closed-form transform
    (functions/crs.py); other pairs fall back to pyproj when present."""
    from openeo_processes_dask_spark.functions import crs as _crs

    xs, ys = zip(
        *(
            _crs.transform_xy_scalar(x, y, src_crs, dst_crs)
            for x in (west, east)
            for y in (south, north)
        )
    )
    return min(xs), max(xs), min(ys), max(ys)


@process
def filter_bands(data: DataCube, bands: Sequence[str]) -> DataCube:
    """Label-select on the band dim (reference: cubes/_filter.py:133-149) —
    an IN-list predicate, partition-prunable when the source is partitioned
    by band."""
    from openeo_processes_dask_spark.exceptions import (
        BandFilterParameterMissing,
        DimensionMissing,
    )

    if bands is None:
        raise BandFilterParameterMissing(
            "The process `filter_bands` requires the parameters `bands` to be set."
        )
    bdims = data.meta.band_dims
    if not bdims:
        raise DimensionMissing("A band dimension is missing.")
    return data.with_df(data.df.where(F.col(bdims[0]).isin(list(bands))))


@process
def filter_labels(data: DataCube, condition, dimension: str) -> DataCube:
    """Keep rows whose dim label satisfies ``condition``
    (reference: cubes/_filter.py:109-130). The condition depends only on the
    label column, so instead of materializing the label set and semi-joining
    (the reference evaluates on the coord vector), we apply the predicate
    directly — identical result, zero extra passes."""
    dim = data.assert_dim(dimension)
    cond = condition(F.col(dim)) if callable(condition) else condition
    if not isinstance(cond, Column):
        raise TypeError("condition must be a Column or a Column-builder callable")
    return data.with_df(data.df.where(cond))


@process
def filter_spatial(data: DataCube, geometries) -> DataCube:
    """bbox-crop to the geometries' bounds then polygon-mask with drop
    (reference: cubes/_filter.py:152-168)."""
    from openeo_processes_dask_spark.operators.mask import (
        _geometry_bounds,
        _point_in_polygons,
    )

    x_dim, y_dim = data.meta.x_dim, data.meta.y_dim
    if x_dim is None or y_dim is None:
        raise DimensionNotAvailable("filter_spatial needs spatial dims")
    west, south, east, north = _geometry_bounds(geometries)
    df = data.df.where(
        F.col(x_dim).between(west, east) & F.col(y_dim).between(south, north)
    )
    inside = _point_in_polygons(F.col(x_dim), F.col(y_dim), geometries)
    return data.with_df(df.where(inside))
