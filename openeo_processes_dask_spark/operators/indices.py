"""Spectral indices (reference: cubes/indices.py — SURVEY.md §2.13)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube, DimensionNotAvailable


from openeo_processes_dask_spark.exceptions import (  # noqa: F401
    BandExists,
    NirBandAmbiguous,
    RedBandAmbiguous,
)


@process
def ndvi(
    data: DataCube,
    nir: str = "nir",
    red: str = "red",
    target_band: Optional[str] = None,
) -> DataCube:
    """(nir - red) / (nir + red) (reference: cubes/indices.py:15-59).

    Long-format plan: filter to the two bands, pivot band → two value
    columns (explicit pivot values: no extra distinct pass), one arithmetic
    projection. One shuffle total; Catalyst prunes every other band at the
    scan (the reference's common_name asset-metadata fallback,
    indices.py:24-41, is a driver-side naming concern).

    With ``target_band`` the NDVI rows are unioned back as a new band
    (reference: indices.py:49-56) — the band dim survives; otherwise the
    band dim is dropped.
    """
    from openeo_processes_dask_spark.exceptions import DimensionAmbiguous

    bdims = data.meta.band_dims
    if not bdims:
        raise DimensionAmbiguous(
            "Dimension of type `bands` is not available or is ambiguous."
        )
    band = bdims[0]
    keep = data.other_dims(band)
    v = data.value_col
    pivoted = (
        data.df.where(F.col(band).isin([nir, red]))
        .groupBy(*keep)
        .pivot(band, [nir, red])
        .agg(F.first(v))
    )
    value = (
        # try_divide: nir + red == 0 -> NULL nodata, not an ANSI error
        F.try_divide(F.col(nir) - F.col(red), F.col(nir) + F.col(red))
    ).alias(v)
    if target_band is None:
        df = pivoted.select(*keep, value)
        return DataCube(
            df,
            dims=tuple(keep),
            value_col=v,
            roles={d: data.meta.role_of(d) for d in keep},
            crs=data.meta.crs,
            attrs=data.meta.attrs,
        )
    ndvi_rows = pivoted.select(
        *keep, F.lit(target_band).alias(band), value
    ).select(*data.meta.dims, v)
    return data.with_df(data.df.unionByName(ndvi_rows))
