"""Experimental domain processes (reference: experimental/ — SURVEY.md §2.13)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube, DimensionNotAvailable


@process
def ddmc(
    data: DataCube,
    nir08: str = "nir08",
    nir09: str = "nir09",
    cirrus: str = "cirrus",
    swir16: str = "swir16",
    swir22: str = "swir22",
    gain: float = 2.5,
    target_band: Optional[str] = None,
) -> DataCube:
    """Cloud composite: three band differences × gain stacked as new bands
    midcl/dc/lowcl (reference: experimental/ddmc.py:8-84 — built there from
    per-index cubes + add_dimension + merge_cubes; here one pivot + three
    projections + one union, a single shuffle).

    midcl = (nir08 - nir09) * gain, dc = (cirrus - swir22) * gain,
    lowcl = (swir16 - cirrus) * gain.
    """
    bdims = data.meta.band_dims
    if not bdims:
        raise DimensionNotAvailable(f"No bands dimension in {data.meta.dims}")
    band = bdims[0]
    keep = data.other_dims(band)
    v = data.value_col
    needed = [nir08, nir09, cirrus, swir16, swir22]
    pivoted = (
        data.df.where(F.col(band).isin(needed))
        .groupBy(*keep)
        .pivot(band, needed)
        .agg(F.first(v))
    )
    g = F.lit(float(gain))
    out = None
    for label, expr in (
        ("midcl", (F.col(nir08) - F.col(nir09)) * g),
        ("dc", (F.col(cirrus) - F.col(swir22)) * g),
        ("lowcl", (F.col(swir16) - F.col(cirrus)) * g),
    ):
        part = pivoted.select(
            *keep, F.lit(label).alias(band), expr.alias(v)
        ).select(*data.meta.dims, v)
        out = part if out is None else out.unionByName(part)
    return data.with_df(out)


@process
def rqa_deforestation(data: DataCube, threshold: float = 0.5) -> DataCube:
    """Recurrence-quantification deforestation trend
    (reference: experimental/rqadeforestation.py:9-16 — wraps the Julia
    ``rqatrend``; that library is not public Python). STUB: the per-pixel
    trend statistic is gated; the Spark plumbing (groupBy pixel →
    along-time kernel) is the same shape as fit_curve."""
    raise NotImplementedError(
        "rqatrend's recurrence analysis depends on the RQADeforestation "
        "Julia package (reference: experimental/rqadeforestation.py); "
        "use ml.curve_fitting.fit_curve for trend extraction instead"
    )
