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


def _rqa_trend(y, threshold: float) -> float:
    """TREND metric of recurrence quantification analysis over one series:
    the slope of the recurrence rate RR_tau as a function of diagonal
    distance tau in the recurrence plot R(i,j) = |y_i - y_j| < threshold
    (Marwan et al. 2007, "Recurrence plots for the analysis of complex
    systems", Physics Reports 438, eq. for TREND). Pure NumPy."""
    import numpy as np

    y = np.asarray(y, dtype="float64")
    y = y[~np.isnan(y)]
    n = len(y)
    if n < 3:
        return float("nan")
    rec = np.abs(y[:, None] - y[None, :]) < threshold
    taus = np.arange(1, n)
    rr = np.array([rec.diagonal(int(t)).mean() for t in taus])
    center = taus - (n - 1) / 2.0 - 0.5
    denom = (center**2).sum()
    if denom == 0:
        return float("nan")
    return float((center * (rr - rr.mean())).sum() / denom)


@process
def rqa_deforestation(
    data: DataCube, threshold: float = 0.5, dimension: str = None
) -> DataCube:
    """Recurrence-quantification deforestation trend per pixel
    (reference: experimental/rqadeforestation.py:9-16, which maps the Julia
    package's ``rqatrend`` along the time axis with
    ``da.apply_along_axis``). That library is not public Python, so the
    per-series statistic here is the published RQA TREND formula itself
    (see ``_rqa_trend``) — same shape: groupBy(all dims but time) →
    Arrow-batched pandas kernel along the series, one value per pixel,
    time dim dropped. O(|t|^2) per group, executor-bound; |t| is the time
    axis length (thousands at most), never the table size."""
    import pandas as pd

    from openeo_processes_dask_spark.operators.filters import (
        _single_temporal_dim,
    )

    dim = _single_temporal_dim(data, dimension)
    keep = data.other_dims(dim)
    v = data.value_col
    df = data.df
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + [f"`{v}` double"]
    )
    thr = float(threshold)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        series = pdf.sort_values(dim)[v].to_numpy(dtype="float64")
        out = pd.DataFrame({v: [_rqa_trend(series, thr)]})
        for k in keep:
            out.insert(0, k, pdf[k].iloc[0])
        return out[[*keep, v]]

    out_df = df.groupBy(*keep).applyInPandas(run, schema=schema)
    return DataCube(
        out_df,
        dims=keep,
        value_col=v,
        roles={d: data.meta.role_of(d) for d in keep},
        crs=data.meta.crs,
        attrs=data.meta.attrs,
    )


# The reference's public module-level name is ``rqadeforestation``
# (experimental/rqadeforestation.py) — register the exact id as an alias.
process(rqa_deforestation, name="rqadeforestation")
