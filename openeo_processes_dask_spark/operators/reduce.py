"""Dimension reduction (reference: cubes/reduce.py — SURVEY.md §2.4).

``reduce_dimension`` is THE workhorse: in long format it is exactly
``GROUP BY <all dims except the reduced one>`` — a hash aggregate with
map-side partial aggregation, which is the plan that scales: the shuffle
carries one partial row per (group × mapper), not the input.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.functions.reducers import resolve_reducer


@process
def reduce_dimension(
    data: DataCube,
    reducer,
    dimension: str,
    context=None,
    **reducer_kwargs,
) -> DataCube:
    """Apply ``reducer`` along ``dimension`` and drop it
    (reference: cubes/reduce.py:13-46). ``reducer`` is an OpenEO process
    name (mean/sum/…), a prebuilt aggregate builder, or a compiled callback.
    """
    dim = data.assert_dim(dimension)
    keep = data.other_dims(dim)
    builder = resolve_reducer(reducer)
    value = builder(
        F.col(data.value_col),
        order_col=F.col(dim),
        context=context,
        **reducer_kwargs,
    ).alias(data.value_col)
    df = data.df.groupBy(*keep).agg(value)
    meta = data.meta
    new_roles = {d: meta.role_of(d) for d in keep}
    return DataCube(
        df,
        dims=tuple(keep),
        value_col=meta.value_col,
        roles=new_roles,
        crs=meta.crs,
        # reference records reduced_dimensions_min_values in attrs
        # (reduce.py:31-38); we record the reduced dim name.
        attrs={**meta.attrs, "reduced_dimensions": dim},
    )


@process
def reduce_spatial(
    data: DataCube, reducer, context=None, **reducer_kwargs
) -> DataCube:
    """Reduce over x and y together (reference: cubes/reduce.py:49-62)."""
    sdims = data.meta.spatial_dims
    if not sdims:
        raise ValueError("No spatial dimensions to reduce")
    keep = data.other_dims(*sdims)
    builder = resolve_reducer(reducer)
    value = builder(
        F.col(data.value_col), order_col=None, context=context, **reducer_kwargs
    ).alias(data.value_col)
    df = data.df.groupBy(*keep).agg(value)
    meta = data.meta
    return DataCube(
        df,
        dims=tuple(keep),
        value_col=meta.value_col,
        roles={d: meta.role_of(d) for d in keep},
        crs=meta.crs,
        attrs=meta.attrs,
    )
