"""Temporal aggregation (reference: cubes/aggregate.py — SURVEY.md §2.4).

``aggregate_temporal_period`` compiles the calendar bucketing to a derived
label column (``date_trunc`` / ``when``-chains on month & day) followed by a
single hash aggregate — one shuffle, map-side combined, AQE-coalesced.
The reference's pandas-freq resample (reference: aggregate.py:231-238) and
its custom dekad/season interval generator (reference: aggregate.py:104-203)
both collapse into these label expressions.

Period labels are the *period start timestamp* (the reference uses string
labels; timestamps keep the dim temporal for downstream ops and make the
DuckDB oracle a plain ``date_trunc`` — conversion to string is trivial at
export).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.functions.reducers import resolve_reducer
from openeo_processes_dask_spark.operators.filters import _single_temporal_dim


def period_label_expr(t: Column, period: str) -> Column:
    """Map a timestamp to its calendar-period start.

    Standard periods (reference: aggregate.py:231-238 pandas freq table);
    dekad / season / tropical-season / decade / decade-ad re-express the
    reference's ``get_intervals`` generator (reference: aggregate.py:104-203)
    as closed-form column expressions.
    """
    if period in ("hour", "day", "week", "month", "year"):
        return F.date_trunc(period, t)
    if period == "dekad":
        # days 1-10 -> 1, 11-20 -> 11, 21-end -> 21
        day = F.dayofmonth(t)
        start_day = F.when(day <= 10, 1).when(day <= 20, 11).otherwise(21)
        return F.make_timestamp(
            F.year(t), F.month(t), start_day, F.lit(0), F.lit(0), F.lit(0.0)
        )
    if period == "season":
        # DJF/MAM/JJA/SON; December belongs to the *following* winter
        m = F.month(t)
        start_month = (
            F.when((m == 12) | (m <= 2), 12)
            .when(m <= 5, 3)
            .when(m <= 8, 6)
            .otherwise(9)
        )
        year = F.when(m <= 2, F.year(t) - 1).otherwise(F.year(t))
        return F.make_timestamp(
            year, start_month, F.lit(1), F.lit(0), F.lit(0), F.lit(0.0)
        )
    if period == "tropical-season":
        # NDJFMA (start Nov) / MJJASO (start May)
        m = F.month(t)
        start_month = F.when((m >= 11) | (m <= 4), 11).otherwise(5)
        year = F.when(m <= 4, F.year(t) - 1).otherwise(F.year(t))
        return F.make_timestamp(
            year, start_month, F.lit(1), F.lit(0), F.lit(0), F.lit(0.0)
        )
    if period == "decade":
        return F.make_timestamp(
            (F.floor(F.year(t) / 10) * 10).cast("int"),
            F.lit(1),
            F.lit(1),
            F.lit(0),
            F.lit(0),
            F.lit(0.0),
        )
    if period == "decade-ad":
        return F.make_timestamp(
            (F.floor((F.year(t) - 1) / 10) * 10 + 1).cast("int"),
            F.lit(1),
            F.lit(1),
            F.lit(0),
            F.lit(0),
            F.lit(0.0),
        )
    raise ValueError(f"Unsupported period: {period}")


@process
def aggregate_temporal_period(
    data: DataCube,
    period: str,
    reducer,
    dimension: Optional[str] = None,
    context=None,
    **reducer_kwargs,
) -> DataCube:
    """Calendar-period resample (reference: cubes/aggregate.py:206-253)."""
    dim = _single_temporal_dim(data, dimension)
    keep = data.other_dims(dim)
    builder = resolve_reducer(reducer)
    label = period_label_expr(F.col(dim), period).alias(dim)
    value = builder(
        F.col(data.value_col), order_col=F.col(dim), context=context, **reducer_kwargs
    ).alias(data.value_col)
    df = data.df.groupBy(*keep, label).agg(value)
    # column order: original dim order
    return data.with_df(df.select(*data.meta.dims, data.value_col))


@process
def aggregate_temporal(
    data: DataCube,
    intervals: Sequence[Sequence],
    reducer,
    labels: Optional[Sequence] = None,
    dimension: Optional[str] = None,
    context=None,
    **reducer_kwargs,
) -> DataCube:
    """Bin timestamps into explicit half-open ``[start, end)`` intervals,
    reduce each bin, keep empty bins as NULL rows
    (reference: cubes/aggregate.py:29-101; overlap validation :75-78,
    gap-bin NaN insertion :80-98).

    The interval table is tiny → it becomes a literal CASE chain evaluated
    in codegen (equivalently a broadcast range-join, without the join).
    """
    dim = _single_temporal_dim(data, dimension)
    intervals = [list(iv) for iv in intervals]
    # non-overlap validation (reference :75-78) — driver side, metadata only
    spans = sorted((str(s), str(e)) for s, e in intervals)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        if s2 < e1:
            raise ValueError(f"Overlapping intervals: [{s1},{e1}) and [{s2},{e2})")
    if labels is None:
        labels = [str(s) for s, _ in intervals]
    if len(labels) != len(intervals):
        raise ValueError("labels length must match intervals length")

    t = F.col(dim)
    label_expr: Optional[Column] = None
    for (s, e), lab in zip(intervals, labels):
        cond = (t >= F.lit(s).cast("timestamp")) & (t < F.lit(e).cast("timestamp"))
        label_expr = (
            F.when(cond, F.lit(lab))
            if label_expr is None
            else label_expr.when(cond, F.lit(lab))
        )
    keep = data.other_dims(dim)
    builder = resolve_reducer(reducer)
    value = builder(
        F.col(data.value_col), order_col=t, context=context, **reducer_kwargs
    ).alias(data.value_col)
    binned = (
        data.df.withColumn(dim, label_expr)
        .where(F.col(dim).isNotNull())
        .groupBy(*keep, dim)
        .agg(value)
    )
    # Materialize empty bins as NULL rows (reference :80-98): distinct group
    # keys × label list, left-joined. Group-key cardinality ≪ data size, and
    # the label list is a broadcast literal — cheap even at scale.
    spark = data.df.sparkSession
    labels_df = spark.createDataFrame([(l,) for l in labels], [dim])
    if keep:
        groups = data.df.select(*keep).distinct()
        full = groups.crossJoin(F.broadcast(labels_df))
    else:
        full = labels_df
    df = full.join(binned, on=[*keep, dim], how="left")
    new_roles = dict(data.meta.roles)
    new_roles[dim] = "temporal"
    return DataCube(
        df.select(*data.meta.dims, data.value_col),
        dims=data.meta.dims,
        value_col=data.value_col,
        roles=new_roles,
        crs=data.meta.crs,
        attrs=data.meta.attrs,
    )
