"""Reducer library: OpenEO aggregation processes as Spark aggregate builders.

Maps the reference's axis-aware NumPy nan-aggregations (reference:
math.py:118-209,322-409, arrays.py:461-495, logic.py:58-87 — SURVEY.md §2.4)
onto Spark's native partial/final hash aggregates. ``ignore_nodata=True``
(the OpenEO default) is exactly SQL's ignore-NULL aggregate semantics, so
the common path is a plain built-in aggregate with full map-side combine.
``ignore_nodata=False`` wraps the aggregate in a null-out guard.

Each builder: ``fn(col, ignore_nodata=True, order_col=None, **kw) -> Column``.
``order_col`` supplies the dimension ordering for order-sensitive reducers
(first/last), which in long format must be explicit.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


def _nullout_if_any_null(col: Column, agg: Column) -> Column:
    """ignore_nodata=False: result is NULL when any input cell is NULL."""
    has_null = F.sum(F.when(col.isNull(), 1).otherwise(0)) > 0
    return F.when(has_null, F.lit(None)).otherwise(agg)


def _simple(agg_fn: Callable[[Column], Column]):
    def builder(col: Column, ignore_nodata: bool = True, order_col=None, **kw):
        agg = agg_fn(col)
        return agg if ignore_nodata else _nullout_if_any_null(col, agg)

    return builder


mean = _simple(F.avg)
# reference: math.py nansum of all-NaN is 0.0, but OpenEO spec (and our NULL
# convention) returns null for empty/all-nodata input — SQL sum does exactly
# that.
sum = _simple(F.sum)  # noqa: A001 - spec name
min = _simple(F.min)  # noqa: A001
max = _simple(F.max)  # noqa: A001
median = _simple(lambda c: F.median(c))
sd = _simple(F.stddev_samp)
variance = _simple(F.var_samp)


def product(col: Column, ignore_nodata: bool = True, order_col=None, **kw) -> Column:
    """Distributed product via exp∘sum∘ln with sign/zero bookkeeping — keeps
    the aggregation a single shuffle-combinable pass (no collect_list)."""
    any_zero = F.sum(F.when(col == 0, 1).otherwise(0)) > 0
    n_valid = F.count(col)
    neg_odd = F.pmod(F.sum(F.when(col < 0, 1).otherwise(0)), F.lit(2)) == 1
    log_sum = F.sum(F.log(F.abs(F.nullif(col.cast("double"), F.lit(0.0)))))
    magnitude = F.exp(log_sum)
    agg = F.when(n_valid == 0, F.lit(None).cast("double")).otherwise(
        F.when(any_zero, F.lit(0.0)).otherwise(
            F.when(neg_odd, -magnitude).otherwise(magnitude)
        )
    )
    return agg if ignore_nodata else _nullout_if_any_null(col, agg)


def count(
    col: Column,
    ignore_nodata: bool = True,
    order_col=None,
    condition=None,
    **kw,
) -> Column:
    """count valid / all / condition-matching (reference: arrays.py:587-606)."""
    if condition is True:
        return F.count(F.lit(1))
    if condition is not None and isinstance(condition, Column):
        return F.count(F.when(condition, 1))
    return F.count(col)


def first(
    col: Column, ignore_nodata: bool = True, order_col: Optional[Column] = None, **kw
) -> Column:
    """First element along the reduced dim (reference: arrays.py:461-478).

    Long format has no intrinsic order → order by the dim column itself via
    min_by. ignore_nodata skips NULL cells (min_by over non-null rows)."""
    if order_col is None:
        return F.first(col, ignorenulls=ignore_nodata)
    if ignore_nodata:
        return F.min_by(col, F.when(col.isNotNull(), order_col))
    return F.min_by(col, order_col)


def last(
    col: Column, ignore_nodata: bool = True, order_col: Optional[Column] = None, **kw
) -> Column:
    if order_col is None:
        return F.last(col, ignorenulls=ignore_nodata)
    if ignore_nodata:
        return F.max_by(col, F.when(col.isNotNull(), order_col))
    return F.max_by(col, order_col)


def _any(col: Column, ignore_nodata: bool = True, order_col=None, **kw) -> Column:
    # (reference: logic.py:58-72) Kleene: with ignore_nodata=False a NULL
    # only matters if no TRUE exists.
    b = col.cast("boolean")
    agg = F.bool_or(b)
    if ignore_nodata:
        return agg
    has_null = F.sum(F.when(b.isNull(), 1).otherwise(0)) > 0
    return F.when(F.coalesce(agg, F.lit(False)) & ~F.lit(False), agg).when(
        has_null, F.lit(None).cast("boolean")
    ).otherwise(agg)


def _all(col: Column, ignore_nodata: bool = True, order_col=None, **kw) -> Column:
    b = col.cast("boolean")
    agg = F.bool_and(b)
    if ignore_nodata:
        return agg
    has_null = F.sum(F.when(b.isNull(), 1).otherwise(0)) > 0
    is_false = F.coalesce(~agg, F.lit(False))
    return F.when(is_false, F.lit(False)).when(
        has_null, F.lit(None).cast("boolean")
    ).otherwise(agg)


def extrema(col: Column, ignore_nodata: bool = True, order_col=None, **kw) -> Column:
    # (reference: math.py:322-329) returns [min, max]
    agg = F.array(F.min(col), F.max(col))
    return agg if ignore_nodata else _nullout_if_any_null(col, agg)


def quantiles(
    col: Column,
    ignore_nodata: bool = True,
    order_col=None,
    probabilities=None,
    q=None,
    **kw,
) -> Column:
    """Linear-interpolation quantiles (reference: math.py:341-387).

    Spark ``percentile`` is the exact interpolated percentile — matches
    np.quantile(method="linear").
    """
    from openeo_processes_dask_spark.exceptions import (
        QuantilesParameterConflict,
        QuantilesParameterMissing,
    )

    if probabilities is not None and q is not None:
        raise QuantilesParameterConflict(
            "The process `quantiles` requires either the `probabilities` or "
            "`q` parameter to be set."
        )
    if q is not None:
        probabilities = [i / q for i in range(1, q)]
    if probabilities is None:
        raise QuantilesParameterMissing(
            "The process `quantiles` only allows that either the "
            "`probabilities` or the `q` parameter is set."
        )
    # reference math.py:354-362: an int `probabilities` (or a
    # single-int list) means "that many evenly-spaced intervals",
    # identical to q — without this coercion the int would flow into
    # percentile() as an out-of-range probability
    if isinstance(probabilities, int):
        probabilities = [i / probabilities for i in range(1, probabilities)]
    elif (
        isinstance(probabilities, list)
        and len(probabilities) == 1
        and isinstance(probabilities[0], int)
    ):
        probabilities = [
            i / probabilities[0] for i in range(1, probabilities[0])
        ]
    if len(probabilities) == 0:
        # q=1 / probabilities=1 coerce to ZERO inner break points; the
        # reference returns an empty result array (math.py:352-371:
        # np.arange(1.0, 1, 1.0) is empty and np.quantile(x, []) is
        # []), not an error. F.percentile rejects an empty probability
        # array at analysis time, so short-circuit with a constant
        # empty-array aggregate (ignore_nodata is moot — no values are
        # consulted either way).
        return F.first(F.array().cast("array<double>"))
    agg = F.percentile(col, F.array(*[F.lit(float(p)) for p in probabilities]))
    return agg if ignore_nodata else _nullout_if_any_null(col, agg)


AGGREGATORS: dict[str, Callable] = {
    "mean": mean,
    "sum": sum,
    "min": min,
    "max": max,
    "median": median,
    "sd": sd,
    "variance": variance,
    "product": product,
    "count": count,
    "first": first,
    "last": last,
    "any": _any,
    "all": _all,
    "extrema": extrema,
    "quantiles": quantiles,
}


def resolve_reducer(reducer) -> Callable:
    """Accept a reducer by OpenEO process name or as a prebuilt builder."""
    if callable(reducer):
        return reducer
    if reducer in AGGREGATORS:
        return AGGREGATORS[reducer]
    raise KeyError(f"Unknown reducer {reducer!r}; known: {sorted(AGGREGATORS)}")


# The reference's auto-collected registry includes the reducer processes
# themselves (mean/sum/... are OpenEO processes, reference core.py:97-103);
# expose them under their process ids too so registry lookups and the PG
# executor see one namespace. setdefault: cube operators keep priority on
# any future name collision.
from openeo_processes_dask_spark.core import REGISTRY as _REGISTRY  # noqa: E402

for _name, _fn in AGGREGATORS.items():
    _REGISTRY.setdefault(_name, _fn)
