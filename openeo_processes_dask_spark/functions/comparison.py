"""Comparison scalar processes (reference: comparison.py, SURVEY.md §2.8).

Spark's null semantics already propagate NULL through comparisons, which is
exactly the reference's hand-built null propagation (reference:
comparison.py:82-85) — so most of these are direct operator mappings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.functions.math import _c


@process
def is_nodata(x) -> Column:
    # nodata ≡ NULL (reference treats NaN as nodata, comparison.py:36-43).
    return _c(x).isNull()


@process
def is_nan(x) -> Column:
    # Indistinguishable from is_nodata under the NULL convention, matching
    # the reference where is_nan/is_nodata coincide (comparison.py:36-43).
    x = _c(x)
    return x.isNull() | F.isnan(x.cast("double"))


@process
def is_valid(x) -> Column:
    return _c(x).isNotNull()


@process
def is_infinite(x) -> Column:
    x = _c(x).cast("double")
    return F.when(x.isNull(), F.lit(None).cast("boolean")).otherwise(
        (x == float("inf")) | (x == float("-inf"))
    )


@process
def eq(x, y, delta=None, case_sensitive: bool = True) -> Column:
    """Equality with optional numeric tolerance and case-insensitive string
    compare (reference: comparison.py:46-85)."""
    x, y = _c(x), _c(y)
    if delta is not None:
        result = F.abs(x - y) <= _c(delta)
    elif not case_sensitive:
        result = F.lower(x.cast("string")) == F.lower(y.cast("string"))
    else:
        result = x == y
    # NULL in -> NULL out comes free from SQL semantics.
    return result


@process
def neq(x, y, delta=None, case_sensitive: bool = True) -> Column:
    return ~eq(x, y, delta=delta, case_sensitive=case_sensitive)


@process
def gt(x, y) -> Column:
    return _c(x) > _c(y)


@process
def gte(x, y) -> Column:
    return _c(x) >= _c(y)


@process
def lt(x, y) -> Column:
    return _c(x) < _c(y)


@process
def lte(x, y) -> Column:
    return _c(x) <= _c(y)


@process
def between(x, min, max, exclude_max: bool = False) -> Column:  # noqa: A002
    # (reference: comparison.py:120-132)
    x = _c(x)
    upper = (x < _c(max)) if exclude_max else (x <= _c(max))
    return (x >= _c(min)) & upper


# Reference exposes xarray-style null tests beside the openEO names
# (cubes/utils.py:17-25): register the exact ids as aliases.
process(is_nodata, name="isnull")


@process
def notnull(x) -> Column:
    """Inverse of isnull (reference: cubes/utils.py:24-25)."""
    return _c(x).isNotNull()
