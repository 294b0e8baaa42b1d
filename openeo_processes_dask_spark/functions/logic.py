"""Logic scalar processes (reference: logic.py, SURVEY.md §2.8).

The reference hand-builds three-valued Kleene logic on NaN floats
(reference: logic.py:11-47); Spark's AND/OR/NOT on nullable booleans *are*
Kleene logic natively, so these are direct operators — a genuine
simplification the survey called out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.functions.math import _c


def _b(v) -> Column:
    return _c(v).cast("boolean")


@process(name="and")
def _and(x, y) -> Column:
    return _b(x) & _b(y)


@process(name="or")
def _or(x, y) -> Column:
    return _b(x) | _b(y)


@process
def xor(x, y) -> Column:
    # NULL-propagating != on booleans matches reference logic.py:30-38.
    return _b(x) != _b(y)


@process(name="not")
def _not(x) -> Column:
    return ~_b(x)


@process(name="if")
def _if(value, accept, reject=None) -> Column:
    # (reference: logic.py:50-55)
    return F.when(_b(value), _c(accept)).otherwise(
        _c(reject) if reject is not None else F.lit(None)
    )
