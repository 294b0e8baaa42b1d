"""Text scalar processes (reference: text.py, SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.functions.math import _c


def _ci(data, pattern, case_sensitive: bool):
    d, p = _c(data), _c(pattern)
    if not case_sensitive:
        d, p = F.lower(d), F.lower(p)
    return d, p


@process
def text_begins(data, pattern, case_sensitive: bool = True) -> Column:
    # (reference: text.py:11-20; null in -> null out is native)
    d, p = _ci(data, pattern, case_sensitive)
    return d.startswith(p)


@process
def text_contains(data, pattern, case_sensitive: bool = True) -> Column:
    d, p = _ci(data, pattern, case_sensitive)
    return d.contains(p)


@process
def text_ends(data, pattern, case_sensitive: bool = True) -> Column:
    d, p = _ci(data, pattern, case_sensitive)
    return d.endswith(p)


@process
def text_concat(data: list, separator="") -> Column:
    """Concat rendering booleans/null lowercase like Python→JSON
    (reference: text.py:41-55)."""

    def render(v):
        c = _c(v)
        # booleans render as true/false, nulls as "null"
        return F.when(c.isNull(), F.lit("null")).otherwise(
            F.when(
                c.cast("string").isin("true", "false"),
                c.cast("string"),
            ).otherwise(c.cast("string"))
        )

    return F.concat_ws(
        separator if isinstance(separator, str) else "", *[render(v) for v in data]
    )
