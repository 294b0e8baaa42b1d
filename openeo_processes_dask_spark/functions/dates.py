"""Date/time scalar processes (reference: dates.py, SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process
from openeo_processes_dask_spark.functions.math import _c


def _ts(v) -> Column:
    return _c(v).cast("timestamp")


@process
def date_between(x, min, max, exclude_max: bool = False) -> Column:  # noqa: A002
    # (reference: dates.py:17-26)
    x = _ts(x)
    upper = (x < _ts(max)) if exclude_max else (x <= _ts(max))
    return (x >= _ts(min)) & upper


@process
def date_difference(date1, date2, unit: str = "second") -> Column:
    """Signed difference date2 - date1 in ``unit``.

    Sub-month units are exact epoch arithmetic; month/year use calendar
    truncation exactly like the reference's datetime64 unit-cast trick
    (reference: dates.py:29-61).
    """
    d1, d2 = _ts(date1), _ts(date2)
    micros = F.unix_micros(d2) - F.unix_micros(d1)
    per_unit = {
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 7 * 86_400_000_000,
    }
    if unit in per_unit:
        return micros / F.lit(per_unit[unit]).cast("double")
    if unit == "month":
        return (
            (F.year(d2) * 12 + F.month(d2)) - (F.year(d1) * 12 + F.month(d1))
        ).cast("double")
    if unit == "year":
        return (F.year(d2) - F.year(d1)).cast("double")
    raise ValueError(f"Unsupported unit: {unit}")


@process
def date_shift(date, value, unit: str) -> Column:
    """Calendar-aware shift with end-of-month clamping for month/year
    (reference: dates.py:64-126; clamping logic :102-110 comes free from
    Spark's add_months)."""
    d = _ts(date)
    v = value if isinstance(value, Column) else F.lit(value)
    if unit == "year":
        return F.add_months(d, v * 12).cast("timestamp")
    if unit == "month":
        return F.add_months(d, v).cast("timestamp")
    unit_args = {
        "week": (0, 0, v, 0, 0, 0, 0),
        "day": (0, 0, 0, v, 0, 0, 0),
        "hour": (0, 0, 0, 0, v, 0, 0),
        "minute": (0, 0, 0, 0, 0, v, 0),
        "second": (0, 0, 0, 0, 0, 0, v),
        "millisecond": (0, 0, 0, 0, 0, 0, v / 1000.0),
    }
    if unit not in unit_args:
        raise ValueError(f"Unsupported unit: {unit}")
    y, mo, w, dd, h, mi, s = (
        a if isinstance(a, Column) else F.lit(a) for a in unit_args[unit]
    )
    return d + F.make_interval(y, mo, w, dd, h, mi, s.cast("double"))


@process
def datetime_from_str(date) -> Column:
    """Parse an (RFC 3339) string into a timestamp
    (reference: dates.py:12-14, np.datetime64). Column lane:
    to_timestamp handles date-only and full datetime forms."""
    return F.to_timestamp(_c(date))
