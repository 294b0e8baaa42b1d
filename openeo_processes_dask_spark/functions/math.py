"""Math scalar processes → Spark SQL expressions.

Each maps one-for-one to a reference NumPy wrapper (reference: math.py) —
see SURVEY.md §2.8 for the full mapping table. All functions accept Spark
Columns or Python scalars and return a Column, so callback process graphs
compile to pure Catalyst expressions (codegen, no UDFs).
"""

from __future__ import annotations

import math as _pymath

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process


def _c(v) -> Column:
    """Lift scalars to Columns."""
    return v if isinstance(v, Column) else F.lit(v)


# --- arithmetic (reference: math.py:98-116) -----------------------------
@process
def add(x, y) -> Column:
    return _c(x) + _c(y)


@process
def subtract(x, y) -> Column:
    return _c(x) - _c(y)


@process
def multiply(x, y) -> Column:
    return _c(x) * _c(y)


@process
def divide(x, y) -> Column:
    # Reference divides floats (NaN/inf on zero). SQL x/0 -> NULL; that is
    # our nodata, consistent with the NULL convention. try_divide, not /:
    # under ANSI mode (the Spark 4 DEFAULT) a bare / THROWS on a zero
    # divisor, poisoning the whole job for one bad cell.
    return F.try_divide(_c(x), _c(y))


# --- rounding (reference: math.py:212-226) ------------------------------
@process
def floor(x) -> Column:
    return F.floor(_c(x))


@process
def ceil(x) -> Column:
    return F.ceil(_c(x))


@process(name="int")
def _int(x) -> Column:
    # Truncate toward zero (reference: math.py:220 — np trunc semantics).
    x = _c(x)
    return F.signum(x) * F.floor(F.abs(x))


@process(name="round")
def _round(x, p: int = 0) -> Column:
    # Half-to-even like np.around (reference: math.py:224) -> Spark bround.
    return F.bround(_c(x), p)


# --- exp/log (reference: math.py:228-238) -------------------------------
@process
def exp(p) -> Column:
    return F.exp(_c(p))


@process
def ln(x) -> Column:
    return F.log(_c(x))


@process
def log(x, base) -> Column:
    b = base if not isinstance(base, Column) else base
    return F.log(float(b), _c(x)) if not isinstance(b, Column) else (
        F.log(_c(x)) / F.log(b)
    )


# --- trig (reference: math.py:240-289) ----------------------------------
@process
def sin(x) -> Column:
    return F.sin(_c(x))


@process
def cos(x) -> Column:
    return F.cos(_c(x))


@process
def tan(x) -> Column:
    return F.tan(_c(x))


@process
def arcsin(x) -> Column:
    return F.asin(_c(x))


@process
def arccos(x) -> Column:
    return F.acos(_c(x))


@process
def arctan(x) -> Column:
    return F.atan(_c(x))


@process
def arctan2(y, x) -> Column:
    return F.atan2(_c(y), _c(x))


@process
def sinh(x) -> Column:
    return F.sinh(_c(x))


@process
def cosh(x) -> Column:
    return F.cosh(_c(x))


@process
def tanh(x) -> Column:
    return F.tanh(_c(x))


@process
def arsinh(x) -> Column:
    return F.asinh(_c(x))


@process
def arcosh(x) -> Column:
    return F.acosh(_c(x))


@process
def artanh(x) -> Column:
    return F.atanh(_c(x))


# --- misc (reference: math.py:292-338) ----------------------------------
@process
def mod(x, y) -> Column:
    # NumPy mod: result takes the sign of the divisor (reference: math.py:301)
    # — SQL % takes the sign of the dividend, so re-wrap. try_mod, not %:
    # ANSI mode (Spark 4 default) throws on a zero divisor; NULL is the
    # nodata answer (reference yields NaN there).
    x, y = _c(x), _c(y)
    return F.try_mod(F.try_mod(x, y) + y, y)


@process
def absolute(x) -> Column:
    return F.abs(_c(x))


@process
def sgn(x) -> Column:
    return F.signum(_c(x))


@process
def sqrt(x) -> Column:
    return F.sqrt(_c(x))


@process
def power(base, p) -> Column:
    return F.pow(_c(base), _c(p))


@process
def clip(x, min, max) -> Column:  # noqa: A002 - spec param names
    # (reference: math.py:332-338) — scalar bounds are validated eagerly;
    # Column bounds can't be compared driver-side and clip lazily instead
    if isinstance(min, (int, float)) and isinstance(max, (int, float)) and min > max:
        from openeo_processes_dask_spark.exceptions import MinMaxSwapped

        raise MinMaxSwapped(
            "The minimum value should be lower than or equal to the maximum value."
        )
    return F.greatest(F.least(_c(x), _c(max)), _c(min))


@process
def linear_scale_range(
    x, inputMin, inputMax, outputMin: float = 0.0, outputMax: float = 1.0
) -> Column:
    # (reference: math.py:292-298). try_divide: a degenerate range
    # (inputMin == inputMax) gives NULL under ANSI instead of an error.
    x = _c(x)
    return F.try_divide(
        x - _c(inputMin), _c(inputMax) - _c(inputMin)
    ) * (_c(outputMax) - _c(outputMin)) + _c(outputMin)


@process
def normalized_difference(x, y) -> Column:
    # (reference: math.py:412-414). try_divide: x + y == 0 (both bands
    # zero — common over water/nodata) must give NULL, not an ANSI
    # DIVIDE_BY_ZERO that kills the job.
    x, y = _c(x), _c(y)
    return F.try_divide(x - y, x + y)


# --- constants (reference: math.py:75-95) -------------------------------
@process
def e() -> Column:
    return F.lit(_pymath.e)


@process
def pi() -> Column:
    return F.lit(_pymath.pi)


@process
def constant(x) -> Column:
    return _c(x)


@process
def nan() -> Column:
    # nodata ≡ NULL (see functions/__init__.py docstring).
    return F.lit(None).cast("double")
