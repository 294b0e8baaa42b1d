"""Scalar layer vs NumPy oracles (reference pattern: one test per process,
tests/test_math.py etc.). All processes here are pure Column expressions —
one Spark job evaluates the whole batch."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.functions import comparison, dates, logic
from openeo_processes_dask_spark.functions import math as m
from openeo_processes_dask_spark.functions import text


@pytest.fixture(scope="module")
def row(spark):
    def evaluate(*cols):
        return spark.range(1).select(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).first()

    return evaluate


def test_math_ops(row):
    r = row(
        m.add(2, 3),
        m.subtract(2, 3),
        m.multiply(2, 3),
        m.divide(7.0, 2.0),
        m.floor(F.lit(2.7)),
        m.ceil(F.lit(2.1)),
        m._int(F.lit(-2.7)),
        m._round(F.lit(2.5)),
        m._round(F.lit(3.5)),
        m.exp(F.lit(1.0)),
        m.ln(F.lit(math.e)),
        m.log(F.lit(8.0), 2),
        m.mod(F.lit(-5), F.lit(3)),
        m.absolute(F.lit(-3.5)),
        m.sgn(F.lit(-2.0)),
        m.sqrt(F.lit(9.0)),
        m.power(F.lit(2.0), 10),
        m.clip(F.lit(15), 0, 10),
        m.normalized_difference(F.lit(0.8), F.lit(0.2)),
        m.linear_scale_range(F.lit(5.0), 0, 10, 0, 100),
    )
    expected = [5, -1, 6, 3.5, 2, 3, -2.0, 2.0, 4.0, math.e, 1.0, 3.0, 1, 3.5,
                -1.0, 3.0, 1024.0, 10, 0.6, 50.0]
    for i, e in enumerate(expected):
        assert r[i] == pytest.approx(e), f"col {i}: {r[i]} != {e}"


def test_mod_numpy_semantics(row):
    # np.mod: sign of divisor (reference: math.py:301)
    r = row(m.mod(5, 3), m.mod(-5, 3), m.mod(5, -3), m.mod(-5, -3))
    assert [r[0], r[1], r[2], r[3]] == [
        int(np.mod(5, 3)), int(np.mod(-5, 3)), int(np.mod(5, -3)), int(np.mod(-5, -3))
    ]


def test_comparison_null_propagation(row):
    null = F.lit(None).cast("double")
    r = row(
        comparison.eq(F.lit(1.0), null),
        comparison.gt(null, F.lit(0.0)),
        comparison.eq(F.lit(1.00000001), F.lit(1.0), delta=0.001),
        comparison.eq(F.lit("Test"), F.lit("test"), case_sensitive=False),
        comparison.neq(F.lit("Ä"), F.lit("ä"), case_sensitive=False),
        comparison.between(F.lit(5), 0, 10),
        comparison.between(F.lit(10), 0, 10, exclude_max=True),
        comparison.is_nodata(null),
        comparison.is_valid(F.lit(1.0)),
    )
    assert r[0] is None and r[1] is None
    assert r[2] is True and r[3] is True and r[4] is False
    assert r[5] is True and r[6] is False
    assert r[7] is True and r[8] is True


def test_logic_kleene(row):
    null = F.lit(None).cast("boolean")
    t, f = F.lit(True), F.lit(False)
    r = row(
        logic._and(t, null), logic._and(f, null),
        logic._or(t, null), logic._or(f, null),
        logic.xor(t, null), logic._not(null),
        logic._if(t, F.lit(1), F.lit(2)), logic._if(f, F.lit(1), F.lit(2)),
        logic._if(null, F.lit(1), F.lit(2)),
    )
    # Kleene: T∧N=N, F∧N=F, T∨N=T, F∨N=N (reference: logic.py:11-47)
    assert r[0] is None and r[1] is False
    assert r[2] is True and r[3] is None
    assert r[4] is None and r[5] is None
    assert (r[6], r[7], r[8]) == (1, 2, 2)


def test_text(row):
    r = row(
        text.text_begins(F.lit("Lorem ipsum"), "lorem"),
        text.text_begins(F.lit("Lorem ipsum"), "lorem", case_sensitive=False),
        text.text_contains(F.lit("Lorem ipsum"), "ipsum"),
        text.text_ends(F.lit("Lorem ipsum"), "ipsum"),
        text.text_concat([F.lit("a"), F.lit(2), F.lit("b")], separator="-"),
        text.text_begins(F.lit(None).cast("string"), "x"),
    )
    assert (r[0], r[1], r[2], r[3]) == (False, True, True, True)
    assert r[4] == "a-2-b"
    assert r[5] is None


def test_dates(row):
    r = row(
        dates.date_between(F.lit("2020-06-15"), "2020-01-01", "2020-12-31"),
        dates.date_difference(F.lit("2020-01-01"), F.lit("2020-01-02"), "day"),
        dates.date_difference(F.lit("2020-01-01T00:00:00"), F.lit("2020-01-01T00:00:30"), "second"),
        dates.date_difference(F.lit("2020-01-31"), F.lit("2020-03-01"), "month"),
        dates.date_shift(F.lit("2020-01-31"), 1, "month").cast("string"),
        dates.date_shift(F.lit("2020-02-29"), 1, "year").cast("string"),
        dates.date_shift(F.lit("2020-01-01"), -1, "day").cast("string"),
    )
    assert r[0] is True
    assert r[1] == 1.0 and r[2] == 30.0 and r[3] == 2.0
    # end-of-month clamping (reference: dates.py:102-110)
    assert r[4].startswith("2020-02-29")
    assert r[5].startswith("2021-02-28")
    assert r[6].startswith("2019-12-31")


def test_zero_divisors_are_null_under_ansi(spark):
    """ANSI mode (Spark 4 default) turns x/0 and x%0 into job-killing
    exceptions; the engine's divide/mod/normalized_difference must give
    NULL (nodata) instead — one bad cell must not poison a 100 TB job."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.functions.math import (
        divide,
        mod,
        normalized_difference,
    )

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame([(7.0, 0.0), (7.0, -3.0)], ["a", "b"])
    got = df.select(
        divide(F.col("a"), F.col("b")).alias("d"),
        mod(F.col("a"), F.col("b")).alias("m"),
        normalized_difference(F.col("b"), F.col("b")).alias("nd"),
    ).collect()
    assert got[0]["d"] is None and got[0]["m"] is None
    assert got[0]["nd"] is None  # (0-0)/(0+0)
    assert got[1]["d"] == pytest.approx(-7 / 3)
    assert got[1]["m"] == pytest.approx(-2.0)  # numpy sign-of-divisor

    from openeo_processes_dask_spark.functions.math import linear_scale_range

    degenerate = df.select(
        linear_scale_range(F.col("a"), 5.0, 5.0).alias("s")
    ).collect()
    assert degenerate[0]["s"] is None  # zero input range -> NULL
