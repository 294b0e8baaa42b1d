"""reduce_dimension / reduce_spatial vs pandas oracle (the reference's
library-equivalence pattern, reference: tests/test_reduce.py:80)."""

import numpy as np
import pytest

from openeo_processes_dask_spark.operators.reduce import (
    reduce_dimension,
    reduce_spatial,
)
from tests.conftest import assert_cubes_close


@pytest.mark.parametrize(
    "reducer,np_fn",
    [
        ("mean", "mean"),
        ("sum", "sum"),
        ("min", "min"),
        ("max", "max"),
        ("median", "median"),
        ("sd", "std"),
        ("variance", "var"),
    ],
)
def test_reduce_t(small_cube, small_pdf, reducer, np_fn):
    out = reduce_dimension(small_cube, reducer, "t")
    assert out.dims == ("x", "y", "band")
    kwargs = {"ddof": 1} if np_fn in ("std", "var") else {}
    exp = (
        small_pdf.groupby(["x", "y", "band"])["value"]
        .agg(lambda s, f=np_fn, kw=kwargs: getattr(np, f)(s.values, **kw))
        .reset_index()
    )
    assert_cubes_close(out.df, exp)


def test_reduce_product(small_cube, small_pdf):
    out = reduce_dimension(small_cube, "product", "band")
    exp = (
        small_pdf.groupby(["x", "y", "t"])["value"]
        .agg(lambda s: np.prod(s.values))
        .reset_index()
    )
    got = out.df.toPandas().sort_values(["x", "y", "t"]).reset_index(drop=True)
    exp = exp.sort_values(["x", "y", "t"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got["value"].values, exp["value"].values, rtol=1e-9, equal_nan=True
    )


def test_reduce_first_last_ordered_by_dim(small_cube, small_pdf):
    from openeo_processes_dask_spark.functions import reducers

    out = reduce_dimension(small_cube, reducers.first, "t")
    exp = (
        small_pdf.sort_values("t")
        .groupby(["x", "y", "band"])["value"]
        .first()
        .reset_index()
    )
    assert_cubes_close(out.df, exp)

    out = reduce_dimension(small_cube, reducers.last, "t")
    exp = (
        small_pdf.sort_values("t")
        .groupby(["x", "y", "band"])["value"]
        .last()
        .reset_index()
    )
    assert_cubes_close(out.df, exp)


def test_reduce_spatial(small_cube, small_pdf):
    out = reduce_spatial(small_cube, "sum")
    assert out.dims == ("t", "band")
    exp = small_pdf.groupby(["t", "band"])["value"].sum().reset_index()
    assert_cubes_close(out.df, exp)


def test_partitioning_invariance(small_cube_parts, small_pdf):
    """Multi-partition layout must give identical results
    (reference: tests/general_checks.py:48-54)."""
    out = reduce_dimension(small_cube_parts, "mean", "t")
    exp = small_pdf.groupby(["x", "y", "band"])["value"].mean().reset_index()
    assert_cubes_close(out.df, exp)


def test_quantiles_int_probabilities_means_intervals(spark):
    """Reference math.py:354-362: probabilities=4 (or [4]) means 'four
    evenly-spaced intervals' -> p = 0.25/0.5/0.75, same as q=4."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.functions.reducers import quantiles

    df = spark.createDataFrame([(float(i),) for i in range(1, 12)], ["v"])
    got_int = df.agg(quantiles(F.col("v"), probabilities=4).alias("qs")).first()["qs"]
    got_list = df.agg(quantiles(F.col("v"), probabilities=[4]).alias("qs")).first()["qs"]
    got_q = df.agg(quantiles(F.col("v"), q=4).alias("qs")).first()["qs"]
    assert got_int == got_list == got_q == [3.5, 6.0, 8.5]
