"""Shared fixtures: one local SparkSession per test session, synthetic cubes
mirroring the reference's (FIXTURES.md F1 / reference tests/mockdata.py:13).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession

from openeo_processes_dask_spark.sources.load import create_fake_rastercube


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("openeo-processes-dask-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def small_cube(spark):
    """(6, 5, 4, 4) float32 cube — the reference's apply/mask/merge fixture
    (reference: tests/test_apply.py:22-23)."""
    return create_fake_rastercube(spark, size=(6, 5, 4, 4))


@pytest.fixture(scope="session")
def small_cube_parts(spark):
    """Same cube, multi-partition — results must match the single-partition
    layout (reference: tests/general_checks.py:48-54)."""
    return create_fake_rastercube(spark, size=(6, 5, 4, 4), num_partitions=7)


@pytest.fixture(scope="session")
def small_pdf(small_cube):
    """pandas oracle copy of small_cube."""
    return small_cube.df.toPandas()


def assert_cubes_close(result_df, expected_pdf, value_col="value", rtol=1e-6):
    """Order-insensitive compare against a pandas oracle
    (tolerance per reference tests/general_checks.py:38-40)."""
    got = result_df.toPandas()
    keys = [c for c in got.columns if c != value_col]
    got = got.sort_values(keys).reset_index(drop=True)
    exp = expected_pdf.sort_values(keys).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    for k in keys:
        np.testing.assert_array_equal(got[k].values, exp[k].values, err_msg=k)
    np.testing.assert_allclose(
        got[value_col].astype(float).values,
        exp[value_col].astype(float).values,
        rtol=rtol,
        equal_nan=True,
    )


def concrete_dataframe_cls():
    """The class whose methods actually dispatch on DataFrame instances.

    PySpark 4 routes classic-mode instances through
    pyspark.sql.classic.dataframe.DataFrame; patching the public
    pyspark.sql.DataFrame facade does NOT intercept calls (its subclass
    overrides win the MRO) — a monkeypatch there is a silent no-op.
    Every test that instruments or poisons a DataFrame method must
    patch THIS class."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
        return _CDF
    except ImportError:  # older pyspark: one concrete class
        from pyspark.sql import DataFrame as _DF
        return _DF
