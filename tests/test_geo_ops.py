"""resample / ndvi / kernel / udf / neighborhood tests vs NumPy oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.cube import DataCube
from openeo_processes_dask_spark.operators.indices import ndvi
from openeo_processes_dask_spark.operators.kernel import (
    apply_kernel,
    apply_neighborhood,
    convolve2d,
)
from openeo_processes_dask_spark.operators.resample import (
    resample_cube_temporal,
    resample_spatial,
)
from openeo_processes_dask_spark.operators.udf import run_udf


def test_convolve2d_identity_and_sum():
    g = np.arange(12, dtype="float64").reshape(3, 4)
    ident = np.zeros((3, 3)); ident[1, 1] = 1
    np.testing.assert_allclose(convolve2d(g, ident), g)
    box = np.ones((3, 3))
    out = convolve2d(g, box, border="replicate")
    # center cell (1,1): full 3x3 neighborhood sum
    assert out[1, 1] == g[0:3, 0:3].sum()


def test_apply_kernel_identity(small_cube, small_pdf):
    out = apply_kernel(small_cube, [[0, 0, 0], [0, 1, 0], [0, 0, 0]], factor=2.0)
    got = out.df.toPandas().sort_values(["x", "y", "t", "band"]).reset_index(drop=True)
    exp = small_pdf.assign(value=small_pdf.value * 2.0).sort_values(
        ["x", "y", "t", "band"]
    ).reset_index(drop=True)
    np.testing.assert_allclose(got.value.values, exp.value.values, rtol=1e-9)


def test_apply_neighborhood_rolling_mean(small_cube, small_pdf):
    out = apply_neighborhood(small_cube, "mean", "t", size=3)
    exp = small_pdf.sort_values("t").copy()
    exp["value"] = (
        exp.groupby(["x", "y", "band"])["value"]
        .transform(lambda s: s.rolling(3, center=True, min_periods=1).mean())
    )
    got = out.df.toPandas().sort_values(["x", "y", "band", "t"]).reset_index(drop=True)
    exp = exp.sort_values(["x", "y", "band", "t"]).reset_index(drop=True)
    np.testing.assert_allclose(got.value.values, exp.value.values, rtol=1e-9)


def test_ndvi(small_cube, small_pdf):
    out = ndvi(small_cube, nir="B08", red="B04")
    assert out.dims == ("x", "y", "t")
    piv = small_pdf.pivot_table(
        index=["x", "y", "t"], columns="band", values="value", aggfunc="first"
    ).reset_index()
    piv["value"] = (piv.B08 - piv.B04) / (piv.B08 + piv.B04)
    got = out.df.toPandas().sort_values(["x", "y", "t"]).reset_index(drop=True)
    exp = piv.sort_values(["x", "y", "t"]).reset_index(drop=True)
    np.testing.assert_allclose(got.value.values, exp.value.values, rtol=1e-6)


def test_ndvi_target_band(small_cube):
    out = ndvi(small_cube, nir="B08", red="B04", target_band="NDVI")
    bands = {r[0] for r in out.df.select("band").distinct().collect()}
    assert bands == {"B02", "B03", "B04", "B08", "NDVI"}


def test_resample_spatial_mean(small_cube, small_pdf):
    out = resample_spatial(small_cube, resolution=0.02, method="mean")
    pdf = small_pdf.copy()
    # HALF_UP like Spark's F.round (numpy .round() is banker's rounding)
    pdf["x"] = np.floor(pdf.x / 0.02 + 0.5) * 0.02
    pdf["y"] = np.floor(pdf.y / 0.02 + 0.5) * 0.02
    exp = pdf.groupby(["x", "y", "t", "band"])["value"].mean().reset_index()
    assert out.df.count() == len(exp)
    got = (
        out.df.toPandas().sort_values(["x", "y", "t", "band"]).reset_index(drop=True)
    )
    exp = exp.sort_values(["x", "y", "t", "band"]).reset_index(drop=True)
    np.testing.assert_allclose(got.value.values, exp.value.values, rtol=1e-9)


def test_resample_cube_temporal(spark, small_cube):
    from openeo_processes_dask_spark.operators.aggregate import (
        aggregate_temporal_period,
    )

    target = aggregate_temporal_period(small_cube, "month", "mean")
    out = resample_cube_temporal(small_cube, target)
    # output times must be exactly the target's labels
    got_ts = {r[0] for r in out.df.select("t").distinct().collect()}
    tgt_ts = {r[0] for r in target.df.select("t").distinct().collect()}
    assert got_ts <= tgt_ts
    # each (x, y, band, target_t) cell holds the value of the nearest source t
    row = out.df.orderBy("x", "y", "band", "t").first()
    assert row is not None


def test_run_udf(small_cube, small_pdf):
    # FIXTURES.md F7: cube + 1
    udf = "def apply_datacube(cube, context):\n    return cube + 1\n"
    out = run_udf(small_cube, udf)
    got = out.df.toPandas().sort_values(["x", "y", "t", "band"]).reset_index(drop=True)
    exp = small_pdf.assign(value=small_pdf.value + 1).sort_values(
        ["x", "y", "t", "band"]
    ).reset_index(drop=True)
    np.testing.assert_allclose(got.value.values, exp.value.values, rtol=1e-9)


def test_apply_kernel_tiled_matches_untiled(small_cube):
    """Halo-tiled scale path must be cell-identical to the whole-slice
    path (interior cells see real neighbors through the halo)."""
    k = [[1, 1, 1], [1, 2, 1], [1, 1, 1]]
    whole = apply_kernel(small_cube, k, border="0")
    tiled = apply_kernel(small_cube, k, border="0", tile_size=3)
    w = whole.df.toPandas().sort_values(["x", "y", "t", "band"]).reset_index(drop=True)
    t = tiled.df.toPandas().sort_values(["x", "y", "t", "band"]).reset_index(drop=True)
    assert len(w) == len(t)
    np.testing.assert_allclose(w.value.values, t.value.values, rtol=1e-12)


def test_resample_cube_spatial_nearest(spark, small_cube):
    from openeo_processes_dask_spark.operators.resample import (
        resample_cube_spatial,
    )

    coarse = resample_spatial(small_cube, resolution=0.02, method="mean")
    out = resample_cube_spatial(small_cube, coarse, method="mean")
    # output grid must be exactly the target's labels
    got_x = {r[0] for r in out.df.select("x").distinct().collect()}
    tgt_x = {r[0] for r in coarse.df.select("x").distinct().collect()}
    assert got_x == tgt_x
    # every source pixel lands in exactly one target cell: count preserved
    # through the mean per cell times cells <= source count
    assert 0 < out.df.count() <= small_cube.df.count()


def test_filter_spatial(small_cube, small_pdf):
    from openeo_processes_dask_spark.operators.filters import filter_spatial

    poly = {
        "type": "Polygon",
        "coordinates": [[
            [10.465, 46.115], [10.485, 46.115], [10.485, 46.165],
            [10.465, 46.165], [10.465, 46.115],
        ]],
    }
    out = filter_spatial(small_cube, poly)
    inside = (
        (small_pdf.x > 10.465) & (small_pdf.x < 10.485)
        & (small_pdf.y > 46.115) & (small_pdf.y < 46.165)
    )
    assert out.df.count() == int(inside.sum())


def test_create_data_cube(spark):
    from openeo_processes_dask_spark.operators.general import create_data_cube

    cube = create_data_cube(spark)
    assert cube.df.count() == 0 and cube.dims == ()
