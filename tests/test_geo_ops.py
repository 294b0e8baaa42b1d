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


def _ones_cube(spark, nx, ny):
    rows = [(float(x), float(y), "b", 1.0) for x in range(nx) for y in range(ny)]
    return DataCube(
        spark.createDataFrame(rows, "x double, y double, band string, value double"),
        dims=("x", "y", "band"),
    )


def _nbh(cube, reducer, **kw):
    from openeo_processes_dask_spark.operators.kernel import apply_neighborhood

    return {
        (r["x"], r["y"]): r["value"]
        for r in apply_neighborhood(cube, reducer, **kw).df.collect()
    }


def test_apply_neighborhood_reference_stride_semantics(spark):
    """Reference-faithful strided windows: expectations lifted verbatim
    from the reference's test_apply_neighborhood_intertwin.py."""
    # 5x5 ones, size 2x2 -> stride 2, centers {0,2,4}, per-dim sums [1,2,2]
    out = _nbh(_ones_cube(spark, 5, 5), "sum", size={"x": 2, "y": 2})
    assert out == {
        (float(i), float(j)): a * b
        for i, a in zip((0, 2, 4), (1.0, 2.0, 2.0))
        for j, b in zip((0, 2, 4), (1.0, 2.0, 2.0))
    }
    # 4x4: truncates -> centers {0,2}, [[1,2],[2,4]]
    out = _nbh(_ones_cube(spark, 4, 4), "sum", size={"x": 2, "y": 2})
    assert out == {(0.0, 0.0): 1.0, (0.0, 2.0): 2.0, (2.0, 0.0): 2.0, (2.0, 2.0): 4.0}
    # size 1 + overlap 1 -> w=3, stride 2: [[4,6],[6,9]]
    out = _nbh(
        _ones_cube(spark, 4, 4), "sum",
        size={"x": 1, "y": 1}, overlap={"x": 1, "y": 1},
    )
    assert out == {(0.0, 0.0): 4.0, (0.0, 2.0): 6.0, (2.0, 0.0): 6.0, (2.0, 2.0): 9.0}
    # non-square overlap: x w=3/stride 2, y w=5/stride 3: [[6,6],[9,9]]
    out = _nbh(
        _ones_cube(spark, 4, 4), "sum",
        size={"x": 1, "y": 1}, overlap={"x": 1, "y": 2},
    )
    assert out == {(0.0, 0.0): 6.0, (0.0, 3.0): 6.0, (2.0, 0.0): 9.0, (2.0, 3.0): 9.0}
    # negative size -1 + overlap 2 -> w=3, stride 1: the dense rolling form
    out = _nbh(
        _ones_cube(spark, 4, 4), "sum",
        size={"x": -1, "y": -1}, overlap={"x": 2, "y": 2},
    )
    assert out[(1.0, 1.0)] == 9.0 and out[(0.0, 0.0)] == 4.0 and out[(0.0, 1.0)] == 6.0


def test_apply_neighborhood_2d_dense_mean(spark):
    """Dense 3x3 mean (reference size<=0+overlap spelling) matches
    hand-computed neighborhood means incl. NaN-skipping edges."""
    rows = [
        (float(x), float(y), "b", float(x * 3 + y))
        for x in range(3)
        for y in range(3)
    ]
    cube = DataCube(
        spark.createDataFrame(rows, "x double, y double, band string, value double"),
        dims=("x", "y", "band"),
    )
    out = _nbh(cube, "mean", size={"x": -1, "y": -1}, overlap={"x": 2, "y": 2})
    assert len(out) == 9
    assert out[(1.0, 1.0)] == pytest.approx(4.0)  # full 3x3: mean of 0..8
    assert out[(0.0, 0.0)] == pytest.approx((0 + 1 + 3 + 4) / 4)  # corner
    with pytest.raises(ValueError):
        apply_neighborhood(cube, "mean", size={"x": 0, "y": 0})


def test_apply_neighborhood_2d_separable_matches_fanout(spark, monkeypatch):
    """The separable window plan (sum/min/max/count/mean) must agree with
    the holistic center-explode plan on a dense stride-1 rolling window,
    nulls included."""
    import openeo_processes_dask_spark.operators.kernel as K

    rows = [
        (float(x), float(y), "b", None if (x, y) == (1, 2) else float(x * 5 + y))
        for x in range(4)
        for y in range(5)
    ]
    cube = DataCube(
        spark.createDataFrame(rows, "x double, y double, band string, value double"),
        dims=("x", "y", "band"),
    )
    dense = dict(size={"x": -1, "y": -1}, overlap={"x": 2, "y": 2})
    for red in sorted(K._SEPARABLE_ND):
        sep = {
            (r["x"], r["y"]): r["value"]
            for r in K.apply_neighborhood(cube, red, **dense).df.collect()
        }
        monkeypatch.setattr(K, "_SEPARABLE_ND", frozenset())
        fan = {
            (r["x"], r["y"]): r["value"]
            for r in K.apply_neighborhood(cube, red, **dense).df.collect()
        }
        monkeypatch.undo()
        assert sep.keys() == fan.keys(), red
        for k in fan:
            if fan[k] is None:
                assert sep[k] is None, (red, k)
            else:
                assert sep[k] == pytest.approx(fan[k]), (red, k)


def test_resample_cube_spatial_near_deterministic(spark):
    """method='near' (ADVICE r01): colliding sources must not collapse via
    unordered first(), and every target label must be covered — mapping is
    target→nearest-source, one deterministic source per target."""
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.resample import (
        resample_cube_spatial,
    )

    src = DataCube(
        spark.createDataFrame(
            [(float(x), 0.0, "b", float(10 + x)) for x in range(4)],
            "x double, y double, band string, value double",
        ),
        dims=("x", "y", "band"),
    )
    # target 0 -> source 0, target 3 -> source 3 (sources 1, 2 unused);
    # target 10 is nearest to NO source's own snap but must still be fed
    # by its nearest source (3) — the old source->target direction dropped it
    tgt = DataCube(
        spark.createDataFrame(
            [(0.0, 0.0, "b", 0.0), (3.0, 0.0, "b", 0.0), (10.0, 0.0, "b", 0.0)],
            "x double, y double, band string, value double",
        ),
        dims=("x", "y", "band"),
    )
    out = resample_cube_spatial(src, tgt, method="near")
    got = {
        (r["x"], r["value"]) for r in out.df.collect()
    }
    assert got == {(0.0, 10.0), (3.0, 13.0), (10.0, 13.0)}


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


def test_crs_transforms(spark):
    """Native Web Mercator: known anchor values + column/scalar agreement
    + roundtrip identity (EPSG Guidance Note 7-2 formulas)."""
    from openeo_processes_dask_spark.functions import crs

    # anchors: equator origin, and the +/-180 meridian edge value
    ox, oy = crs.transform_xy_scalar(0.0, 0.0, "EPSG:4326", "EPSG:3857")
    assert ox == 0.0 and oy == pytest.approx(0.0, abs=1e-8)
    mx, my = crs.transform_xy_scalar(180.0, 0.0, "EPSG:4326", "EPSG:3857")
    assert mx == pytest.approx(20037508.342789244)
    _, my85 = crs.transform_xy_scalar(0.0, 85.06, "EPSG:4326", "EPSG:3857")
    assert my85 == pytest.approx(20048966.1, abs=2e4)

    df = spark.createDataFrame(
        [(lon, lat) for lon in (-179.5, -30.0, 0.0, 45.5, 179.5)
         for lat in (-84.0, -10.0, 0.0, 33.3, 84.0)],
        "lon double, lat double",
    )
    from pyspark.sql import functions as F
    x, y = crs.transform_xy_cols(F.col("lon"), F.col("lat"), "EPSG:4326", "EPSG:3857")
    back_lon, back_lat = crs.transform_xy_cols(x, y, "EPSG:3857", "EPSG:4326")
    rows = df.select("lon", "lat", x.alias("mx"), y.alias("my"),
                     back_lon.alias("bl"), back_lat.alias("bt")).collect()
    for r in rows:
        smx, smy = crs.transform_xy_scalar(r["lon"], r["lat"], "4326", "3857")
        assert r["mx"] == pytest.approx(smx, rel=1e-12)
        assert r["my"] == pytest.approx(smy, rel=1e-12)
        assert r["bl"] == pytest.approx(r["lon"], rel=1e-12)
        assert r["bt"] == pytest.approx(r["lat"], rel=1e-12)

    # non-UTM, non-Mercator pairs stay gated (Lambert-93 needs pyproj)
    with pytest.raises(NotImplementedError):
        crs.transform_xy_scalar(0, 0, "EPSG:4326", "EPSG:2154")


def test_crs_utm(spark):
    """UTM via the Krüger/Karney series: published anchor (CN Tower,
    Wikipedia UTM article: 43.642567N 79.387139W -> 17N 630084 E
    4833438 N), southern-hemisphere false northing, column/scalar parity,
    roundtrip identity."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.functions import crs

    e, n = crs.transform_xy_scalar(
        -79.387139, 43.642567, "EPSG:4326", "EPSG:32617"
    )
    assert e == pytest.approx(630084, abs=1.0)
    assert n == pytest.approx(4833438, abs=1.5)
    lon, lat = crs.transform_xy_scalar(e, n, "EPSG:32617", "EPSG:4326")
    assert lon == pytest.approx(-79.387139, abs=1e-6)
    assert lat == pytest.approx(43.642567, abs=1e-6)

    # south: false northing 10^7, zone 56 (Sydney)
    e2, n2 = crs.transform_xy_scalar(
        151.2149, -33.8574, "EPSG:4326", "EPSG:32756"
    )
    assert 0 < e2 < 1_000_000 and 6_000_000 < n2 < 7_000_000

    df = spark.createDataFrame(
        [(lon, lat) for lon in (6.5, 9.0, 11.9) for lat in (-45.0, 0.5, 60.0)],
        "lon double, lat double",
    )
    x, y = crs.transform_xy_cols(
        F.col("lon"), F.col("lat"), "EPSG:4326", "EPSG:32632"
    )
    bl, bt = crs.transform_xy_cols(x, y, "EPSG:32632", "EPSG:4326")
    for r in df.select(
        "lon", "lat", x.alias("e"), y.alias("n"),
        bl.alias("bl"), bt.alias("bt"),
    ).collect():
        se, sn = crs.transform_xy_scalar(
            r["lon"], r["lat"], "EPSG:4326", "EPSG:32632"
        )
        assert r["e"] == pytest.approx(se, rel=1e-12)
        assert r["n"] == pytest.approx(sn, rel=1e-12)
        assert r["bl"] == pytest.approx(r["lon"], abs=2e-6)
        assert r["bt"] == pytest.approx(r["lat"], abs=2e-6)


def test_vector_reproject_roundtrip(spark):
    import json

    from openeo_processes_dask_spark.operators.vector import (
        load_geojson,
        vector_reproject,
    )

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "p1",
                "geometry": {"type": "Point", "coordinates": [12.5, 41.9]},
                "properties": {},
            },
            {
                "type": "Feature",
                "id": "poly",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
                },
                "properties": {},
            },
        ],
    }
    vc = load_geojson(spark, fc)
    merc = vector_reproject(vc, "EPSG:3857")
    back = vector_reproject(merc, "EPSG:4326", crs="EPSG:3857")
    got = {r["feature_id"]: json.loads(r["geometry"]) for r in back.collect()}
    np.testing.assert_allclose(got["p1"]["coordinates"], [12.5, 41.9], rtol=1e-12)
    np.testing.assert_allclose(
        got["poly"]["coordinates"],
        fc["features"][1]["geometry"]["coordinates"],
        atol=1e-9,
    )


def test_resample_spatial_mercator_warp(spark, small_cube):
    """Warped resample: output grid labels are Mercator multiples of the
    resolution and the CRS metadata updates."""
    out = resample_spatial(
        small_cube, resolution=1000.0, projection="EPSG:3857", method="mean"
    )
    assert out.meta.crs == "EPSG:3857"
    xs = [r[0] for r in out.df.select("x").distinct().collect()]
    assert xs and all(abs(v / 1000.0 - round(v / 1000.0)) < 1e-9 for v in xs)


def test_resample_spatial_average_alias_and_unknown_method(spark, small_cube):
    """'average' is the reference's name for mean; unknown methods raise
    the reference-style ValueError (cubes/resample.py:66-79)."""
    avg = resample_spatial(small_cube, resolution=2.0, method="average")
    mean = resample_spatial(small_cube, resolution=2.0, method="mean")
    got = {tuple(r[:-1]): r[-1] for r in avg.df.collect()}
    want = {tuple(r[:-1]): r[-1] for r in mean.df.collect()}
    assert got == want
    with pytest.raises(ValueError, match="not available"):
        resample_spatial(small_cube, resolution=2.0, method="nope")


def test_resample_spatial_cubic_linear_field(spark):
    """Catmull-Rom bicubic reproduces a linear field exactly at interior
    targets (defining property of the a=-0.5 Keys kernel); clamped edges
    stay within the field's range."""
    rows = [
        (float(x), float(y), "b", 2.0 * x + 3.0 * y)
        for x in range(8)
        for y in range(6)
    ]
    cube = DataCube(
        spark.createDataFrame(rows, "x double, y double, band string, value double"),
        dims=("x", "y", "band"),
    )
    out = resample_spatial(cube, resolution=0.5, method="cubic")
    for r in out.df.collect():
        exp = 2.0 * r["x"] + 3.0 * r["y"]
        if 1 <= r["x"] <= 6 and 1 <= r["y"] <= 4:  # full 4x4 support
            assert r["value"] == pytest.approx(exp, abs=1e-9), (r["x"], r["y"])
        else:
            assert abs(r["value"] - exp) < 1.5


def test_resample_spatial_mode_rms(spark):
    rows = [
        (0.1, 0.0, "b", 5.0), (0.2, 0.0, "b", 5.0), (0.3, 0.0, "b", 7.0),
        (10.1, 0.0, "b", 1.0), (10.2, 0.0, "b", 2.0),
    ]
    cube = DataCube(
        spark.createDataFrame(rows, "x double, y double, band string, value double"),
        dims=("x", "y", "band"),
    )
    mode = {r["x"]: r["value"] for r in
            resample_spatial(cube, 10.0, method="mode").df.collect()}
    assert mode == {0.0: 5.0, 10.0: 1.0}  # tie at x=10 -> smallest value
    rms = {r["x"]: r["value"] for r in
           resample_spatial(cube, 10.0, method="rms").df.collect()}
    assert rms[0.0] == pytest.approx(((25 + 25 + 49) / 3) ** 0.5)
    assert rms[10.0] == pytest.approx((2.5) ** 0.5)


def test_resample_spatial_bilinear_linear_field(spark):
    """Bilinear interpolation of a linear field v = 2x + 3y reproduces the
    field exactly at every target point (the defining property)."""
    rows = [
        (float(x), float(y), "b", 2.0 * x + 3.0 * y)
        for x in range(5)
        for y in range(4)
    ]
    cube = DataCube(
        spark.createDataFrame(rows, "x double, y double, band string, value double"),
        dims=("x", "y", "band"),
    )
    out = resample_spatial(cube, resolution=0.5, method="bilinear")
    got = out.df.collect()
    # targets at 0, 0.5, ..., 4.0 x 0, 0.5, ..., 3.0
    assert len(got) == 9 * 7
    for r in got:
        assert r["value"] == pytest.approx(2.0 * r["x"] + 3.0 * r["y"], abs=1e-9), (
            r["x"], r["y"])


def test_resample_spatial_gauss(spark, small_cube):
    """'gauss' (σ=1 truncated Gaussian): constant fields are reproduced
    exactly (weights renormalize), and at integer-aligned interior targets
    the symmetric kernel preserves linear fields."""
    const = small_cube.with_df(small_cube.df.withColumn("value", F.lit(7.0)))
    out = resample_spatial(const, resolution=2.0, method="gauss")
    vals = [r["value"] for r in out.df.collect()]
    assert vals and all(abs(v - 7.0) < 1e-12 for v in vals)
    with pytest.raises(ValueError, match="not available"):
        resample_spatial(small_cube, resolution=2.0, method="nope")


def test_resample_spatial_gauss_linear_interior(spark):
    """Linear field f(x,y)=x on a 9-wide grid, resolution == step: the
    symmetric gauss taps cancel at interior aligned targets."""
    from openeo_processes_dask_spark.cube import DataCube

    rows = [(float(x), float(y), "b", float(x)) for x in range(9) for y in range(3)]
    df = spark.createDataFrame(rows, "x double, y double, band string, value double")
    cube = DataCube(df, dims=("x", "y", "band"),
                    roles={"x": "x", "y": "y", "band": "bands"})
    out = resample_spatial(cube, resolution=1.0, method="gauss")
    got = {(r["x"], r["y"]): r["value"] for r in out.df.collect()}
    for (x, y), v in got.items():
        if 2 <= x <= 6 and y == 1:  # interior in x; y clamps don't matter for f=x
            assert abs(v - x) < 1e-9, (x, y, v)


def test_pyproj_fallback_lane(spark, monkeypatch):
    """Runtime-detect pyproj lane (reference parity: cubes/resample.py:
    39-113): with a fake pyproj installed, non-native pairs transform via
    Transformer.from_crs instead of raising. Driver-side only — executor
    workers are separate processes, so the Column lane is asserted up to
    dispatch (returns Columns, no raise), and the numpy/scalar lane
    end-to-end."""
    import sys
    import types

    calls = {}

    class _FakeTransformer:
        @classmethod
        def from_crs(cls, src, dst, always_xy=False):
            calls["pair"] = (str(src), str(dst), always_xy)
            return cls()

        def transform(self, x, y):
            return x + 1000.0, y + 2000.0

    fake = types.ModuleType("pyproj")
    fake.Transformer = _FakeTransformer
    monkeypatch.setitem(sys.modules, "pyproj", fake)

    from openeo_processes_dask_spark.functions import crs

    # scalar/numpy lane end-to-end
    ox, oy = crs.transform_xy_scalar(10.0, 20.0, "EPSG:4326", "EPSG:2154")
    assert (ox, oy) == (1010.0, 2020.0)
    assert calls["pair"] == ("EPSG:4326", "EPSG:2154", True)
    arr_x, arr_y = crs.transform_xy_np(
        np.array([1.0, 2.0]), np.array([3.0, 4.0]), "EPSG:4326", "EPSG:2154"
    )
    np.testing.assert_allclose(arr_x, [1001.0, 1002.0])
    np.testing.assert_allclose(arr_y, [2003.0, 2004.0])
    # column lane: dispatch succeeds (no NotImplementedError) and yields Columns
    from pyspark.sql import Column, functions as F

    cx, cy = crs.transform_xy_cols(
        F.col("x"), F.col("y"), "EPSG:4326", "EPSG:2154"
    )
    assert isinstance(cx, Column) and isinstance(cy, Column)
    # native pairs must NOT touch pyproj
    calls.clear()
    crs.transform_xy_scalar(0.0, 0.0, "EPSG:4326", "EPSG:3857")
    assert not calls


def test_vector_reproject_utm(spark):
    """vector_reproject on a 4326->UTM pair must apply the Krüger transform
    (it previously fell through to the inverse-Mercator branch for any
    non-3857 target and produced silently wrong coordinates)."""
    import json as _json

    from openeo_processes_dask_spark.functions import crs
    from openeo_processes_dask_spark.operators.vector import (
        load_geojson,
        vector_reproject,
    )

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "cn-tower",
                "geometry": {
                    "type": "Point",
                    "coordinates": [-79.387139, 43.642567],
                },
                "properties": {},
            }
        ],
    }
    out = vector_reproject(load_geojson(spark, fc), "EPSG:32617")
    geom = _json.loads(out.collect()[0]["geometry"])
    e, n = geom["coordinates"]
    se, sn = crs.transform_xy_scalar(
        -79.387139, 43.642567, "EPSG:4326", "EPSG:32617"
    )
    assert e == pytest.approx(se, rel=1e-12)
    assert n == pytest.approx(sn, rel=1e-12)
    # published anchor: CN Tower -> 17N 630084 E, 4833438 N
    assert e == pytest.approx(630084, abs=1.0)
    assert n == pytest.approx(4833438, abs=1.5)
