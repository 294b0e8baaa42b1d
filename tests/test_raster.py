"""Distributed COG/Zarr lane (sources/raster.py): tile planning, Arrow
batch shape, affine coordinate math, and schema run for real through
mapInPandas with a deterministic fake opener (cloudpickled to workers);
the codec itself stays behind the runtime-detect adapters."""

from __future__ import annotations

import json

import numpy as np
import pytest


def _make_fake_opener():
    """8x6 raster, value = 100*row + col; geotransform: 0.5° pixels
    anchored at (10, 50) with north-up (negative e). Built INSIDE a
    function so cloudpickle serializes it by value into the mapInPandas
    closure (a module-level test class would pickle by reference and fail
    to import in Spark's worker processes)."""

    class _FakeSrc:
        width = 8
        height = 6
        transform = (0.5, 0.0, 10.0, 0.0, -0.5, 50.0)

        @staticmethod
        def read_window(band, col_off, row_off, w, h):
            rows, cols = np.mgrid[row_off : row_off + h, col_off : col_off + w]
            return (100.0 * rows + cols) * band

    return lambda href: _FakeSrc()


def test_load_raster_fake_cog(spark):
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark,
        "mem://fake.tif",
        band="red",
        time="2021-06-01T00:00:00Z",
        tile=3,  # 3px tiles -> 3x2 tile grid: exercises multi-tile stitching
        opener=_make_fake_opener(),
    )
    assert cube.dims == ("x", "y", "t", "band")
    pdf = cube.df.toPandas()
    assert len(pdf) == 8 * 6
    assert set(pdf["band"]) == {"red"}
    # pixel (col=0, row=0) center -> x = 10.25, y = 49.75, value 0
    r = pdf.set_index(["x", "y"])
    assert r.loc[(10.25, 49.75)]["value"] == 0.0
    # pixel (col=7, row=5): value 507, x = 10 + 7.5*0.5, y = 50 - 5.5*0.5
    assert r.loc[(13.75, 47.25)]["value"] == 507.0
    # values are unique -> no tile overlap or gap
    assert pdf["value"].nunique() == 48


def test_load_raster_band_index(spark):
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark, "mem://fake.tif", band="nir", band_index=2, opener=_make_fake_opener()
    )
    pdf = cube.df.toPandas()
    assert cube.dims == ("x", "y", "band")
    assert pdf["value"].max() == 2 * 507.0


def test_load_raster_gated_without_codecs(spark):
    from openeo_processes_dask_spark.sources.raster import load_raster

    with pytest.raises(NotImplementedError, match="rasterio"):
        load_raster(spark, "/nonexistent/a.tif")
    with pytest.raises(NotImplementedError, match="zarr"):
        load_raster(spark, "/nonexistent/a.zarr")


def test_load_stac_routes_raster_assets(spark, tmp_path, monkeypatch):
    """A STAC item with a .tif asset routes through the raster lane; with
    no codec installed that surfaces the rasterio gate (the routing, not
    the decode, is what this asserts)."""
    from openeo_processes_dask_spark.sources.load import load_stac

    item = {
        "type": "Feature",
        "stac_version": "1.0.0",
        "id": "cog-item",
        "bbox": [0, 0, 1, 1],
        "geometry": None,
        "properties": {"datetime": "2021-01-01T00:00:00Z"},
        "assets": {"red": {"href": "band.tif"}},
    }
    p = tmp_path / "item.json"
    p.write_text(json.dumps(item))
    with pytest.raises(NotImplementedError, match="rasterio"):
        load_stac(str(p))


def test_n_tiles():
    from openeo_processes_dask_spark.sources.raster import n_tiles

    assert n_tiles(1024, 512, 512) == 2
    assert n_tiles(1025, 513, 512) == 6
    assert n_tiles(10, 10, 512) == 1
