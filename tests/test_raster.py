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


def _make_multiband_opener(log_path=None):
    """3-band 4x4 raster, value = band*1000 + 10*row + col; band 2 carries
    nodata sentinel -999 at (0,0), per-band scale/offset metadata. When
    log_path is given, every open/close appends a line — the handle-leak
    regression gate (VERDICT r04 #5)."""

    class _FakeSrc:
        width = 4
        height = 4
        count = 3
        transform = (1.0, 0.0, 0.0, 0.0, -1.0, 4.0)
        nodatavals = (None, -999.0, None)
        scales = (1.0, 2.0, 1.0)
        offsets = (0.0, 5.0, 0.0)

        def __init__(self):
            if log_path:
                with open(log_path, "a") as fh:
                    fh.write("open\n")

        @staticmethod
        def read_window(band, col_off, row_off, w, h):
            rows, cols = np.mgrid[row_off : row_off + h, col_off : col_off + w]
            out = band * 1000.0 + 10.0 * rows + cols
            if band == 2 and col_off == 0 and row_off == 0:
                out = out.copy()
                out[0, 0] = -999.0
            return out

        def close(self):
            if log_path:
                with open(log_path, "a") as fh:
                    fh.write("close\n")

    return lambda href: _FakeSrc()


def test_load_raster_multiband_all_bands(spark):
    """band_index=None reads every band (ADVICE r04: default band_index=1
    silently dropped bands 2..n of a multiband COG)."""
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark, "mem://mb.tif", band="data", opener=_make_multiband_opener()
    )
    pdf = cube.df.toPandas()
    assert sorted(set(pdf["band"])) == ["data_b1", "data_b2", "data_b3"]
    # every band has all 16 pixels (band 2's sentinel row is NULL, not gone)
    assert len(pdf) == 3 * 16


def test_load_raster_nodata_scale_offset(spark):
    """Source metadata applies: value = raw*scale + offset, nodata→NULL,
    masked on RAW values (reference cubes/load.py:185-215)."""
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark, "mem://mb.tif", band="data", opener=_make_multiband_opener()
    )
    pdf = cube.df.toPandas().set_index(["band", "x", "y"])
    # band 1: no scaling -> raw
    assert pdf.loc[("data_b1", 0.5, 3.5)]["value"] == 1000.0
    # band 2 at (0,0) raw==-999 -> NULL
    assert pdf.loc[("data_b2", 0.5, 3.5)]["value"] is None or np.isnan(
        pdf.loc[("data_b2", 0.5, 3.5)]["value"]
    )
    # band 2 elsewhere: raw*2 + 5
    assert pdf.loc[("data_b2", 1.5, 3.5)]["value"] == 2001.0 * 2 + 5
    # band 3: raw again
    assert pdf.loc[("data_b3", 0.5, 3.5)]["value"] == 3000.0


def test_load_raster_explicit_overrides_beat_metadata(spark):
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark,
        "mem://mb.tif",
        band="one",
        band_index=1,
        scale=10.0,
        offset=1.0,
        opener=_make_multiband_opener(),
    )
    pdf = cube.df.toPandas().set_index(["x", "y"])
    assert pdf.loc[(0.5, 3.5)]["value"] == 1000.0 * 10 + 1


def test_load_raster_band_names_validates_length(spark):
    from openeo_processes_dask_spark.sources.raster import load_raster

    with pytest.raises(ValueError, match="band_names has 2"):
        load_raster(
            spark,
            "mem://mb.tif",
            band_names=["r", "g"],
            opener=_make_multiband_opener(),
        )


def test_load_raster_closes_every_open(spark, tmp_path):
    """Handle-leak gate: driver metadata probe and every per-partition
    opener must close (VERDICT r04 #5 — at a 10k-asset load an unclosed
    rasterio dataset per partition is fd exhaustion)."""
    from openeo_processes_dask_spark.sources.raster import load_raster

    log = str(tmp_path / "opens.log")
    cube = load_raster(
        spark,
        "mem://mb.tif",
        band="data",
        tile=2,  # 2x2 tile grid -> multiple partitions/opens
        opener=_make_multiband_opener(log_path=log),
    )
    cube.df.collect()
    with open(log) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    opens = lines.count("open")
    closes = lines.count("close")
    assert opens >= 2  # driver probe + at least one executor partition
    assert opens == closes


def test_load_stac_bands_match_eo_band_names(spark, tmp_path, monkeypatch):
    """load_stac(bands=["nir"]) must select the nir band INSIDE a
    multiband asset via its eo:bands names — not skip the asset because
    its key ("data") isn't in bands (reference prunes by measurement
    name, cubes/load.py:262-264)."""
    import json

    from openeo_processes_dask_spark.sources import raster as raster_mod
    from openeo_processes_dask_spark.sources.load import load_stac

    monkeypatch.setattr(
        raster_mod, "_default_opener", _make_multiband_opener()
    )
    item = {
        "type": "Feature", "stac_version": "1.0.0", "id": "mb",
        "bbox": [0, 0, 4, 4], "geometry": None,
        "properties": {"datetime": "2021-01-01T00:00:00Z"},
        "assets": {
            "data": {
                "href": "mb.tif",
                "eo:bands": [
                    {"name": "red"}, {"name": "nir"}, {"name": "swir"},
                ],
                "raster:bands": [
                    {}, {"nodata": -999.0, "scale": 2.0, "offset": 5.0}, {},
                ],
            }
        },
    }
    p = tmp_path / "i.json"
    p.write_text(json.dumps(item))
    cube = load_stac(str(p), bands=["nir"], spark=spark)
    pdf = cube.df.toPandas()
    assert set(pdf["band"]) == {"nir"}
    assert len(pdf) == 16
    vals = pdf.set_index(["x", "y"])["value"]
    # band 2 scaled: raw*2 + 5; sentinel at (row 0, col 0) -> NULL
    assert vals.loc[(1.5, 3.5)] == 2001.0 * 2 + 5
    import numpy as np

    assert np.isnan(vals.loc[(0.5, 3.5)]) or vals.loc[(0.5, 3.5)] is None

    # asset-key selection still works and yields all three bands
    cube2 = load_stac(str(p), bands=["data"], spark=spark)
    assert set(cube2.df.toPandas()["band"]) == {"red", "nir", "swir"}
