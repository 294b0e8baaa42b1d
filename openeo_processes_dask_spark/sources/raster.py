"""Distributed raster (COG / Zarr) → long-format DataCube.

Reference: cubes/load.py:245-304 reads STAC raster assets through
odc.stac / rasterio / zarr into a chunked xarray. The Spark-first
re-expression: the DRIVER reads only metadata (width/height/geotransform
— a few hundred bytes of header), plans a tile grid as a small DataFrame,
and ``mapInPandas`` opens the file per partition and reads its tiles —
so a 100 GB COG decodes across the cluster, never through the driver,
and tiles stream through Arrow batches without materializing the raster.

The codec sits behind an ``opener`` adapter (RasterSource protocol:
``width``, ``height``, ``transform`` (GDAL affine 6-tuple), and
``read_window(band, col_off, row_off, w, h) -> 2D ndarray``).
``opener=None`` runtime-detects rasterio (``.tif``/``.tiff``) or zarr
(``.zarr``) — deployed environments get real COG/Zarr for free; this
container has neither, so the default raises the documented
NotImplementedError while every Spark-side piece (tile planning, Arrow
batch shape, coordinate math, schema) runs under test via a fake opener.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import SparkSession

from openeo_processes_dask_spark.cube import DataCube

#: tile edge (pixels). 512×512 float64 ≈ 2 MB per Arrow batch — small
#: against executor memory, large enough to amortize per-window IO.
DEFAULT_TILE = 512


def _rasterio_opener(href: str):
    try:
        import rasterio
    except ImportError as exc:
        raise NotImplementedError(
            "COG assets need rasterio (unavailable in this container); "
            "pass opener= or deploy with rasterio installed"
        ) from exc

    src = rasterio.open(href)

    class _Src:
        width = src.width
        height = src.height
        transform = tuple(src.transform)[:6]

        @staticmethod
        def read_window(band: int, col_off: int, row_off: int, w: int, h: int):
            from rasterio.windows import Window

            return src.read(band, window=Window(col_off, row_off, w, h))

    return _Src()


def _zarr_opener(href: str):
    try:
        import zarr
    except ImportError as exc:
        raise NotImplementedError(
            "Zarr assets need zarr (unavailable in this container); "
            "pass opener= or deploy with zarr installed"
        ) from exc

    arr = zarr.open(href, mode="r")
    ndim = arr.ndim

    class _Src:
        height, width = arr.shape[-2], arr.shape[-1]
        # zarr carries no geotransform; identity unless sidecar metadata
        transform = tuple(arr.attrs.get("transform", (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)))

        @staticmethod
        def read_window(band: int, col_off: int, row_off: int, w: int, h: int):
            sl = (slice(row_off, row_off + h), slice(col_off, col_off + w))
            if ndim == 2:
                return arr[sl]
            return arr[(band - 1, *sl)]

    return _Src()


def _default_opener(href: str):
    if href.rstrip("/").endswith(".zarr"):
        return _zarr_opener(href)
    return _rasterio_opener(href)


def load_raster(
    spark: SparkSession,
    href: str,
    band: str = "band_1",
    band_index: int = 1,
    time=None,
    tile: int = DEFAULT_TILE,
    opener: Optional[Callable] = None,
) -> DataCube:
    """One raster asset → DataCube(x, y[, t], band, value), decoded
    distributed. ``opener(href)`` must return a RasterSource (module
    docstring); None runtime-detects rasterio/zarr by extension."""
    opener = opener or _default_opener
    src = opener(href)  # DRIVER: metadata only
    width, height = int(src.width), int(src.height)
    a, b, c, d, e, f = (float(v) for v in src.transform)

    tiles = [
        (co, ro, min(tile, width - co), min(tile, height - ro))
        for ro in range(0, height, tile)
        for co in range(0, width, tile)
    ]
    n_parts = min(len(tiles), spark.sparkContext.defaultParallelism * 2)
    plan = spark.createDataFrame(
        pd.DataFrame(tiles, columns=["col_off", "row_off", "w", "h"])
    ).repartition(n_parts)

    has_t = time is not None
    t_val = pd.to_datetime(time) if has_t else None
    schema = ("x double, y double, " + ("t timestamp, " if has_t else "")
              + "band string, value double")

    def read_tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        src = None  # one open per partition, not per tile
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if src is None:
                    src = opener(href)
                arr = np.asarray(
                    src.read_window(
                        band_index, row.col_off, row.row_off, row.w, row.h
                    ),
                    dtype="float64",
                )
                rows, cols = np.mgrid[0 : row.h, 0 : row.w]
                cols = cols + row.col_off + 0.5  # pixel centers
                rows = rows + row.row_off + 0.5
                out = pd.DataFrame(
                    {
                        "x": (a * cols + b * rows + c).ravel(),
                        "y": (d * cols + e * rows + f).ravel(),
                        "band": band,
                        "value": arr.ravel(),
                    }
                )
                if has_t:
                    out.insert(2, "t", t_val)
                yield out

    df = plan.mapInPandas(read_tiles, schema=schema)
    dims = ("x", "y", "t", "band") if has_t else ("x", "y", "band")
    return DataCube(df.select(*dims, "value"), dims=dims)


#: hrefs load_stac routes to this lane
RASTER_SUFFIXES = (".tif", ".tiff", ".zarr")


def n_tiles(width: int, height: int, tile: int = DEFAULT_TILE) -> int:
    return math.ceil(width / tile) * math.ceil(height / tile)
