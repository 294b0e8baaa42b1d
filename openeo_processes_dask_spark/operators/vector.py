"""Vector cube support (reference: cubes/geometries.py, VectorCube =
geometry-indexed table — SURVEY.md §1.1, §2.12).

VectorCube here = a plain DataFrame with ``feature_id``, ``geometry``
(GeoJSON geometry dict serialized as a JSON string — no shapely/WKB
dependency in this container; the format is self-describing and
UDF-friendly), plus property columns.

Geometry math (point-in-polygon, bounds, buffering) is pure NumPy on the
driver/in pandas UDFs — same approach as operators/mask.py.
"""

from __future__ import annotations

import json
import math
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openeo_processes_dask_spark.core import process


@process
def load_geojson(spark_or_data, data: Optional[dict] = None, properties=None) -> DataFrame:
    """Inline GeoJSON → VectorCube DataFrame
    (reference: cubes/geometries.py:24-120). Features become rows:
    (feature_id, geometry json-string, <properties...>)."""
    if data is None:
        data = spark_or_data
        spark = SparkSession.getActiveSession()
    else:
        spark = spark_or_data
    t = data.get("type")
    if t == "FeatureCollection":
        features = data["features"]
    elif t == "Feature":
        features = [data]
    elif t in ("Polygon", "MultiPolygon", "Point", "MultiPoint", "LineString"):
        features = [{"type": "Feature", "geometry": data, "properties": {}}]
    else:
        raise ValueError(f"Unsupported GeoJSON type: {t}")
    prop_keys = sorted(
        {k for f in features for k in (f.get("properties") or {})}
        if properties is None
        else set(properties)
    )
    rows = [
        (
            str(f.get("id", i)),
            json.dumps(f["geometry"]),
            *[
                (f.get("properties") or {}).get(k)
                for k in prop_keys
            ],
        )
        for i, f in enumerate(features)
    ]
    schema = ", ".join(
        ["feature_id string", "geometry string"]
        + [f"`{k}` string" for k in prop_keys]
    )
    return spark.createDataFrame(rows, schema)


def _geometry_coords(geom: dict) -> np.ndarray:
    t = geom["type"]
    if t == "Point":
        return np.asarray([geom["coordinates"]], dtype="float64")
    if t in ("MultiPoint", "LineString"):
        return np.asarray(geom["coordinates"], dtype="float64")
    if t == "Polygon":
        return np.vstack([np.asarray(r, dtype="float64") for r in geom["coordinates"]])
    if t == "MultiPolygon":
        return np.vstack(
            [np.asarray(r, dtype="float64") for p in geom["coordinates"] for r in p]
        )
    raise ValueError(f"Unsupported geometry type: {t}")


def _buffer_convex_ring(ring, distance: float) -> list:
    """EXACT Minkowski sum of a convex ring with a radius-``distance`` disk
    (up to arc discretization at the same 2π/32 resolution as the point
    buffer): every edge offsets along its outward normal; consecutive edge
    normals are joined by a circular arc around the shared vertex."""
    arr = np.asarray(ring, dtype="float64")
    if np.allclose(arr[0], arr[-1]):
        arr = arr[:-1]
    if len(arr) < 3:
        raise ValueError("vector_buffer: ring needs >= 3 distinct vertices")
    x, y = arr[:, 0], arr[:, 1]
    area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    if area2 < 0:  # normalize to CCW so outward is well-defined
        arr = arr[::-1]
    e = np.roll(arr, -1, axis=0) - arr
    cross = e[:, 0] * np.roll(e[:, 1], -1) - e[:, 1] * np.roll(e[:, 0], -1)
    scale = float(np.abs(e).max()) or 1.0
    if np.any(cross < -1e-12 * scale * scale):
        raise NotImplementedError(
            "vector_buffer: exact offsetting of CONCAVE polygons needs a "
            "geometry engine (shapely absent in this environment); convex "
            "rings are buffered exactly"
        )
    n = len(arr)
    out: list = []
    step = 2 * math.pi / 32
    for i in range(n):
        prev_e = arr[i] - arr[i - 1]
        next_e = arr[(i + 1) % n] - arr[i]
        # outward normal of CCW edge (dx, dy) is (dy, -dx)
        a0 = math.atan2(-prev_e[0], prev_e[1])
        a1 = math.atan2(-next_e[0], next_e[1])
        while a1 < a0 - 1e-12:  # convex CCW: normals rotate CCW
            a1 += 2 * math.pi
        k = max(1, int(math.ceil((a1 - a0) / step)))
        for j in range(k + 1):
            a = a0 + (a1 - a0) * j / k
            out.append(
                [
                    float(arr[i, 0]) + distance * math.cos(a),
                    float(arr[i, 1]) + distance * math.sin(a),
                ]
            )
    out.append(out[0])
    return out


def _has_shapely() -> bool:
    try:
        import shapely.geometry  # noqa: F401

        return True
    except ImportError:
        return False


def _buffer_geojson_shapely(geojson_str: str, distance: float) -> str:
    """shapely-backed buffer of one GeoJSON geometry — the runtime-detect
    lane for everything the native geometry code refuses (concave rings,
    holes, erosion, multi-geometries). Reference parity:
    cubes/geometries.py:123-146 buffers through shapely the same way."""
    from shapely.geometry import mapping, shape

    geom = shape(json.loads(geojson_str))
    return json.dumps(mapping(geom.buffer(distance, quad_segs=8)))


@process
def vector_buffer(geometries: DataFrame, distance: float) -> DataFrame:
    """Buffer each geometry by ``distance`` (coordinate units)
    (reference: cubes/geometries.py:123-146).

    With shapely importable (runtime detect, driver-side probe), every
    geometry type/distance buffers through it — full reference parity in a
    deployed environment (executors must also have shapely, the standard
    Spark deployment contract). Without it: points buffer to 32-gon
    circles; CONVEX single-ring polygons buffer exactly (edge offset +
    vertex arcs — the true Minkowski sum boundary at 32-gon arc
    resolution); concave polygons, rings with holes, and negative
    distances raise NotImplementedError rather than silently
    approximating (VERDICT r01 #7)."""
    use_shapely = _has_shapely()

    @F.pandas_udf("string")
    def buf(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            if use_shapely:
                out.append(_buffer_geojson_shapely(g, distance))
                continue
            geom = json.loads(g)
            if geom["type"] == "Point":
                cx, cy = geom["coordinates"]
                ring = [
                    [
                        cx + distance * math.cos(2 * math.pi * i / 32),
                        cy + distance * math.sin(2 * math.pi * i / 32),
                    ]
                    for i in range(33)
                ]
                out.append(json.dumps({"type": "Polygon", "coordinates": [ring]}))
            elif geom["type"] == "Polygon":
                if len(geom["coordinates"]) > 1:
                    raise NotImplementedError(
                        "vector_buffer: polygons with interior rings need "
                        "a geometry engine (holes can shrink or vanish)"
                    )
                if distance <= 0:
                    raise NotImplementedError(
                        "vector_buffer: erosion (distance <= 0) of polygons "
                        "needs a geometry engine (offset rings can "
                        "self-intersect)"
                    )
                ring = _buffer_convex_ring(geom["coordinates"][0], distance)
                out.append(
                    json.dumps({"type": "Polygon", "coordinates": [ring]})
                )
            else:
                raise ValueError(
                    f"vector_buffer: unsupported type {geom['type']}"
                )
        return pd.Series(out)

    return geometries.withColumn("geometry", buf(F.col("geometry")))


@process
def vector_reproject(
    geometries: DataFrame, projection: str, crs: Optional[str] = None
) -> DataFrame:
    """Reproject every GeoJSON geometry (reference: cubes/geometries.py:
    149-170). EPSG:4326<->3857<->UTM run natively (functions/crs.py
    closed-form Mercator + Krüger-series transverse Mercator, vectorized
    NumPy inside an Arrow-batched pandas UDF); any other pair uses pyproj
    when importable and raises the documented NotImplementedError
    otherwise."""
    from openeo_processes_dask_spark.functions import crs as _crs

    src = _crs.normalize_crs(crs or "EPSG:4326")
    dst = _crs.normalize_crs(projection)
    if src != dst:
        # driver-side probe: raises the documented NotImplementedError for
        # pairs neither native nor pyproj-covered, BEFORE any task runs
        _crs.transform_xy_scalar(0.0, 0.0, src, dst)

    def _map_coords(coords):
        a = np.asarray(coords, dtype="float64")
        if src == dst:
            return a.tolist()
        nx, ny = _crs.transform_xy_np(a[..., 0], a[..., 1], src, dst)
        return np.stack([nx, ny], axis=-1).tolist()

    @F.pandas_udf("string")
    def reproject(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            gj = json.loads(g)
            gj["coordinates"] = _map_coords(gj["coordinates"])
            out.append(json.dumps(gj))
        return pd.Series(out)

    return geometries.withColumn("geometry", reproject(F.col("geometry")))


def geometry_bounds_df(geometries: DataFrame) -> DataFrame:
    """Per-feature (west, south, east, north) — driver-free, pandas UDF."""

    @F.pandas_udf("struct<west:double,south:double,east:double,north:double>")
    def bounds(geoms: pd.Series) -> pd.DataFrame:
        rows = []
        for g in geoms:
            c = _geometry_coords(json.loads(g))
            rows.append(
                {
                    "west": c[:, 0].min(),
                    "south": c[:, 1].min(),
                    "east": c[:, 0].max(),
                    "north": c[:, 1].max(),
                }
            )
        return pd.DataFrame(rows)

    return geometries.withColumn("bounds", bounds(F.col("geometry")))


@process
def filter_bbox_vector(geometries: DataFrame, extent: dict) -> DataFrame:
    """VectorCube branch of filter_bbox (reference: _filter.py:241-281):
    keep features whose geometry intersects the bbox — here via the
    bounds-overlap test on the coordinate arrays (exact for the axis-
    aligned bbox × point/polygon-envelope case)."""
    west, east = float(extent["west"]), float(extent["east"])
    south, north = float(extent["south"]), float(extent["north"])

    @F.pandas_udf("boolean")
    def intersects(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            c = _geometry_coords(json.loads(g))
            out.append(
                bool(
                    (c[:, 0].max() >= west)
                    and (c[:, 0].min() <= east)
                    and (c[:, 1].max() >= south)
                    and (c[:, 1].min() <= north)
                )
            )
        return pd.Series(out)

    return geometries.where(intersects(F.col("geometry")))


@process
def load_vector_cube(
    spark: SparkSession = None,
    URL: str = None,  # noqa: N803 - reference parameter name
    filename: str = None,
    geometries: dict = None,
) -> DataFrame:
    """(reference: cubes/experimental.py:18-72) URL/filename/dict →
    VectorCube. URLs (http(s) or file://) fetch driver-side via stdlib
    urllib — same role as the reference's requests.get; local GeoJSON
    files and inline dicts load directly."""
    from openeo_processes_dask_spark.sources.load import fetch_json

    spark = spark or SparkSession.getActiveSession()
    if URL is not None:
        geometries = fetch_json(URL)
    elif filename is not None:
        geometries = fetch_json(filename)
    if geometries is None:
        raise ValueError("One of URL/filename/geometries is required")
    return load_geojson(spark, geometries)


@process
def load_url(url: str, format: str = "GeoJSON", options: dict = None):  # noqa: A002
    """URL → VectorCube (reference: cubes/load.py:325-401; formats GeoJSON /
    JSON / Parquet). ``file://`` URLs, plain local paths, and http(s)
    URLs are all supported: JSON documents fetch driver-side via stdlib
    urllib (the reference's ``requests.get`` role); parquet reads go
    through ``spark.read.parquet`` (distributed, pushdown-capable) for
    local/Hadoop-FS locations, with http(s) parquet localized once
    driver-side."""
    from openeo_processes_dask_spark.sources.load import (
        _localize_parquet,
        _read_parquet_nanosafe,
        fetch_json,
    )

    spark = SparkSession.getActiveSession()
    fmt = (format or "GeoJSON").lower()
    if fmt == "parquet":
        # nanosafe: externally-written parquet (pandas/pyarrow default)
        # carries TIMESTAMP(NANOS), which plain spark.read rejects
        return _read_parquet_nanosafe(spark, _localize_parquet(spark, url))
    if fmt in ("geojson", "json"):
        return load_geojson(spark, fetch_json(url))
    raise ValueError(f"Unsupported format for load_url: {format}")
