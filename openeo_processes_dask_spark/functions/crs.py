"""Native CRS transforms for the EPSG:4326 <-> EPSG:3857 pair.

The reference delegates all reprojection to pyproj/odc (cubes/_filter.py:
284-320, cubes/resample.py:39-113). pyproj is not available in this
container, but the spherical ("Web") Mercator mapping EPSG:3857 is a public
closed-form formula (EPSG Guidance Note 7-2, "Popular Visualisation
Pseudo-Mercator"):

    X = R * lon_rad            lon = degrees(X / R)
    Y = R * ln(tan(pi/4 + lat_rad / 2))
    lat = degrees(2 * atan(exp(Y / R)) - pi/2)       R = 6378137 m

Expressed here twice: as Spark Column expressions (radians/tan/ln/atan/exp
are all JVM built-ins, so a raster warp of 100 TB of cells stays inside
whole-stage codegen — no Python in the hot path), and as scalar Python for
driver-side bbox corners. Other CRS pairs fall back to pyproj when present
and stay gated otherwise.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

R_MERCATOR = 6378137.0

_ALIASES_4326 = {"epsg:4326", "4326", "wgs84", "crs84", "ogc:crs84"}
_ALIASES_3857 = {"epsg:3857", "3857", "epsg:900913", "web-mercator"}


def normalize_crs(crs) -> str:
    s = str(crs).strip().lower()
    if s in _ALIASES_4326:
        return "EPSG:4326"
    if s in _ALIASES_3857:
        return "EPSG:3857"
    return str(crs)


def supports(src_crs, dst_crs) -> bool:
    pair = {normalize_crs(src_crs), normalize_crs(dst_crs)}
    return pair <= {"EPSG:4326", "EPSG:3857"}


def transform_xy_cols(
    x: Column, y: Column, src_crs, dst_crs
) -> tuple[Column, Column]:
    """(x, y) Column pair in src_crs -> Column pair in dst_crs, as pure
    JVM expressions."""
    src, dst = normalize_crs(src_crs), normalize_crs(dst_crs)
    if src == dst:
        return x, y
    if src == "EPSG:4326" and dst == "EPSG:3857":
        mx = F.radians(x) * F.lit(R_MERCATOR)
        my = F.lit(R_MERCATOR) * F.log(
            F.tan(F.lit(math.pi / 4) + F.radians(y) / F.lit(2.0))
        )
        return mx, my
    if src == "EPSG:3857" and dst == "EPSG:4326":
        lon = F.degrees(x / F.lit(R_MERCATOR))
        lat = F.degrees(
            F.lit(2.0) * F.atan(F.exp(y / F.lit(R_MERCATOR)))
            - F.lit(math.pi / 2)
        )
        return lon, lat
    raise NotImplementedError(
        f"Native transforms cover EPSG:4326<->3857 only (got {src}->{dst}); "
        "other pairs need pyproj, unavailable in this container"
    )


def transform_xy_scalar(x: float, y: float, src_crs, dst_crs):
    """Driver-side scalar twin of transform_xy_cols (bbox corners)."""
    src, dst = normalize_crs(src_crs), normalize_crs(dst_crs)
    if src == dst:
        return float(x), float(y)
    if src == "EPSG:4326" and dst == "EPSG:3857":
        return (
            math.radians(x) * R_MERCATOR,
            R_MERCATOR * math.log(math.tan(math.pi / 4 + math.radians(y) / 2)),
        )
    if src == "EPSG:3857" and dst == "EPSG:4326":
        return (
            math.degrees(x / R_MERCATOR),
            math.degrees(2 * math.atan(math.exp(y / R_MERCATOR)) - math.pi / 2),
        )
    try:  # pragma: no cover - pyproj absent in this container
        from pyproj import Transformer

        t = Transformer.from_crs(src, dst, always_xy=True)
        return t.transform(x, y)
    except ImportError as exc:
        raise NotImplementedError(
            f"Transform {src}->{dst} needs pyproj (unavailable); native "
            "support covers EPSG:4326<->3857"
        ) from exc
