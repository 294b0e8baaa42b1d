"""EPSG:3035 (ETRS89-extended LAEA Europe) native lane.

The reference reaches LAEA only through pyproj (cubes/resample.py:39);
functions/crs.py implements Snyder's oblique ellipsoidal LAEA (USGS PP
1395, pp. 187-190) natively so the EU product grid works without pyproj.
Anchors here are implementation-independent: the EPSG Guidance Note 7-2
worked example, the equal-area Jacobian property, the distortion-free
tangent point, and scalar/Column/NumPy cross-lane agreement.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.functions import crs

EUROPE = [
    (lon, lat)
    for lon in (-10.0, 0.0, 10.0, 25.0, 40.0)
    for lat in (35.0, 45.0, 52.0, 60.0, 70.0)
]


def test_laea_center_maps_to_false_origin():
    e, n = crs.transform_xy_scalar(10.0, 52.0, "EPSG:4326", "EPSG:3035")
    assert e == pytest.approx(4_321_000.0, abs=1e-6)
    assert n == pytest.approx(3_210_000.0, abs=1e-6)
    lon, lat = crs.transform_xy_scalar(
        4_321_000.0, 3_210_000.0, "EPSG:3035", "EPSG:4326"
    )
    assert lon == pytest.approx(10.0, abs=1e-12)
    assert lat == pytest.approx(52.0, abs=1e-12)


def test_laea_epsg_worked_example():
    """EPSG Guidance Note 7-2, LAEA (ETRS89-LAEA) example:
    50°N 5°E -> E 3962799.45, N 2999718.85 (published to the cm)."""
    e, n = crs.transform_xy_scalar(5.0, 50.0, "EPSG:4326", "EPSG:3035")
    assert e == pytest.approx(3_962_799.45, abs=0.01)
    assert n == pytest.approx(2_999_718.85, abs=0.01)


def test_laea_roundtrip_scalar():
    for lon, lat in EUROPE:
        e, n = crs.transform_xy_scalar(lon, lat, "EPSG:4326", "EPSG:3035")
        lo, la = crs.transform_xy_scalar(e, n, "EPSG:3035", "EPSG:4326")
        assert lo == pytest.approx(lon, abs=1e-9)
        assert la == pytest.approx(lat, abs=1e-9)


def test_laea_equal_area_jacobian():
    """THE property that names the projection: the forward map preserves
    area, i.e. |d(x,y)/d(lon,lat)| equals the ellipsoidal area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 everywhere. A wrong
    qp/beta/B/D anywhere in the formula breaks this ratio."""
    h = 1e-5
    for lon, lat in ((10.0, 52.0), (0.0, 40.0), (30.0, 65.0), (-5.0, 36.0)):
        f = lambda lo, la: crs.transform_xy_scalar(
            lo, la, "EPSG:4326", "EPSG:3035"
        )
        x0, y0 = f(lon, lat)
        x1, y1 = f(lon + h, lat)
        x2, y2 = f(lon, lat + h)
        det = ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / (h * h)
        s = math.sin(math.radians(lat))
        d2r = math.pi / 180.0
        area_elem = (
            crs._GRS80_A**2
            * (1 - crs._LAEA_E2)
            * math.cos(math.radians(lat))
            / (1 - crs._LAEA_E2 * s * s) ** 2
            * d2r
            * d2r
        )
        assert det / area_elem == pytest.approx(1.0, rel=1e-6)


def test_laea_tangent_point_scale():
    """LAEA is distortion-free at the projection center: a small eastward
    step maps to arc length N(phi) cos(phi) dlam to second order."""
    dlam = 0.01
    e, _ = crs.transform_xy_scalar(10.0 + dlam, 52.0, "EPSG:4326", "EPSG:3035")
    s = math.sin(math.radians(52.0))
    n_rad = crs._GRS80_A / math.sqrt(1 - crs._LAEA_E2 * s * s)
    expected = math.radians(dlam) * n_rad * math.cos(math.radians(52.0))
    assert e - 4_321_000.0 == pytest.approx(expected, rel=1e-7)


def test_laea_column_lane_matches_scalar(spark):
    df = spark.createDataFrame(EUROPE, "lon double, lat double")
    e, n = crs.transform_xy_cols(
        F.col("lon"), F.col("lat"), "EPSG:4326", "EPSG:3035"
    )
    lo2, la2 = crs.transform_xy_cols(
        F.col("E"), F.col("N"), "EPSG:3035", "EPSG:4326"
    )
    rows = (
        df.select("lon", "lat", e.alias("E"), n.alias("N"))
        .select("lon", "lat", "E", "N", lo2.alias("lon2"), la2.alias("lat2"))
        .collect()
    )
    assert len(rows) == len(EUROPE)
    for r in rows:
        se, sn = crs.transform_xy_scalar(r.lon, r.lat, "4326", "3035")
        assert r.E == pytest.approx(se, abs=1e-6)
        assert r.N == pytest.approx(sn, abs=1e-6)
        assert r.lon2 == pytest.approx(r.lon, abs=1e-9)
        assert r.lat2 == pytest.approx(r.lat, abs=1e-9)


def test_laea_numpy_lane_matches_scalar():
    lons = np.array([p[0] for p in EUROPE])
    lats = np.array([p[1] for p in EUROPE])
    es, ns = crs.transform_xy_np(lons, lats, "EPSG:4326", "EPSG:3035")
    los, las = crs.transform_xy_np(es, ns, "EPSG:3035", "EPSG:4326")
    for i, (lon, lat) in enumerate(EUROPE):
        se, sn = crs.transform_xy_scalar(lon, lat, "EPSG:4326", "EPSG:3035")
        assert es[i] == pytest.approx(se, abs=1e-6)
        assert ns[i] == pytest.approx(sn, abs=1e-6)
        assert los[i] == pytest.approx(lon, abs=1e-9)
        assert las[i] == pytest.approx(lat, abs=1e-9)


def test_laea_hub_paths_and_supports():
    assert crs.supports("EPSG:4326", "EPSG:3035")
    assert crs.supports("EPSG:3857", "EPSG:3035")
    assert crs.supports("EPSG:32632", "EPSG:3035")
    assert crs.normalize_crs("etrs89-laea") == "EPSG:3035"
    # projected->projected hubs through 4326 and stay consistent
    e, n = crs.transform_xy_scalar(10.0, 52.0, "EPSG:4326", "EPSG:3035")
    mx, my = crs.transform_xy_scalar(10.0, 52.0, "EPSG:4326", "EPSG:3857")
    e2, n2 = crs.transform_xy_scalar(mx, my, "EPSG:3857", "EPSG:3035")
    assert e2 == pytest.approx(e, abs=1e-5)
    assert n2 == pytest.approx(n, abs=1e-5)
    # UTM leg carries the Krüger series' documented sub-mm truncation
    ue, un = crs.transform_xy_scalar(10.0, 52.0, "EPSG:4326", "EPSG:32632")
    e3, n3 = crs.transform_xy_scalar(ue, un, "EPSG:32632", "EPSG:3035")
    assert e3 == pytest.approx(e, abs=5e-3)
    assert n3 == pytest.approx(n, abs=5e-3)
