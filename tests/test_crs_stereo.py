"""Native polar stereographic lanes (EPSG:3031 / 3413 / 3976).

EPSG Guidance Note 7-2 §3.2.4 Variant B (ellipsoidal, standard-parallel
form), implemented once over the shared ops shims (functions/crs.py
``_ps_forward`` / ``_ps_inverse``) so the Column, scalar, NumPy, and
DuckDB-SQL lanes are the same body. Reference parity target: the
reference warps any pair via pyproj (cubes/resample.py:39); these codes
are the polar-EO grids that now need no native libs (DIVERGENCES.md).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.functions import crs

POLAR_S = [
    (0.0, -75.0),
    (120.0, -80.0),
    (-120.0, -85.0),
    (45.0, -71.0),
    (179.5, -66.0),
    (-179.5, -89.9),
]
POLAR_N = [
    (0.0, 75.0),
    (-45.0, 70.0),
    (120.0, 85.0),
    (-150.0, 66.0),
    (30.0, 89.9),
]


def test_epsg_guidance_worked_example():
    """Guidance Note 7-2 Variant B worked example (Australian Antarctic:
    lat_ts=-71, lon0=70, FE=FN=6000000): 75°S 120°E ->
    E 7255380.79, N 7053389.56."""
    crs._PS_PARAMS["TEST:AA"] = (False, -71.0, 70.0, 6_000_000.0, 6_000_000.0)
    try:
        e, n = crs._ps_forward(crs._MathOps, -75.0, 120.0, "TEST:AA")
        assert e == pytest.approx(7255380.79, abs=0.01)
        assert n == pytest.approx(7053389.56, abs=0.01)
        lon, lat = crs._ps_inverse(crs._MathOps, e, n, "TEST:AA")
        assert lon == pytest.approx(120.0, abs=1e-9)
        assert lat == pytest.approx(-75.0, abs=1e-9)
    finally:
        del crs._PS_PARAMS["TEST:AA"]


def test_pole_maps_to_false_origin():
    e, n = crs.transform_xy_scalar(0.0, -90.0, "EPSG:4326", "EPSG:3031")
    assert abs(e) < 1e-6 and abs(n) < 1e-6
    e, n = crs.transform_xy_scalar(123.0, 90.0, "EPSG:4326", "EPSG:3413")
    assert abs(e) < 1e-6 and abs(n) < 1e-6
    # inverse of the origin returns the pole latitude (λ arbitrary there)
    _, lat = crs.transform_xy_scalar(0.0, 0.0, "EPSG:3031", "EPSG:4326")
    assert lat == pytest.approx(-90.0, abs=1e-9)


def test_scale_true_at_standard_parallel():
    """Variant B property: k = 1 at lat_ts (numeric derivative along the
    parallel vs the ellipsoidal parallel radius)."""
    for code, lat_ts in [
        ("EPSG:3031", -71.0),
        ("EPSG:3413", 70.0),
        ("EPSG:3976", -70.0),
    ]:
        dl = 1e-6
        e1, n1 = crs.transform_xy_scalar(0.0, lat_ts, "EPSG:4326", code)
        e2, n2 = crs.transform_xy_scalar(dl, lat_ts, "EPSG:4326", code)
        s = math.sin(math.radians(lat_ts))
        truth = (
            crs._WGS84_A
            * math.cos(math.radians(lat_ts))
            / math.sqrt(1 - crs._PS_E2 * s * s)
            * math.radians(dl)
        )
        assert math.hypot(e2 - e1, n2 - n1) / truth == pytest.approx(
            1.0, abs=1e-7
        )


def test_roundtrip_scalar_machine_precision():
    for code, pts in [("EPSG:3031", POLAR_S), ("EPSG:3976", POLAR_S),
                      ("EPSG:3413", POLAR_N)]:
        for lon, lat in pts:
            e, n = crs.transform_xy_scalar(lon, lat, "EPSG:4326", code)
            lon2, lat2 = crs.transform_xy_scalar(e, n, code, "EPSG:4326")
            dlon = abs((lon2 - lon + 180) % 360 - 180)
            assert lat2 == pytest.approx(lat, abs=1e-11), (code, lon, lat)
            assert dlon < 1e-11, (code, lon, lat)


def test_column_lane_matches_scalar(spark):
    df = spark.createDataFrame(POLAR_S, "lon double, lat double")
    e, n = crs.transform_xy_cols(
        F.col("lon"), F.col("lat"), "EPSG:4326", "EPSG:3031"
    )
    lo2, la2 = crs.transform_xy_cols(
        F.col("E"), F.col("N"), "EPSG:3031", "EPSG:4326"
    )
    rows = (
        df.select("lon", "lat", e.alias("E"), n.alias("N"))
        .select("lon", "lat", "E", "N", lo2.alias("lon2"), la2.alias("lat2"))
        .collect()
    )
    assert len(rows) == len(POLAR_S)
    for r in rows:
        se, sn = crs.transform_xy_scalar(r.lon, r.lat, "4326", "3031")
        assert r.E == pytest.approx(se, abs=1e-6)
        assert r.N == pytest.approx(sn, abs=1e-6)
        assert r.lon2 == pytest.approx(r.lon, abs=1e-9)
        assert r.lat2 == pytest.approx(r.lat, abs=1e-9)


def test_numpy_lane_matches_scalar():
    lons = np.array([p[0] for p in POLAR_N])
    lats = np.array([p[1] for p in POLAR_N])
    es, ns = crs.transform_xy_np(lons, lats, "EPSG:4326", "EPSG:3413")
    los, las = crs.transform_xy_np(es, ns, "EPSG:3413", "EPSG:4326")
    for i, (lon, lat) in enumerate(POLAR_N):
        se, sn = crs.transform_xy_scalar(lon, lat, "EPSG:4326", "EPSG:3413")
        assert es[i] == pytest.approx(se, abs=1e-6)
        assert ns[i] == pytest.approx(sn, abs=1e-6)
        assert los[i] == pytest.approx(lon, abs=1e-9)
        assert las[i] == pytest.approx(lat, abs=1e-9)


def test_aliases_supports_and_hub():
    assert crs.normalize_crs("3031") == "EPSG:3031"
    assert crs.normalize_crs("nsidc-sea-ice-north") == "EPSG:3413"
    assert crs.is_polar_stereo("EPSG:3976")
    assert not crs.is_polar_stereo("EPSG:3035")
    assert crs.supports("EPSG:4326", "EPSG:3031")
    assert crs.supports("EPSG:3413", "EPSG:3857")
    # projected->projected hubs through 4326: 3031 -> 3976 directly vs
    # via explicit two-leg composition
    e, n = crs.transform_xy_scalar(60.0, -77.0, "EPSG:4326", "EPSG:3031")
    a1, b1 = crs.transform_xy_scalar(e, n, "EPSG:3031", "EPSG:3976")
    lon, lat = crs.transform_xy_scalar(e, n, "EPSG:3031", "EPSG:4326")
    a2, b2 = crs.transform_xy_scalar(lon, lat, "EPSG:4326", "EPSG:3976")
    assert a1 == pytest.approx(a2, abs=1e-6)
    assert b1 == pytest.approx(b2, abs=1e-6)
