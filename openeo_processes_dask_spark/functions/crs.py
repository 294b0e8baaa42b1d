"""Native CRS transforms: EPSG:4326 <-> EPSG:3857 / UTM / EPSG:3035.

The reference delegates all reprojection to pyproj/odc (cubes/_filter.py:
284-320, cubes/resample.py:39-113). pyproj is not available in this
container, but both projections have public closed-form/series formulas:

- Web Mercator (EPSG Guidance Note 7-2, "Popular Visualisation
  Pseudo-Mercator"):
      X = R * lon_rad            lon = degrees(X / R)
      Y = R * ln(tan(pi/4 + lat_rad / 2))
      lat = degrees(2 * atan(exp(Y / R)) - pi/2)       R = 6378137 m

- UTM zones (EPSG:326xx north / 327xx south — the most common Sentinel-2
  case): Krüger's series for the ellipsoidal transverse Mercator, in the
  third-order-in-n form published in Karney (2011), "Transverse Mercator
  with an accuracy of a few nanometers" (the same series GeographicLib/
  pyproj evaluate to higher order). Truncation at n^3 for WGS84
  (n ≈ 1/594) leaves sub-millimeter error — far below pixel size.

- ETRS89-extended LAEA Europe (EPSG:3035, the EU-scale product grid):
  Snyder's oblique ellipsoidal Lambert Azimuthal Equal-Area (USGS
  Professional Paper 1395, pp. 187-190), validated against the EPSG
  Guidance Note 7-2 worked example to the centimeter and against the
  equal-area Jacobian property to 1e-8 relative.

Each transform is expressed twice through a shared formula: as Spark
Column expressions (sin/cos/sinh/atan2… are JVM built-ins, so a raster
warp of 100 TB of cells stays inside whole-stage codegen — no Python in
the hot path), and as scalar Python for driver-side bbox corners. Other
CRS pairs fall back to pyproj when present and stay gated otherwise.
"""

from __future__ import annotations

import math
import re
from typing import Iterator, Tuple

# module-level so typing.get_type_hints can resolve the stringified
# pandas_udf annotations (PEP 563 is active in this file)
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

R_MERCATOR = 6378137.0

_ALIASES_4326 = {"epsg:4326", "4326", "wgs84", "crs84", "ogc:crs84"}
_ALIASES_3857 = {"epsg:3857", "3857", "epsg:900913", "web-mercator"}
_ALIASES_3035 = {"epsg:3035", "3035", "etrs89-laea", "etrs89-extended-laea"}

_UTM_RE = re.compile(r"^epsg:(32[67])(\d{2})$")

# WGS84 / Krüger series constants (third order in n)
_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_N3 = _WGS84_F / (2 - _WGS84_F)
_TM_A = _WGS84_A / (1 + _N3) * (1 + _N3**2 / 4 + _N3**4 / 64)
_ALPHA = (
    _N3 / 2 - 2 * _N3**2 / 3 + 5 * _N3**3 / 16,
    13 * _N3**2 / 48 - 3 * _N3**3 / 5,
    61 * _N3**3 / 240,
)
_BETA = (
    _N3 / 2 - 2 * _N3**2 / 3 + 37 * _N3**3 / 96,
    _N3**2 / 48 + _N3**3 / 15,
    17 * _N3**3 / 480,
)
_DELTA = (
    2 * _N3 - 2 * _N3**2 / 3 - 2 * _N3**3,
    7 * _N3**2 / 3 - 8 * _N3**3 / 5,
    56 * _N3**3 / 15,
)
_TM_K0 = 0.9996
_TM_E0 = 500_000.0


# ---- Lambert Azimuthal Equal-Area on the ellipsoid (Snyder 1987, USGS
# Professional Paper 1395, pp. 187-190, oblique aspect) — EPSG:3035
# (ETRS89-extended / LAEA Europe, the grid every EU-scale product ships
# in; the reference reaches it only through pyproj, cubes/resample.py:39).
# GRS80 ellipsoid; projection center (52°N, 10°E), FE=4321000, FN=3210000.
#
# All constants below are scalar (driver-computed once); the per-point
# formulas run generically over an ops namespace so the same code emits
# JVM Column expressions, scalar math, NumPy batches, and the DuckDB
# oracle SQL — identical to the Krüger-series structure above.
_GRS80_A = 6378137.0
_GRS80_F = 1 / 298.257222101
_LAEA_E2 = _GRS80_F * (2 - _GRS80_F)
_LAEA_E = math.sqrt(_LAEA_E2)
_LAEA_LAT0 = 52.0
_LAEA_LON0 = 10.0
_LAEA_FE = 4_321_000.0
_LAEA_FN = 3_210_000.0


def _q_scalar(sin_phi: float) -> float:
    """Snyder (3-12): the equal-area auxiliary q as a function of sinφ."""
    return (1 - _LAEA_E2) * (
        sin_phi / (1 - _LAEA_E2 * sin_phi * sin_phi)
        + math.atanh(_LAEA_E * sin_phi) / _LAEA_E
    )


_LAEA_QP = _q_scalar(1.0)  # q at the pole
_LAEA_RQ = _GRS80_A * math.sqrt(_LAEA_QP / 2.0)  # authalic-sphere radius
_LAEA_SINB1 = _q_scalar(math.sin(math.radians(_LAEA_LAT0))) / _LAEA_QP
_LAEA_COSB1 = math.sqrt(1.0 - _LAEA_SINB1 * _LAEA_SINB1)
_LAEA_M1 = math.cos(math.radians(_LAEA_LAT0)) / math.sqrt(
    1 - _LAEA_E2 * math.sin(math.radians(_LAEA_LAT0)) ** 2
)
_LAEA_D = _GRS80_A * _LAEA_M1 / (_LAEA_RQ * _LAEA_COSB1)  # Snyder (24-20)

# authalic -> geodetic latitude series (Snyder 3-18), the Newton seed
_LAEA_C2 = (
    _LAEA_E2 / 3
    + 31 * _LAEA_E2**2 / 180
    + 517 * _LAEA_E2**3 / 5040
)
_LAEA_C4 = 23 * _LAEA_E2**2 / 360 + 251 * _LAEA_E2**3 / 3780
_LAEA_C6 = 761 * _LAEA_E2**3 / 45360

# --- Polar Stereographic (Variant B), WGS84 ellipsoid -------------------
# EPSG:3031  Antarctic Polar Stereographic (south, lat_ts=-71, lon0=0)
# EPSG:3413  NSIDC Sea Ice Polar Stereographic North (lat_ts=70, lon0=-45)
# EPSG:3976  NSIDC Sea Ice Polar Stereographic South (lat_ts=-70, lon0=0)
# Formulas: EPSG Guidance Note 7-2 §3.2.4 / Snyder (1987) §21; the
# conformal factor [(1+e sinφ)/(1-e sinφ)]^(e/2) is written
# exp(e·atanh(e·sinφ)) and tan(π/4∓φ/2) as cosφ/(1±sinφ) so the whole
# transform needs only the ops the Column/SQL/NumPy shims already share.
_PS_E2 = _WGS84_F * (2 - _WGS84_F)
_PS_E = math.sqrt(_PS_E2)
# inverse conformal-latitude series (Snyder 3-5): φ = χ + Σ C2k sin(2kχ)
_PS_C2 = _PS_E2 / 2 + 5 * _PS_E2**2 / 24 + _PS_E2**3 / 12 + 13 * _PS_E2**4 / 360
_PS_C4 = 7 * _PS_E2**2 / 48 + 29 * _PS_E2**3 / 240 + 811 * _PS_E2**4 / 11520
_PS_C6 = 7 * _PS_E2**3 / 120 + 81 * _PS_E2**4 / 1120
_PS_C8 = 4279 * _PS_E2**4 / 161280


def _ps_kappa(lat_ts_deg: float) -> float:
    """ρ = κ·t for variant B: κ = a·mF/tF at the standard parallel, so
    scale is true there (k=1). Computed in the NORTH-aspect frame on
    |lat_ts| (the south aspect mirrors φ)."""
    phi = math.radians(abs(lat_ts_deg))
    s = math.sin(phi)
    m = math.cos(phi) / math.sqrt(1 - _PS_E2 * s * s)
    t = (
        math.cos(phi)
        / (1 + s)
        * math.exp(_PS_E * math.atanh(_PS_E * s))
    )
    return _WGS84_A * m / t


_PS_PARAMS = {
    "EPSG:3031": (False, -71.0, 0.0, 0.0, 0.0),
    "EPSG:3413": (True, 70.0, -45.0, 0.0, 0.0),
    "EPSG:3976": (False, -70.0, 0.0, 0.0, 0.0),
}
_ALIASES_PS = {
    "epsg:3031": "EPSG:3031",
    "3031": "EPSG:3031",
    "antarctic-polar-stereographic": "EPSG:3031",
    "epsg:3413": "EPSG:3413",
    "3413": "EPSG:3413",
    "nsidc-sea-ice-north": "EPSG:3413",
    "epsg:3976": "EPSG:3976",
    "3976": "EPSG:3976",
    "nsidc-sea-ice-south": "EPSG:3976",
}


def _ps_forward(ops, lat_deg, lon_deg, crs: str):
    """(lat, lon)° -> polar stereographic (E, N)."""
    north, lat_ts, lon0, fe, fn = _PS_PARAMS[crs]
    kappa = _ps_kappa(lat_ts)
    d2r = math.pi / 180.0
    sign = 1.0 if north else -1.0
    # work in the north-aspect frame: φ' = ±φ (t is evaluated at φ')
    phi = lat_deg * ops.lit(sign * d2r)
    dlam = (lon_deg - ops.lit(lon0)) * ops.lit(d2r)
    s = ops.sin(phi)
    t = (
        ops.cos(phi)
        / (ops.lit(1.0) + s)
        * ops.exp(ops.lit(_PS_E) * ops.atanh(ops.lit(_PS_E) * s))
    )
    rho = ops.lit(kappa) * t
    e = ops.lit(fe) + rho * ops.sin(dlam)
    # north: N = FN - ρ cos(λ-λ0); south: N = FN + ρ cos(λ-λ0)
    n = ops.lit(fn) + rho * ops.cos(dlam) * ops.lit(-sign)
    return e, n


def _ps_inverse(ops, E, N, crs: str):
    """Polar stereographic (E, N) -> (lon, lat)°. Series seed (Snyder
    3-5) + one fixed-point refinement of the conformal relation — the
    residual contraction factor is ~e² so the result is at machine
    precision; like the LAEA inverse this body is branchless (also runs
    as SQL text) and pole-safe (atan2(0, 0) = 0 -> λ = λ0)."""
    north, lat_ts, lon0, fe, fn = _PS_PARAMS[crs]
    kappa = _ps_kappa(lat_ts)
    r2d = 180.0 / math.pi
    sign = 1.0 if north else -1.0
    x = E - ops.lit(fe)
    # mirror into the north-aspect frame: y' = ±(FN - N)
    y = (ops.lit(fn) - N) * ops.lit(sign)
    t = ops.sqrt(x * x + y * y) * ops.lit(1.0 / kappa)
    chi = ops.lit(math.pi / 2) - ops.lit(2.0) * ops.atan(t)
    phi = (
        chi
        + ops.lit(_PS_C2) * ops.sin(ops.lit(2.0) * chi)
        + ops.lit(_PS_C4) * ops.sin(ops.lit(4.0) * chi)
        + ops.lit(_PS_C6) * ops.sin(ops.lit(6.0) * chi)
        + ops.lit(_PS_C8) * ops.sin(ops.lit(8.0) * chi)
    )
    # one refinement: φ = π/2 - 2 atan(t · exp(-e·atanh(e·sinφ)))
    phi = ops.lit(math.pi / 2) - ops.lit(2.0) * ops.atan(
        t
        * ops.exp(
            ops.lit(-_PS_E) * ops.atanh(ops.lit(_PS_E) * ops.sin(phi))
        )
    )
    lam = ops.atan2(x, y)
    return (
        ops.lit(lon0) + lam * ops.lit(r2d),
        phi * ops.lit(sign * r2d),
    )


def _laea_forward(ops, lat_deg, lon_deg):
    """(lat, lon)° -> EPSG:3035 (E, N). Snyder (24-17..24-19)."""
    d2r = math.pi / 180.0
    phi = lat_deg * ops.lit(d2r)
    dlam = (lon_deg - ops.lit(_LAEA_LON0)) * ops.lit(d2r)
    s = ops.sin(phi)
    q = ops.lit(1 - _LAEA_E2) * (
        s / (ops.lit(1.0) - ops.lit(_LAEA_E2) * s * s)
        + ops.atanh(ops.lit(_LAEA_E) * s) * ops.lit(1.0 / _LAEA_E)
    )
    sinb = q * ops.lit(1.0 / _LAEA_QP)
    cosb = ops.sqrt(ops.lit(1.0) - sinb * sinb)
    cosd = ops.cos(dlam)
    # B = Rq * sqrt(2 / (1 + sinb1 sinb + cosb1 cosb cos dlam))
    b = ops.lit(_LAEA_RQ) * ops.sqrt(
        ops.lit(2.0)
        / (
            ops.lit(1.0)
            + ops.lit(_LAEA_SINB1) * sinb
            + ops.lit(_LAEA_COSB1) * cosb * cosd
        )
    )
    e = b * ops.lit(_LAEA_D) * cosb * ops.sin(dlam) + ops.lit(_LAEA_FE)
    n = (
        b
        * ops.lit(1.0 / _LAEA_D)
        * (
            ops.lit(_LAEA_COSB1) * sinb
            - ops.lit(_LAEA_SINB1) * cosb * cosd
        )
        + ops.lit(_LAEA_FN)
    )
    return e, n


def _laea_inverse(ops, E, N):
    """EPSG:3035 (E, N) -> (lon, lat)°. Snyder (24-26..24-30, 3-16).

    The center singularity is removed algebraically: with
    r = ρ/(2Rq) and ce = 2·asin(r), sin(ce)/ρ = sqrt(1-r²)/Rq and
    cos(ce) = 1-2r² — no division by ρ anywhere, so the exact projection
    center maps back to (lon0, lat0) with no branch (a branchless
    requirement: this body also runs as one Column expression and as the
    DuckDB oracle's SQL text). Latitude: authalic series seed
    (Snyder 3-18) + two unrolled Newton steps of (3-16) — quadratic
    convergence puts the result at machine precision while keeping the
    unrolled expression tree small."""
    r2d = 180.0 / math.pi
    xr = (E - ops.lit(_LAEA_FE)) * ops.lit(1.0 / _LAEA_D)  # ρ·sin az
    yr = (N - ops.lit(_LAEA_FN)) * ops.lit(_LAEA_D)  # ρ·cos az
    rho2 = xr * xr + yr * yr
    r2 = rho2 * ops.lit(1.0 / (4.0 * _LAEA_RQ * _LAEA_RQ))  # r²
    cos_ce = ops.lit(1.0) - ops.lit(2.0) * r2
    # sin(ce)/ρ, finite everywhere (= 1/Rq at the center)
    sin_ce_rho = ops.sqrt(ops.lit(1.0) - r2) * ops.lit(1.0 / _LAEA_RQ)
    q = ops.lit(_LAEA_QP) * (
        cos_ce * ops.lit(_LAEA_SINB1)
        + yr * sin_ce_rho * ops.lit(_LAEA_COSB1)
    )
    # λ: the common positive factor ρ cancels inside atan2; at the center
    # both arguments are 0 and atan2(0, +D·cosb1·1) = 0 -> λ = λ0
    lam = ops.atan2(
        xr * sin_ce_rho,
        ops.lit(_LAEA_COSB1) * cos_ce - yr * sin_ce_rho * ops.lit(_LAEA_SINB1),
    )
    # latitude: series seed on the authalic latitude β...
    sinb = q * ops.lit(1.0 / _LAEA_QP)
    beta = ops.asin(sinb)
    phi = (
        beta
        + ops.lit(_LAEA_C2) * ops.sin(ops.lit(2.0) * beta)
        + ops.lit(_LAEA_C4) * ops.sin(ops.lit(4.0) * beta)
        + ops.lit(_LAEA_C6) * ops.sin(ops.lit(6.0) * beta)
    )
    # ...then two Newton steps of Snyder (3-16): φ += (q - q(φ)) / q'(φ)
    for _ in range(2):
        s = ops.sin(phi)
        one_minus = ops.lit(1.0) - ops.lit(_LAEA_E2) * s * s
        q_phi = ops.lit(1 - _LAEA_E2) * (
            s / one_minus
            + ops.atanh(ops.lit(_LAEA_E) * s) * ops.lit(1.0 / _LAEA_E)
        )
        phi = phi + (
            one_minus
            * one_minus
            / (ops.lit(2.0) * ops.cos(phi))
            * (q - q_phi)
            * ops.lit(1.0 / (1 - _LAEA_E2))
        )
    return (
        ops.lit(_LAEA_LON0) + lam * ops.lit(r2d),
        phi * ops.lit(r2d),
    )


def is_laea(crs) -> bool:
    """True for EPSG:3035 (ETRS89-extended LAEA Europe)."""
    return str(crs).strip().lower() in _ALIASES_3035


def is_polar_stereo(crs) -> bool:
    """True for the native polar stereographic codes (3031/3413/3976)."""
    return str(crs).strip().lower() in _ALIASES_PS


def utm_zone(crs) -> tuple[int, bool] | None:
    """(zone, is_north) for an EPSG UTM code, else None."""
    m = _UTM_RE.match(str(crs).strip().lower())
    if not m:
        return None
    zone = int(m.group(2))
    if not 1 <= zone <= 60:
        return None
    return zone, m.group(1) == "326"


def normalize_crs(crs) -> str:
    s = str(crs).strip().lower()
    if s in _ALIASES_4326:
        return "EPSG:4326"
    if s in _ALIASES_3857:
        return "EPSG:3857"
    if s in _ALIASES_3035:
        return "EPSG:3035"
    if s in _ALIASES_PS:
        return _ALIASES_PS[s]
    if _UTM_RE.match(s):
        return s.upper()
    return str(crs)


def supports(src_crs, dst_crs) -> bool:
    """True when transform_xy_* can handle the pair: natively (closed-form
    4326<->3857<->UTM) or via the runtime-detected pyproj lane."""
    native = {"EPSG:4326", "EPSG:3857", "EPSG:3035", *_PS_PARAMS}
    pair = {normalize_crs(src_crs), normalize_crs(dst_crs)}
    if pair <= native:
        return True
    others = pair - native
    if all(utm_zone(c) for c in others):
        return True
    try:
        import pyproj  # noqa: F401

        return True
    except ImportError:
        return False


class _ColOps:
    """Math namespace over Spark Columns — the JVM/codegen lane."""

    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    atan = staticmethod(F.atan)
    atan2 = staticmethod(F.atan2)
    asin = staticmethod(F.asin)
    sinh = staticmethod(F.sinh)
    cosh = staticmethod(F.cosh)
    log = staticmethod(F.log)
    sqrt = staticmethod(F.sqrt)
    exp = staticmethod(F.exp)

    @staticmethod
    def lit(v):
        return F.lit(float(v))

    @staticmethod
    def atanh(x):
        return F.lit(0.5) * F.log((F.lit(1.0) + x) / (F.lit(1.0) - x))


class _MathOps:
    """Scalar twin of _ColOps (driver-side bbox corners) — CPython libm,
    which matches java.lang.Math bit-for-bit on our anchors."""

    sin = staticmethod(math.sin)
    cos = staticmethod(math.cos)
    atan = staticmethod(math.atan)
    atan2 = staticmethod(math.atan2)
    asin = staticmethod(math.asin)
    sinh = staticmethod(math.sinh)
    cosh = staticmethod(math.cosh)
    log = staticmethod(math.log)
    sqrt = staticmethod(math.sqrt)
    exp = staticmethod(math.exp)
    lit = staticmethod(float)
    atanh = staticmethod(math.atanh)


class _NumpyOps:
    """NumPy twin of _ColOps: vectorized batch transforms (vector-cube
    coordinate arrays inside pandas UDFs) AND driver-side scalars — NumPy
    ufuncs accept both arrays and Python floats."""

    import numpy as _np

    sin = staticmethod(_np.sin)
    cos = staticmethod(_np.cos)
    atan = staticmethod(_np.arctan)
    atan2 = staticmethod(_np.arctan2)
    asin = staticmethod(_np.arcsin)
    sinh = staticmethod(_np.sinh)
    cosh = staticmethod(_np.cosh)
    log = staticmethod(_np.log)
    sqrt = staticmethod(_np.sqrt)
    exp = staticmethod(_np.exp)
    lit = staticmethod(float)
    atanh = staticmethod(_np.arctanh)


def _tm_forward(ops, lat_deg, lon_deg, lon0_deg: float, north: bool):
    """(lat, lon)° -> UTM (E, N). Krüger series, third order in n."""
    d2r = math.pi / 180.0
    phi = lat_deg * ops.lit(d2r)
    dlam = (lon_deg - ops.lit(lon0_deg)) * ops.lit(d2r)
    e2n = 2 * math.sqrt(_N3) / (1 + _N3)
    s = ops.sin(phi)
    t = ops.sinh(ops.atanh(s) - ops.lit(e2n) * ops.atanh(ops.lit(e2n) * s))
    xi = ops.atan2(t, ops.cos(dlam))
    eta = ops.atanh(ops.sin(dlam) / ops.sqrt(ops.lit(1.0) + t * t))
    E = eta
    N = xi
    for j, a in enumerate(_ALPHA, start=1):
        E = E + ops.lit(a) * ops.cos(ops.lit(2.0 * j) * xi) * ops.sinh(
            ops.lit(2.0 * j) * eta
        )
        N = N + ops.lit(a) * ops.sin(ops.lit(2.0 * j) * xi) * ops.cosh(
            ops.lit(2.0 * j) * eta
        )
    fn = 0.0 if north else 10_000_000.0
    k0A = _TM_K0 * _TM_A
    return (
        ops.lit(_TM_E0) + ops.lit(k0A) * E,
        ops.lit(fn) + ops.lit(k0A) * N,
    )


def _tm_inverse(ops, E, N, lon0_deg: float, north: bool):
    """UTM (E, N) -> (lon, lat)°. Krüger inverse series."""
    r2d = 180.0 / math.pi
    fn = 0.0 if north else 10_000_000.0
    k0A = _TM_K0 * _TM_A
    xi = (N - ops.lit(fn)) / ops.lit(k0A)
    eta = (E - ops.lit(_TM_E0)) / ops.lit(k0A)
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - ops.lit(b) * ops.sin(ops.lit(2.0 * j) * xi) * ops.cosh(
            ops.lit(2.0 * j) * eta
        )
        eta_p = eta_p - ops.lit(b) * ops.cos(ops.lit(2.0 * j) * xi) * ops.sinh(
            ops.lit(2.0 * j) * eta
        )
    chi = ops.asin(ops.sin(xi_p) / ops.cosh(eta_p))
    phi = chi
    for j, d in enumerate(_DELTA, start=1):
        phi = phi + ops.lit(d) * ops.sin(ops.lit(2.0 * j) * chi)
    lam = ops.atan2(ops.sinh(eta_p), ops.cos(xi_p))
    return (
        ops.lit(lon0_deg) + lam * ops.lit(r2d),
        phi * ops.lit(r2d),
    )


def _utm_lon0(zone: int) -> float:
    return float(zone * 6 - 183)


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
    if src == "EPSG:4326" and utm_zone(dst):
        zone, north = utm_zone(dst)
        return _tm_forward(_ColOps, y, x, _utm_lon0(zone), north)
    if utm_zone(src) and dst == "EPSG:4326":
        zone, north = utm_zone(src)
        return _tm_inverse(_ColOps, x, y, _utm_lon0(zone), north)
    if src == "EPSG:4326" and dst == "EPSG:3035":
        return _laea_forward(_ColOps, y, x)
    if src == "EPSG:3035" and dst == "EPSG:4326":
        return _laea_inverse(_ColOps, x, y)
    if src == "EPSG:4326" and dst in _PS_PARAMS:
        return _ps_forward(_ColOps, y, x, dst)
    if src in _PS_PARAMS and dst == "EPSG:4326":
        return _ps_inverse(_ColOps, x, y, src)
    if (utm_zone(src) or src in ("EPSG:3857", "EPSG:3035") or src in _PS_PARAMS) and (
        utm_zone(dst) or dst in ("EPSG:3857", "EPSG:3035") or dst in _PS_PARAMS
    ):
        # projected <-> projected: hub through geographic coordinates
        lon, lat = transform_xy_cols(x, y, src, "EPSG:4326")
        return transform_xy_cols(lon, lat, "EPSG:4326", dst)
    try:
        import pyproj  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"Native transforms cover EPSG:4326<->3857<->UTM (got {src}->{dst});"
            " other pairs need pyproj, unavailable in this container"
        ) from None
    return _pyproj_transform_cols(x, y, src, dst)


def _pyproj_transform_cols(
    x: Column, y: Column, src: str, dst: str
) -> tuple[Column, Column]:
    """Arbitrary-CRS lane, active only when pyproj is importable (runtime
    detect — deployment environments get full reference parity,
    cubes/resample.py:39-113, for free). Arrow-batched pandas UDF, never
    row-at-a-time; the Transformer is built once per executor batch. The
    native closed-form pairs above stay on the JVM/codegen lane — this is
    the documented slow(er) path for the long tail of EPSG codes."""
    from pyspark.sql.functions import pandas_udf

    # iterator form: the only multi-input struct-return signature PySpark
    # accepts, and it builds the Transformer once per partition, not batch
    @pandas_udf("struct<x: double, y: double>")
    def _tx(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        from pyproj import Transformer

        t = Transformer.from_crs(src, dst, always_xy=True)
        for xs, ys in it:
            ox, oy = t.transform(xs.to_numpy(), ys.to_numpy())
            yield pd.DataFrame({"x": ox, "y": oy})

    out = _tx(x, y)
    return out.getField("x"), out.getField("y")


def transform_xy_np(x, y, src_crs, dst_crs):
    """NumPy twin of transform_xy_cols: vectorized (x, y) array pair in
    src_crs -> array pair in dst_crs. Used for vector-cube coordinate
    batches inside pandas UDFs and (via transform_xy_scalar) bbox corners.
    Non-native pairs fall back to pyproj when importable."""
    import numpy as np

    src, dst = normalize_crs(src_crs), normalize_crs(dst_crs)
    if src == dst:
        return x, y
    if src == "EPSG:4326" and dst == "EPSG:3857":
        return (
            np.radians(x) * R_MERCATOR,
            R_MERCATOR * np.log(np.tan(math.pi / 4 + np.radians(y) / 2)),
        )
    if src == "EPSG:3857" and dst == "EPSG:4326":
        return (
            np.degrees(x / R_MERCATOR),
            np.degrees(2 * np.arctan(np.exp(y / R_MERCATOR)) - math.pi / 2),
        )
    if src == "EPSG:4326" and utm_zone(dst):
        zone, north = utm_zone(dst)
        return _tm_forward(_NumpyOps, y, x, _utm_lon0(zone), north)
    if utm_zone(src) and dst == "EPSG:4326":
        zone, north = utm_zone(src)
        return _tm_inverse(_NumpyOps, x, y, _utm_lon0(zone), north)
    if src == "EPSG:4326" and dst == "EPSG:3035":
        return _laea_forward(_NumpyOps, y, x)
    if src == "EPSG:3035" and dst == "EPSG:4326":
        return _laea_inverse(_NumpyOps, x, y)
    if src == "EPSG:4326" and dst in _PS_PARAMS:
        return _ps_forward(_NumpyOps, y, x, dst)
    if src in _PS_PARAMS and dst == "EPSG:4326":
        return _ps_inverse(_NumpyOps, x, y, src)
    if (
        utm_zone(src)
        or utm_zone(dst)
        or "EPSG:3035" in (src, dst)
        or src in _PS_PARAMS
        or dst in _PS_PARAMS
    ):
        lon, lat = transform_xy_np(x, y, src, "EPSG:4326")
        return transform_xy_np(lon, lat, "EPSG:4326", dst)
    try:
        from pyproj import Transformer
    except ImportError as exc:
        raise NotImplementedError(
            f"Transform {src}->{dst} needs pyproj (unavailable); native "
            "support covers EPSG:4326<->3857<->UTM"
        ) from exc
    t = Transformer.from_crs(src, dst, always_xy=True)
    return t.transform(x, y)


def transform_xy_scalar(x: float, y: float, src_crs, dst_crs):
    """Driver-side scalar twin of transform_xy_cols (bbox corners).

    Uses ``math`` rather than delegating to the NumPy lane: java.lang.Math
    and CPython's libm agree bit-for-bit on these anchors (measured:
    tan(pi/4) = 0.9999999999999999 in both) while NumPy's SIMD routines can
    differ in the last ulp (np.tan(pi/4) = 1.0 exactly) — and scalar/column
    agreement is the contract resample grids are built on."""
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
    if src == "EPSG:4326" and utm_zone(dst):
        zone, north = utm_zone(dst)
        e, n = _tm_forward(_MathOps, float(y), float(x), _utm_lon0(zone), north)
        return float(e), float(n)
    if utm_zone(src) and dst == "EPSG:4326":
        zone, north = utm_zone(src)
        lon, lat = _tm_inverse(
            _MathOps, float(x), float(y), _utm_lon0(zone), north
        )
        return float(lon), float(lat)
    if src == "EPSG:4326" and dst == "EPSG:3035":
        e, n = _laea_forward(_MathOps, float(y), float(x))
        return float(e), float(n)
    if src == "EPSG:3035" and dst == "EPSG:4326":
        lon, lat = _laea_inverse(_MathOps, float(x), float(y))
        return float(lon), float(lat)
    if src == "EPSG:4326" and dst in _PS_PARAMS:
        e, n = _ps_forward(_MathOps, float(y), float(x), dst)
        return float(e), float(n)
    if src in _PS_PARAMS and dst == "EPSG:4326":
        lon, lat = _ps_inverse(_MathOps, float(x), float(y), src)
        return float(lon), float(lat)
    if (
        utm_zone(src)
        or utm_zone(dst)
        or "EPSG:3035" in (src, dst)
        or src in _PS_PARAMS
        or dst in _PS_PARAMS
    ):
        lon, lat = transform_xy_scalar(x, y, src, "EPSG:4326")
        return transform_xy_scalar(lon, lat, "EPSG:4326", dst)
    ox, oy = transform_xy_np(float(x), float(y), src, dst)  # pyproj lane
    return float(ox), float(oy)
