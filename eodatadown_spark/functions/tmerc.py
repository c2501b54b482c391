"""C18: WGS84 ↔ UTM transverse-Mercator transforms, numpy-vectorized.

Closes the reprojection gate (ref eodatadownlandsatgoogsensor.py:723-725:
the reference shells out to osgeo/pyproj to reproject ROI bboxes) without
any native geo dependency: the exact Gauss-Krüger mapping is evaluated with
Karney's 6th-order series in the third flattening n (C. F. F. Karney,
"Transverse Mercator with an accuracy of a few nanometers", J. Geod. 85,
2011 — public formulas; coefficients below are the paper's α/β/δ series).
At order n⁶ the error inside a UTM zone (|λ−λ0| ≤ 3°) is far below a
millimeter — pyproj-equivalent for every EO use case.

Everything is numpy over float64 arrays, so the same kernel serves:
- driver-side scalar bbox reprojection (functions.paths.reproject_bbox);
- executor-side bulk point reprojection via the Arrow-batched pandas UDF
  (:func:`reproject_points_udf`) — the scale path for per-scene footprint
  columns (vectorized per batch, no per-row Python).

Supported CRS: EPSG:4326 and UTM EPSG:326xx (north) / 327xx (south),
composed through 4326 for UTM→UTM.  Unknown codes raise ValueError.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0
_N0_SOUTH = 10000000.0

_n = _F / (2.0 - _F)  # third flattening

# rectifying radius: A = a/(1+n) (1 + n²/4 + n⁴/64 + n⁶/256)
_RECT_A = _A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0 + _n**6 / 256.0)

# Karney (2011) eq. 35 — forward series α_j
_ALPHA = np.array([
    _n / 2.0 - 2.0 / 3.0 * _n**2 + 5.0 / 16.0 * _n**3 + 41.0 / 180.0 * _n**4
    - 127.0 / 288.0 * _n**5 + 7891.0 / 37800.0 * _n**6,
    13.0 / 48.0 * _n**2 - 3.0 / 5.0 * _n**3 + 557.0 / 1440.0 * _n**4
    + 281.0 / 630.0 * _n**5 - 1983433.0 / 1935360.0 * _n**6,
    61.0 / 240.0 * _n**3 - 103.0 / 140.0 * _n**4 + 15061.0 / 26880.0 * _n**5
    + 167603.0 / 181440.0 * _n**6,
    49561.0 / 161280.0 * _n**4 - 179.0 / 168.0 * _n**5
    + 6601661.0 / 7257600.0 * _n**6,
    34729.0 / 80640.0 * _n**5 - 3418889.0 / 1995840.0 * _n**6,
    212378941.0 / 319334400.0 * _n**6,
])

# Karney (2011) eq. 36 — inverse series β_j
_BETA = np.array([
    _n / 2.0 - 2.0 / 3.0 * _n**2 + 37.0 / 96.0 * _n**3 - 1.0 / 360.0 * _n**4
    - 81.0 / 512.0 * _n**5 + 96199.0 / 604800.0 * _n**6,
    1.0 / 48.0 * _n**2 + 1.0 / 15.0 * _n**3 - 437.0 / 1440.0 * _n**4
    + 46.0 / 105.0 * _n**5 - 1118711.0 / 3870720.0 * _n**6,
    17.0 / 480.0 * _n**3 - 37.0 / 840.0 * _n**4 - 209.0 / 4480.0 * _n**5
    + 5569.0 / 90720.0 * _n**6,
    4397.0 / 161280.0 * _n**4 - 11.0 / 504.0 * _n**5
    - 830251.0 / 7257600.0 * _n**6,
    4583.0 / 161280.0 * _n**5 - 108847.0 / 3991680.0 * _n**6,
    20648693.0 / 638668800.0 * _n**6,
])

# conformal → geographic latitude series δ_j (Karney 2011, eq. 17/18 via
# GeographicLib's A3/C3 expansion of φ = χ + Σ δ_j sin 2jχ)
_DELTA = np.array([
    2.0 * _n - 2.0 / 3.0 * _n**2 - 2.0 * _n**3 + 116.0 / 45.0 * _n**4
    + 26.0 / 45.0 * _n**5 - 2854.0 / 675.0 * _n**6,
    7.0 / 3.0 * _n**2 - 8.0 / 5.0 * _n**3 - 227.0 / 45.0 * _n**4
    + 2704.0 / 315.0 * _n**5 + 2323.0 / 945.0 * _n**6,
    56.0 / 15.0 * _n**3 - 136.0 / 35.0 * _n**4 - 1262.0 / 105.0 * _n**5
    + 73814.0 / 2835.0 * _n**6,
    4279.0 / 630.0 * _n**4 - 332.0 / 35.0 * _n**5 - 399572.0 / 14175.0 * _n**6,
    4174.0 / 315.0 * _n**5 - 144838.0 / 6237.0 * _n**6,
    601676.0 / 22275.0 * _n**6,
])

_E_SQRT = 2.0 * np.sqrt(_n) / (1.0 + _n)  # = e, first eccentricity


def utm_forward(lat_deg, lon_deg, zone: int, northern: bool):
    """WGS84 (lat, lon) degrees → UTM (easting, northing) meters.

    Vectorized over numpy arrays (scalars also accepted)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon0 = np.radians(float(zone) * 6.0 - 183.0)
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64)) - lon0
    # conformal latitude via Gauss-Schreiber: τ' = sinh(asinh(tanφ) − e·atanh(e·sinφ))
    sphi = np.sin(lat)
    t = np.sinh(np.arcsinh(np.tan(lat)) - _E_SQRT * np.arctanh(_E_SQRT * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi = xi + _ALPHA[j] * np.sin(w * xi_p) * np.cosh(w * eta_p)
        eta = eta + _ALPHA[j] * np.cos(w * xi_p) * np.sinh(w * eta_p)
    easting = _E0 + _K0 * _RECT_A * eta
    northing = _K0 * _RECT_A * xi
    if not northern:
        northing = northing + _N0_SOUTH
    return easting, northing


def utm_inverse(easting, northing, zone: int, northern: bool):
    """UTM (easting, northing) meters → WGS84 (lat, lon) degrees."""
    e = np.asarray(easting, dtype=np.float64)
    nn = np.asarray(northing, dtype=np.float64)
    if not northern:
        nn = nn - _N0_SOUTH
    xi = nn / (_K0 * _RECT_A)
    eta = (e - _E0) / (_K0 * _RECT_A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi_p = xi_p - _BETA[j] * np.sin(w * xi) * np.cosh(w * eta)
        eta_p = eta_p - _BETA[j] * np.cos(w * xi) * np.sinh(w * eta)
    # Gauss-Schreiber → conformal latitude χ, longitude offset λ
    chi = np.arctan2(np.sin(xi_p), np.hypot(np.sinh(eta_p), np.cos(xi_p)))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    phi = chi.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        phi = phi + _DELTA[j] * np.sin(w * chi)
    lon0 = np.radians(float(zone) * 6.0 - 183.0)
    return np.degrees(phi), np.degrees(lam + lon0)


def _parse_utm_epsg(epsg: int) -> tuple[int, bool]:
    """EPSG 326xx/327xx → (zone, northern).  Raises on anything else."""
    zone = epsg % 100
    if not (1 <= zone <= 60):
        raise ValueError(f"EPSG:{epsg} is not a UTM code (bad zone {zone})")
    if 32601 <= epsg <= 32660:
        return zone, True
    if 32701 <= epsg <= 32760:
        return zone, False
    raise ValueError(f"unsupported CRS EPSG:{epsg} (need 4326 or UTM 326xx/327xx)")


def transform_points(x, y, src_epsg: int, dst_epsg: int):
    """Transform (x, y) arrays between EPSG:4326 (x=lon, y=lat) and UTM
    zones (x=easting, y=northing); UTM→UTM composes through 4326."""
    if src_epsg == dst_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if src_epsg == 4326:
        zone, northern = _parse_utm_epsg(dst_epsg)
        e_, n_ = utm_forward(y, x, zone, northern)
        return e_, n_
    if dst_epsg == 4326:
        zone, northern = _parse_utm_epsg(src_epsg)
        lat, lon = utm_inverse(x, y, zone, northern)
        return lon, lat
    lon, lat = transform_points(x, y, src_epsg, 4326)
    return transform_points(lon, lat, 4326, dst_epsg)


def reproject_points_udf(src_epsg: int, dst_epsg: int):
    """Arrow-batched pandas UDF ``(x, y) -> struct<x double, y double>`` —
    the executor-side bulk path for reprojecting point/footprint columns.
    One numpy evaluation per Arrow batch; no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<x: double, y: double>")
    def _reproject(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        ox, oy = transform_points(x.to_numpy(np.float64), y.to_numpy(np.float64),
                                  src_epsg, dst_epsg)
        return pd.DataFrame({"x": ox, "y": oy})

    return _reproject
