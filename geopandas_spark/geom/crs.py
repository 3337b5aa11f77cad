"""Coordinate reference system transforms — pyproj-free.

The reference delegates ``to_crs`` to pyproj's Transformer
(/root/reference/geopandas/array.py:384-456, cached transformer
array.py:17-19). pyproj is not available in this environment, so the
engine implements the public transformation formulas for the CRS pairs
that cover the geopandas test/benchmark surface:

* EPSG:4326 (WGS84 lon/lat degrees)
* EPSG:3857 (Web / spherical Mercator)
* EPSG:326xx / 327xx (WGS84 UTM north/south) — Karney-style series
  (Transverse Mercator, Kruger series to n^4, sub-mm accuracy)

``estimate_utm_crs`` (array.py:456) picks the UTM zone of the bounds
center. All functions are vectorized numpy over coordinate arrays.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1 / 298.257223563
_E2 = WGS84_F * (2 - WGS84_F)
_N = WGS84_F / (2 - WGS84_F)  # third flattening
_K0 = 0.9996
_FE = 500_000.0
_FN_S = 10_000_000.0

# Kruger series coefficients (alpha, beta) to n^4
_A_CAP = WGS84_A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64)
_ALPHA = np.array([
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440,
    61 * _N ** 3 / 240 - 103 * _N ** 4 / 140,
    49561 * _N ** 4 / 161280,
])
_BETA = np.array([
    _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96 - _N ** 4 / 360,
    _N ** 2 / 48 + _N ** 3 / 15 - 437 * _N ** 4 / 1440,
    17 * _N ** 3 / 480 - 37 * _N ** 4 / 840,
    4397 * _N ** 4 / 161280,
])


def _parse_epsg(crs) -> int:
    if isinstance(crs, int):
        return crs
    s = str(crs).upper().replace("EPSG:", "").strip()
    return int(s)


def lonlat_to_webmercator(lon, lat):
    x = np.radians(np.asarray(lon, dtype=np.float64)) * WGS84_A
    latc = np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999)
    y = WGS84_A * np.log(np.tan(np.pi / 4 + np.radians(latc) / 2))
    return x, y


def webmercator_to_lonlat(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WGS84_A)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / WGS84_A)) - np.pi / 2)
    return lon, lat


def _utm_zone_epsg(lon: float, lat: float) -> int:
    zone = int(np.floor((lon + 180) / 6)) % 60 + 1
    return (32600 if lat >= 0 else 32700) + zone


def lonlat_to_tm(lon, lat, lon0_deg: float, south: bool):
    """Transverse Mercator forward (Kruger series)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    e = np.sqrt(_E2)
    # conformal latitude
    t = np.sinh(np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        xi = xi + _ALPHA[j] * np.sin(2 * (j + 1) * xi_p) * np.cosh(2 * (j + 1) * eta_p)
        eta = eta + _ALPHA[j] * np.cos(2 * (j + 1) * xi_p) * np.sinh(2 * (j + 1) * eta_p)
    x = _K0 * _A_CAP * eta + _FE
    y = _K0 * _A_CAP * xi + (_FN_S if south else 0.0)
    return x, y


def tm_to_lonlat(x, y, lon0_deg: float, south: bool):
    """Transverse Mercator inverse (Kruger series)."""
    eta = (np.asarray(x, dtype=np.float64) - _FE) / (_K0 * _A_CAP)
    xi = (np.asarray(y, dtype=np.float64) - (_FN_S if south else 0.0)) / (_K0 * _A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(4):
        xi_p = xi_p - _BETA[j] * np.sin(2 * (j + 1) * xi) * np.cosh(2 * (j + 1) * eta)
        eta_p = eta_p - _BETA[j] * np.cos(2 * (j + 1) * xi) * np.sinh(2 * (j + 1) * eta)
    e = np.sqrt(_E2)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal -> geodetic latitude: atanh(sin phi) = psi + e atanh(e sin phi)
    psi = np.arctanh(np.sin(chi))
    phi = chi.copy()
    for _ in range(8):
        phi = np.arcsin(np.tanh(psi + e * np.arctanh(e * np.sin(phi))))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def transform_xy(x, y, src, dst):
    """Transform coordinate arrays between supported EPSG codes."""
    s = _parse_epsg(src)
    d = _parse_epsg(dst)
    if s == d:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    # normalize to lon/lat
    if s == 4326:
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    elif s == 3857:
        lon, lat = webmercator_to_lonlat(x, y)
    elif 32601 <= s <= 32660 or 32701 <= s <= 32760:
        zone = s % 100
        lon0 = -183.0 + 6 * zone
        lon, lat = tm_to_lonlat(x, y, lon0, s >= 32701)
    else:
        raise ValueError(f"unsupported source CRS EPSG:{s} "
                         "(supported: 4326, 3857, WGS84 UTM)")
    if d == 4326:
        return lon, lat
    if d == 3857:
        return lonlat_to_webmercator(lon, lat)
    if 32601 <= d <= 32660 or 32701 <= d <= 32760:
        zone = d % 100
        lon0 = -183.0 + 6 * zone
        return lonlat_to_tm(lon, lat, lon0, d >= 32701)
    raise ValueError(f"unsupported target CRS EPSG:{d}")


def estimate_utm_crs(minx: float, miny: float, maxx: float, maxy: float,
                     src: int | str = 4326) -> int:
    """UTM EPSG of the bounds center (array.py:456)."""
    s = _parse_epsg(src)
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    if s != 4326:
        lon, lat = transform_xy(np.array([cx]), np.array([cy]), s, 4326)
        cx, cy = float(lon[0]), float(lat[0])
    return _utm_zone_epsg(cx, cy)
