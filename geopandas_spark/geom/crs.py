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


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area (EPSG method 9820) — e.g. EPSG:3035
# (ETRS89-extended / LAEA Europe; ETRS89 ~ WGS84 to cm here).
# Formulas: EPSG Guidance Note 7-2.

_E = np.sqrt(_E2)


def _authalic_q(phi):
    s = np.sin(phi)
    return (1 - _E2) * (s / (1 - _E2 * s * s)
                        - (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s)))


_QP = float(_authalic_q(np.pi / 2))


def lonlat_to_laea(lon, lat, lon0: float, lat0: float, fe: float, fn: float):
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    phi0 = np.radians(lat0)
    q = _authalic_q(phi)
    q0 = float(_authalic_q(phi0))
    beta = np.arcsin(np.clip(q / _QP, -1, 1))
    beta0 = np.arcsin(np.clip(q0 / _QP, -1, 1))
    rq = WGS84_A * np.sqrt(_QP / 2)
    d = WGS84_A * (np.cos(phi0) / np.sqrt(1 - _E2 * np.sin(phi0) ** 2)) / (
        rq * np.cos(beta0))
    b = rq * np.sqrt(np.clip(
        2 / (1 + np.sin(beta0) * np.sin(beta)
             + np.cos(beta0) * np.cos(beta) * np.cos(lam)), 0, None))
    e_ = fe + (b * d) * np.cos(beta) * np.sin(lam)
    n_ = fn + (b / d) * (np.cos(beta0) * np.sin(beta)
                         - np.sin(beta0) * np.cos(beta) * np.cos(lam))
    return e_, n_


def laea_to_lonlat(x, y, lon0: float, lat0: float, fe: float, fn: float):
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = np.asarray(y, dtype=np.float64) - fn
    phi0 = np.radians(lat0)
    q0 = float(_authalic_q(phi0))
    beta0 = np.arcsin(np.clip(q0 / _QP, -1, 1))
    rq = WGS84_A * np.sqrt(_QP / 2)
    d = WGS84_A * (np.cos(phi0) / np.sqrt(1 - _E2 * np.sin(phi0) ** 2)) / (
        rq * np.cos(beta0))
    rho = np.hypot(xs / d, d * ys)
    c = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
    with np.errstate(divide="ignore", invalid="ignore"):
        qprime = _QP * (np.cos(c) * np.sin(beta0)
                        + np.where(rho == 0, 0.0,
                                   d * ys * np.sin(c) * np.cos(beta0) / rho))
    lam = np.arctan2(xs * np.sin(c),
                     d * rho * np.cos(beta0) * np.cos(c)
                     - d * d * ys * np.sin(beta0) * np.sin(c))
    phi = np.arcsin(np.clip(qprime / _QP, -1, 1))  # start: authalic lat
    for _ in range(6):
        s = np.sin(phi)
        phi = phi + ((1 - _E2 * s * s) ** 2 / (2 * np.cos(phi))) * (
            qprime / (1 - _E2) - s / (1 - _E2 * s * s)
            + (1 / (2 * _E)) * np.log((1 - _E * s) / (1 + _E * s)))
    return np.degrees(lam) + lon0, np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic 2SP (EPSG method 9802) — e.g. EPSG:2154
# (RGF93 / Lambert-93; RGF93 ~ WGS84 to cm).


def _lcc_m(phi):
    return np.cos(phi) / np.sqrt(1 - _E2 * np.sin(phi) ** 2)


def _lcc_t(phi):
    s = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / (
        (1 - _E * s) / (1 + _E * s)) ** (_E / 2)


def _lcc_consts(lat1, lat2, lat0):
    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    m1, m2 = _lcc_m(p1), _lcc_m(p2)
    t1, t2, t0 = _lcc_t(p1), _lcc_t(p2), _lcc_t(p0)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    f = m1 / (n * t1 ** n)
    rho0 = WGS84_A * f * t0 ** n
    return float(n), float(f), float(rho0)


def lonlat_to_lcc(lon, lat, lon0, lat0, lat1, lat2, fe, fn):
    n, f, rho0 = _lcc_consts(lat1, lat2, lat0)
    t = _lcc_t(np.radians(np.asarray(lat, dtype=np.float64)))
    rho = WGS84_A * f * t ** n
    th = n * (np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0))
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_to_lonlat(x, y, lon0, lat0, lat1, lat2, fe, fn):
    n, f, rho0 = _lcc_consts(lat1, lat2, lat0)
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xs, ys)
    tprime = (rho / (WGS84_A * f)) ** (1 / n)
    theta = np.arctan2(xs, ys)
    lam = theta / n + np.radians(lon0)
    phi = np.pi / 2 - 2 * np.arctan(tprime)
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            tprime * ((1 - _E * s) / (1 + _E * s)) ** (_E / 2))
    return np.degrees(lam), np.degrees(phi)


# EPSG registry of non-UTM projected CRSs the engine supports natively.
# Datum note: ETRS89 / RGF93 / NAD83 are treated as WGS84 (sub-decimeter
# at continental scale — the same shortcut pyproj-free pipelines use).
_PROJ_REGISTRY = {
    3035: ("laea", dict(lon0=10.0, lat0=52.0, fe=4321000.0, fn=3210000.0)),
    2154: ("lcc", dict(lon0=3.0, lat0=46.5, lat1=49.0, lat2=44.0,
                       fe=700000.0, fn=6600000.0)),
    5070: ("aea_unsupported", None),  # Albers: not yet implemented
}


def _to_lonlat(s, x, y):
    if s == 4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if s == 3857:
        return webmercator_to_lonlat(x, y)
    if 32601 <= s <= 32660 or 32701 <= s <= 32760:
        zone = s % 100
        lon0 = -183.0 + 6 * zone
        return tm_to_lonlat(x, y, lon0, s >= 32701)
    kind, p = _PROJ_REGISTRY.get(s, (None, None))
    if kind == "laea":
        return laea_to_lonlat(x, y, **p)
    if kind == "lcc":
        return lcc_to_lonlat(x, y, **p)
    raise ValueError(f"unsupported source CRS EPSG:{s} (supported: 4326, "
                     "3857, WGS84 UTM, 3035 LAEA, 2154 LCC)")


def _from_lonlat(d, lon, lat):
    if d == 4326:
        return lon, lat
    if d == 3857:
        return lonlat_to_webmercator(lon, lat)
    if 32601 <= d <= 32660 or 32701 <= d <= 32760:
        zone = d % 100
        lon0 = -183.0 + 6 * zone
        return lonlat_to_tm(lon, lat, lon0, d >= 32701)
    kind, p = _PROJ_REGISTRY.get(d, (None, None))
    if kind == "laea":
        return lonlat_to_laea(lon, lat, **p)
    if kind == "lcc":
        return lonlat_to_lcc(lon, lat, **p)
    raise ValueError(f"unsupported target CRS EPSG:{d} (supported: 4326, "
                     "3857, WGS84 UTM, 3035 LAEA, 2154 LCC)")


def transform_xy(x, y, src, dst):
    """Transform coordinate arrays between supported EPSG codes."""
    s = _parse_epsg(src)
    d = _parse_epsg(dst)
    if s == d:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = _to_lonlat(s, x, y)
    return _from_lonlat(d, lon, lat)


def estimate_utm_crs(minx: float, miny: float, maxx: float, maxy: float,
                     src: int | str = 4326) -> int:
    """UTM EPSG of the bounds center (array.py:456)."""
    s = _parse_epsg(src)
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    if s != 4326:
        lon, lat = transform_xy(np.array([cx]), np.array([cy]), s, 4326)
        cx, cy = float(lon[0]), float(lat[0])
    return _utm_zone_epsg(cx, cy)
