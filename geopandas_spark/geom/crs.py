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


# ---------------------------------------------------------------------------
# Generic parameterized projections (round 4): Albers Equal Area (EPSG
# method 9822), Transverse Mercator with arbitrary origin/scale/ellipsoid
# (9807 via Kruger series), plus a 7-parameter Helmert datum shift for
# non-WGS84 datums (OSGB36). Formulas: EPSG Guidance Note 7-2 and
# Karney (2011), both public.

# ellipsoid name -> (semi-major a, flattening f)
_ELLIPSOIDS = {
    "WGS84": (6378137.0, 1 / 298.257223563),
    "GRS80": (6378137.0, 1 / 298.257222101),
    "airy": (6377563.396, 1 / 299.3249646),
    "intl": (6378388.0, 1 / 297.0),
    "clrk66": (6378206.4, 1 / 294.9786982138982),  # Clarke 1866 (NAD27)
}

# datum -> Helmert params TO WGS84: (tx, ty, tz [m], rx, ry, rz [arcsec],
# ds [ppm]); position-vector convention (EPSG 9606). OSGB36 from the
# OS national standard transformation (~2 m accuracy, the published
# single-Helmert figure). NAD27 is the CONUS 3-parameter shift
# (EPSG 1173 towgs84 -8,160,176): the real NAD27<->NAD83 transformation
# is the NADCON grid, which this engine does not embed — the single
# Helmert is accurate to ~5-10 m over CONUS and degrades toward
# Alaska/Canada; callers needing survey accuracy should reproject
# upstream.
_DATUM_TO_WGS84 = {
    "OSGB36": (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
    "NAD27": (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0),
}


def _geodetic_to_xyz(lon, lat, a, f):
    e2 = f * (2 - f)
    phi = np.radians(lat)
    lam = np.radians(lon)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    x = nu * np.cos(phi) * np.cos(lam)
    y = nu * np.cos(phi) * np.sin(lam)
    z = nu * (1 - e2) * np.sin(phi)
    return x, y, z


def _xyz_to_geodetic(x, y, z, a, f):
    e2 = f * (2 - f)
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1 - e2))
    for _ in range(6):
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        phi = np.arctan2(z + e2 * nu * np.sin(phi), p)
    return np.degrees(lam), np.degrees(phi)


def _helmert(x, y, z, p, inverse=False):
    tx, ty, tz, rx, ry, rz, ds = p
    rx, ry, rz = (np.radians(v / 3600.0) for v in (rx, ry, rz))
    s = 1 + ds * 1e-6
    if inverse:
        # exact inverse of the position-vector transform
        xs = (np.asarray(x) - tx)
        ys = (np.asarray(y) - ty)
        zs = (np.asarray(z) - tz)
        x2 = (xs + rz * ys - ry * zs) / s
        y2 = (-rz * xs + ys + rx * zs) / s
        z2 = (ry * xs - rx * ys + zs) / s
        return x2, y2, z2
    x2 = tx + s * (np.asarray(x) - rz * y + ry * z)
    y2 = ty + s * (rz * np.asarray(x) + y - rx * z)
    z2 = tz + s * (-ry * np.asarray(x) + rx * y + z)
    return x2, y2, z2


def _datum_params(datum):
    """Named embedded datum or a raw towgs84 7-tuple (tx ty tz rx ry rz
    ds, position-vector convention)."""
    return _DATUM_TO_WGS84[datum] if isinstance(datum, str) else tuple(datum)


def _datum_to_wgs84(lon, lat, datum, a, f):
    if datum is None:
        return lon, lat
    x, y, z = _geodetic_to_xyz(lon, lat, a, f)
    x, y, z = _helmert(x, y, z, _datum_params(datum))
    return _xyz_to_geodetic(x, y, z, *_ELLIPSOIDS["WGS84"])


def _wgs84_to_datum(lon, lat, datum, a, f):
    if datum is None:
        return lon, lat
    x, y, z = _geodetic_to_xyz(lon, lat, *_ELLIPSOIDS["WGS84"])
    x, y, z = _helmert(x, y, z, _datum_params(datum), inverse=True)
    return _xyz_to_geodetic(x, y, z, a, f)


def _kruger_consts(a, f):
    """Kruger series constants (A_CAP, alpha[4], beta[4]) for an
    arbitrary ellipsoid — same series the module-level WGS84 constants
    are built from."""
    n = f / (2 - f)
    a_cap = a / (1 + n) * (1 + n ** 2 / 4 + n ** 4 / 64)
    alpha = np.array([
        n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16 + 41 * n ** 4 / 180,
        13 * n ** 2 / 48 - 3 * n ** 3 / 5 + 557 * n ** 4 / 1440,
        61 * n ** 3 / 240 - 103 * n ** 4 / 140,
        49561 * n ** 4 / 161280,
    ])
    beta = np.array([
        n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96 - n ** 4 / 360,
        n ** 2 / 48 + n ** 3 / 15 - 437 * n ** 4 / 1440,
        17 * n ** 3 / 480 - 37 * n ** 4 / 840,
        4397 * n ** 4 / 161280,
    ])
    return a_cap, alpha, beta


def _tm_xi_eta(lon, lat, lon0, e2, alpha):
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    e = np.sqrt(e2)
    t = np.sinh(np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        xi = xi + alpha[j] * np.sin(2 * (j + 1) * xi_p) * np.cosh(2 * (j + 1) * eta_p)
        eta = eta + alpha[j] * np.cos(2 * (j + 1) * xi_p) * np.sinh(2 * (j + 1) * eta_p)
    return xi, eta


def lonlat_to_tm_generic(lon, lat, lon0, lat0, k0, fe, fn,
                         ellps="WGS84"):
    a, f = _ELLIPSOIDS[ellps]
    e2 = f * (2 - f)
    a_cap, alpha, _ = _kruger_consts(a, f)
    xi, eta = _tm_xi_eta(lon, lat, lon0, e2, alpha)
    # natural-origin offset: the meridian arc to lat0 (xi at lam=0)
    m0 = 0.0
    if lat0:
        xi0, _ = _tm_xi_eta(np.array([lon0]), np.array([lat0]), lon0,
                            e2, alpha)
        m0 = float(k0 * a_cap * xi0[0])
    return k0 * a_cap * eta + fe, k0 * a_cap * xi - m0 + fn


def tm_generic_to_lonlat(x, y, lon0, lat0, k0, fe, fn, ellps="WGS84"):
    a, f = _ELLIPSOIDS[ellps]
    e2 = f * (2 - f)
    a_cap, alpha, beta = _kruger_consts(a, f)
    m0 = 0.0
    if lat0:
        xi0, _ = _tm_xi_eta(np.array([lon0]), np.array([lat0]), lon0,
                            e2, alpha)
        m0 = float(k0 * a_cap * xi0[0])
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * a_cap)
    xi = (np.asarray(y, dtype=np.float64) - fn + m0) / (k0 * a_cap)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(4):
        xi_p = xi_p - beta[j] * np.sin(2 * (j + 1) * xi) * np.cosh(2 * (j + 1) * eta)
        eta_p = eta_p - beta[j] * np.cos(2 * (j + 1) * xi) * np.sinh(2 * (j + 1) * eta)
    e = np.sqrt(e2)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    psi = np.arctanh(np.sin(chi))
    phi = chi.copy()
    for _ in range(8):
        phi = np.arcsin(np.tanh(psi + e * np.arctanh(e * np.sin(phi))))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0, np.degrees(phi)


def _authalic_q_e(phi, e2):
    e = np.sqrt(e2)
    s = np.sin(phi)
    return (1 - e2) * (s / (1 - e2 * s * s)
                       - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))


def lonlat_to_aea(lon, lat, lon0, lat0, lat1, lat2, fe, fn,
                  ellps="GRS80"):
    """Albers Equal Area forward (EPSG method 9822)."""
    a, f = _ELLIPSOIDS[ellps]
    e2 = f * (2 - f)
    p0, p1, p2 = (np.radians(v) for v in (lat0, lat1, lat2))
    m1 = np.cos(p1) / np.sqrt(1 - e2 * np.sin(p1) ** 2)
    m2 = np.cos(p2) / np.sqrt(1 - e2 * np.sin(p2) ** 2)
    q0, q1, q2 = (_authalic_q_e(p, e2) for p in (p0, p1, p2))
    n = (m1 ** 2 - m2 ** 2) / (q2 - q1)
    c = m1 ** 2 + n * q1
    rho0 = a * np.sqrt(c - n * q0) / n
    q = _authalic_q_e(np.radians(np.asarray(lat, dtype=np.float64)), e2)
    rho = a * np.sqrt(np.clip(c - n * q, 0, None)) / n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def aea_to_lonlat(x, y, lon0, lat0, lat1, lat2, fe, fn, ellps="GRS80"):
    """Albers Equal Area inverse (EPSG method 9822)."""
    a, f = _ELLIPSOIDS[ellps]
    e2 = f * (2 - f)
    e = np.sqrt(e2)
    p0, p1, p2 = (np.radians(v) for v in (lat0, lat1, lat2))
    m1 = np.cos(p1) / np.sqrt(1 - e2 * np.sin(p1) ** 2)
    m2 = np.cos(p2) / np.sqrt(1 - e2 * np.sin(p2) ** 2)
    q0, q1, q2 = (_authalic_q_e(p, e2) for p in (p0, p1, p2))
    n = (m1 ** 2 - m2 ** 2) / (q2 - q1)
    c = m1 ** 2 + n * q1
    rho0 = a * np.sqrt(c - n * q0) / n
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.hypot(xs, ys)
    if n < 0:
        rho = -rho
        xs, ys = -xs, -ys
    theta = np.arctan2(xs, ys)
    q = (c - (rho * n / a) ** 2) / n
    phi = np.arcsin(np.clip(q / 2, -1, 1))  # spherical start
    for _ in range(8):
        s = np.sin(phi)
        phi = phi + ((1 - e2 * s * s) ** 2 / (2 * np.cos(phi))) * (
            q / (1 - e2) - s / (1 - e2 * s * s)
            + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))
    return np.degrees(theta / n) + lon0, np.degrees(phi)


# EPSG registry of non-UTM projected CRSs the engine supports natively.
# Datum note: ETRS89 / RGF93 / NAD83 / GDA94 / NZGD2000 are treated as
# WGS84 (sub-decimeter at continental scale — the same shortcut
# pyproj-free pipelines use); OSGB36 gets a real Helmert shift. The
# legacy 3035/2154 entries keep the module-level WGS84-constant kernels
# (bit-stable against the existing SQL oracles); new entries use the
# generic parameterized kernels.
_PROJ_REGISTRY = {
    3035: ("laea", dict(lon0=10.0, lat0=52.0, fe=4321000.0, fn=3210000.0)),
    2154: ("lcc", dict(lon0=3.0, lat0=46.5, lat1=49.0, lat2=44.0,
                       fe=700000.0, fn=6600000.0)),
    # NAD83 / Conus Albers
    5070: ("aea", dict(lon0=-96.0, lat0=23.0, lat1=29.5, lat2=45.5,
                       fe=0.0, fn=0.0, ellps="GRS80"), None),
    # NAD83 / California Albers
    3310: ("aea", dict(lon0=-120.0, lat0=0.0, lat1=34.0, lat2=40.5,
                       fe=0.0, fn=-4000000.0, ellps="GRS80"), None),
    # GDA94 / Australian Albers
    3577: ("aea", dict(lon0=132.0, lat0=0.0, lat1=-18.0, lat2=-36.0,
                       fe=0.0, fn=0.0, ellps="GRS80"), None),
    # OSGB36 / British National Grid (Airy ellipsoid + Helmert datum)
    27700: ("tm", dict(lon0=-2.0, lat0=49.0, k0=0.9996012717,
                       fe=400000.0, fn=-100000.0, ellps="airy"), "OSGB36"),
    # NZGD2000 / New Zealand Transverse Mercator
    2193: ("tm", dict(lon0=173.0, lat0=0.0, k0=0.9996,
                      fe=1600000.0, fn=10000000.0, ellps="GRS80"), None),
    # NAD27 geographic (Clarke 1866 + CONUS 3-param Helmert; see the
    # accuracy note on _DATUM_TO_WGS84 — ~5-10 m vs the NADCON grid)
    4267: ("geo", dict(ellps="clrk66"), "NAD27"),
}

_SUPPORTED_MSG = ("4326, 3857, WGS84 UTM 326xx/327xx, ETRS89 UTM 258xx, "
                  "3035 LAEA, 2154 LCC, Albers 5070/3310/3577, "
                  "27700 BNG, 2193 NZTM, 4267 NAD27, or any CRS added via "
                  "register_crs(code, method, **params)")

# user-registered projected CRSs (register_crs). Kept separate from the
# built-ins so a snapshot can travel inside UDF closures to the executor
# processes (the driver-side dict is NOT visible to Spark workers).
_USER_REGISTRY: dict[int, tuple] = {}

_METHOD_PARAMS = {
    "tm": ("lon0", "lat0", "k0", "fe", "fn"),
    "aea": ("lon0", "lat0", "lat1", "lat2", "fe", "fn"),
    "lcc": ("lon0", "lat0", "lat1", "lat2", "fe", "fn"),
    "laea": ("lon0", "lat0", "fe", "fn"),
    "geo": (),  # geographic CRS: datum shift only, no projection
}


def register_crs(code, method: str, datum=None,
                 ellps: str = "WGS84", towgs84=None, **params) -> None:
    """Register a projected CRS by EPSG projection method + parameters.

    The reference delegates ``to_crs`` to pyproj's full EPSG database
    (array.py:384); this engine instead ships the four projection
    methods that cover the overwhelming majority of projected CRSs in
    real datasets — Transverse Mercator (EPSG 9807: every UTM /
    Gauss-Krueger / state-plane-TM / national TM grid), Albers
    equal-area (9822), Lambert conformal conic (9802) and Lambert
    azimuthal equal-area (9820) — and lets the user bind any EPSG code
    to one of them with that code's published parameters:

        register_crs(32633)                      # nothing to do: built in
        register_crs(26917, "tm", lon0=-81, lat0=0, k0=0.9996,
                     fe=500000, fn=0, ellps="GRS80")   # NAD83 / UTM 17N
        register_crs(4806, "geo", ellps="intl",        # proj-style datum
                     towgs84=(-104.1, -49.1, -9.9, 0.971, -2.917,
                              0.714, -11.68))          # Monte Mario ex.

    ``ellps`` is one of the embedded ellipsoids (WGS84/GRS80/airy/intl/
    clrk66). The datum shift is either ``datum`` — an embedded named
    Helmert (OSGB36, NAD27) — or ``towgs84``, a raw proj-style 7-tuple
    (tx ty tz [m], rx ry rz [arcsec], ds [ppm]; position-vector
    convention; 3-tuples are zero-padded), for ``tm``/``aea``/``geo``
    methods. ``geo`` registers a GEOGRAPHIC CRS (no projection — the
    transform is the datum shift alone), the route for NAD27-family or
    other legacy-datum lon/lat data. Accuracy note: a single Helmert is
    a ~1-10 m approximation of grid-based transformations (NADCON,
    NTv2); the engine raises no further warning — callers needing
    survey-grade accuracy should reproject upstream. The ``lcc``/
    ``laea`` kernels are the WGS84-constant ones used by the built-in
    2154/3035 entries. Registration validates the parameters with a
    forward/inverse round-trip probe and raises on disagreement. Worker
    note: plan-time snapshots of this registry travel inside the
    transform UDF closures, so registrations made on the driver BEFORE
    building a plan work on a real cluster; mutations after plan
    creation only affect new plans.
    """
    code = _parse_epsg(code)
    if method not in _METHOD_PARAMS:
        raise ValueError(
            f"unknown projection method {method!r} "
            f"(supported: {sorted(_METHOD_PARAMS)})")
    want = _METHOD_PARAMS[method]
    missing = [k for k in want if k not in params]
    extra = [k for k in params if k not in want]
    if missing or extra:
        raise ValueError(
            f"register_crs({code}, {method!r}): parameters must be exactly "
            f"{want} (missing {missing}, unexpected {extra})")
    if ellps not in _ELLIPSOIDS:
        raise ValueError(f"unknown ellipsoid {ellps!r} "
                         f"(embedded: {sorted(_ELLIPSOIDS)})")
    if towgs84 is not None:
        if datum is not None:
            raise ValueError("pass either datum= (named) or towgs84= "
                             "(7-param), not both")
        t = tuple(float(v) for v in towgs84)
        if len(t) == 3:
            t = t + (0.0, 0.0, 0.0, 0.0)
        if len(t) != 7:
            raise ValueError("towgs84 must have 3 or 7 parameters "
                             "(tx ty tz [rx ry rz ds])")
        datum = t
    if isinstance(datum, str) and datum not in _DATUM_TO_WGS84:
        raise ValueError(f"unknown datum {datum!r} (embedded Helmert "
                         f"shifts: {sorted(_DATUM_TO_WGS84)}; or pass "
                         "towgs84=(tx,ty,tz,rx,ry,rz,ds))")
    if method in ("lcc", "laea") and (ellps != "WGS84" or datum is not None):
        raise ValueError(
            f"the {method} kernel is the WGS84-constant one (built-in "
            "3035/2154 entries); non-WGS84 ellipsoids/datums are only "
            "implemented for tm/aea/geo")
    p = dict(params)
    if method in ("tm", "aea", "geo"):
        p["ellps"] = ellps
    entry = (method, p, datum)
    # forward/inverse round-trip probe near the projection center: a
    # typo'd parameter set fails loudly at registration, not as NaNs in
    # a distributed job
    if method == "geo":
        lon_probe, lat_probe = 1.0, 45.0
    elif method in ("aea", "lcc"):
        lat_probe = (float(params["lat1"]) + float(params["lat2"])) / 2.0
        lon_probe = float(params["lon0"]) + 1.0
    else:
        lat_probe = min(80.0, max(-80.0, float(params["lat0"]) + 5.0))
        lon_probe = float(params["lon0"]) + 1.0
    lon_a = np.array([lon_probe])
    lat_a = np.array([lat_probe])
    _USER_REGISTRY[code] = entry
    try:
        x, y = _from_lonlat(code, lon_a, lat_a)
        lon2, lat2 = _to_lonlat(code, x, y)
        if (not np.all(np.isfinite([x, y, lon2, lat2]))
                or abs(float(lon2[0]) - lon_probe) > 1e-6
                or abs(float(lat2[0]) - lat_probe) > 1e-6):
            raise ValueError(
                f"register_crs({code}): forward/inverse round-trip "
                f"disagrees at ({lon_probe}, {lat_probe}) -> "
                f"({float(lon2[0])}, {float(lat2[0])}) — check parameters")
    except Exception:
        _USER_REGISTRY.pop(code, None)
        raise


_PROJ_METHOD_MAP = {
    # +proj= name -> (engine method, {proj key -> engine param})
    "tmerc": ("tm", {"lon_0": "lon0", "lat_0": "lat0", "k": "k0",
                     "k_0": "k0", "x_0": "fe", "y_0": "fn"}),
    "utm": ("tm", {}),  # handled specially (zone/south)
    "aea": ("aea", {"lon_0": "lon0", "lat_0": "lat0", "lat_1": "lat1",
                    "lat_2": "lat2", "x_0": "fe", "y_0": "fn"}),
    "lcc": ("lcc", {"lon_0": "lon0", "lat_0": "lat0", "lat_1": "lat1",
                    "lat_2": "lat2", "x_0": "fe", "y_0": "fn"}),
    "laea": ("laea", {"lon_0": "lon0", "lat_0": "lat0", "x_0": "fe",
                      "y_0": "fn"}),
    "longlat": ("geo", {}),
    "latlong": ("geo", {}),
}

_PROJ_ELLPS = {"wgs84": "WGS84", "grs80": "GRS80", "airy": "airy",
               "intl": "intl", "clrk66": "clrk66"}


def register_crs_proj(code, proj: str | dict) -> None:
    """Bind an EPSG code to a proj-style definition — the escape hatch
    for CRSs the registry lacks, without engine changes (ref
    geoseries.py:878 accepts proj strings via pyproj).

    Accepts a proj.4 string (``"+proj=tmerc +lat_0=0 +lon_0=-81
    +k=0.9996 +x_0=500000 +y_0=0 +ellps=GRS80 +towgs84=-8,160,176"``)
    or the equivalent dict. Supported ``+proj`` values: tmerc, utm
    (zone/south), aea, lcc, laea, longlat/latlong (geographic datum
    shift only); ``+ellps`` one of WGS84/GRS80/airy/intl/clrk66
    (``+datum=NAD27/WGS84`` sets ellipsoid+shift); ``+towgs84`` 3- or
    7-parameter. Anything else raises naming the unsupported key —
    grid-based datum transforms (+nadgrids) are out of scope (see the
    accuracy note on register_crs)."""
    if isinstance(proj, str):
        d: dict = {}
        for tok in proj.split():
            tok = tok.lstrip("+")
            if not tok:
                continue
            k, _, v = tok.partition("=")
            d[k] = v if v != "" else True
    else:
        d = {k.lstrip("+"): v for k, v in dict(proj).items()}
    d.pop("no_defs", None)
    d.pop("type", None)
    d.pop("units", None)  # metres assumed; degree units only for geo
    if "nadgrids" in d:
        raise ValueError("+nadgrids (grid-based datum transform) is not "
                         "supported — use +towgs84 (Helmert, ~1-10 m) or "
                         "reproject upstream")
    name = str(d.pop("proj", "")).lower()
    if name not in _PROJ_METHOD_MAP:
        raise ValueError(f"unsupported +proj={name!r} (supported: "
                         f"{sorted(_PROJ_METHOD_MAP)})")
    method, keymap = _PROJ_METHOD_MAP[name]
    ellps = "WGS84"
    if "datum" in d:
        datum_name = str(d.pop("datum")).upper()
        if datum_name == "NAD27":
            ellps = "clrk66"
            d.setdefault("towgs84", "-8,160,176")
        elif datum_name in ("WGS84", "NAD83", "ETRS89", "GDA94"):
            ellps = "WGS84" if datum_name == "WGS84" else "GRS80"
        else:
            raise ValueError(f"unsupported +datum={datum_name!r} — pass "
                             "+ellps and +towgs84 explicitly")
    if "ellps" in d:
        e = str(d.pop("ellps")).lower()
        if e not in _PROJ_ELLPS:
            raise ValueError(f"unsupported +ellps={e!r} "
                             f"(embedded: {sorted(_PROJ_ELLPS.values())})")
        ellps = _PROJ_ELLPS[e]
    towgs84 = None
    if "towgs84" in d:
        towgs84 = tuple(float(v) for v in str(d.pop("towgs84")).split(","))
        if all(v == 0.0 for v in towgs84):
            towgs84 = None  # identity shift == WGS84-equivalent datum
    params: dict = {}
    if name == "utm":
        zone = int(d.pop("zone"))
        south = bool(d.pop("south", False))
        params = dict(lon0=-183.0 + 6 * zone, lat0=0.0, k0=0.9996,
                      fe=500000.0, fn=10000000.0 if south else 0.0)
    elif method != "geo":
        for pk, ek in keymap.items():
            if pk in d:
                params[ek] = float(d.pop(pk))
        # proj defaults for omitted keys
        defaults = {"lon0": 0.0, "lat0": 0.0, "k0": 1.0, "fe": 0.0,
                    "fn": 0.0, "lat1": params.get("lat0", 0.0),
                    "lat2": params.get("lat0", 0.0)}
        for ek in _METHOD_PARAMS[method]:
            params.setdefault(ek, defaults[ek])
    leftovers = set(d)
    if leftovers:
        raise ValueError(f"unsupported proj keys {sorted(leftovers)} for "
                         f"+proj={name}")
    register_crs(code, method, ellps=ellps, towgs84=towgs84, **params)


def user_registry_snapshot() -> dict:
    """Plan-time snapshot of user registrations, for UDF closures."""
    return dict(_USER_REGISTRY)


def restore_user_registry(snap: dict) -> None:
    """Worker-side: merge a plan-time snapshot into this process."""
    if snap:
        _USER_REGISTRY.update(snap)


def _registry_entry(code):
    got = _PROJ_REGISTRY.get(code)
    return got if got is not None else _USER_REGISTRY.get(code)


def _registry_inverse(s, x, y):
    entry = _registry_entry(s)
    kind, p = entry[0], entry[1]
    datum = entry[2] if len(entry) > 2 else None
    if kind == "laea":
        return laea_to_lonlat(x, y, **p)
    if kind == "lcc":
        return lcc_to_lonlat(x, y, **p)
    if kind == "aea":
        lon, lat = aea_to_lonlat(x, y, **p)
    elif kind == "tm":
        lon, lat = tm_generic_to_lonlat(x, y, **p)
    elif kind == "geo":
        # geographic CRS: coordinates ARE datum lon/lat
        lon = np.asarray(x, dtype=np.float64)
        lat = np.asarray(y, dtype=np.float64)
    else:  # pragma: no cover
        raise ValueError(kind)
    a, f = _ELLIPSOIDS[p.get("ellps", "WGS84")]
    return _datum_to_wgs84(lon, lat, datum, a, f)


def _registry_forward(d, lon, lat):
    entry = _registry_entry(d)
    kind, p = entry[0], entry[1]
    datum = entry[2] if len(entry) > 2 else None
    if kind == "laea":
        return lonlat_to_laea(lon, lat, **p)
    if kind == "lcc":
        return lonlat_to_lcc(lon, lat, **p)
    a, f = _ELLIPSOIDS[p.get("ellps", "WGS84")]
    lon, lat = _wgs84_to_datum(lon, lat, datum, a, f)
    if kind == "aea":
        return lonlat_to_aea(lon, lat, **p)
    if kind == "tm":
        return lonlat_to_tm_generic(lon, lat, **p)
    if kind == "geo":
        return lon, lat
    raise ValueError(kind)  # pragma: no cover


def _to_lonlat(s, x, y):
    if s in (4326, 4258, 4269):  # ETRS89/NAD83 geographic ~ WGS84
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if s == 3857:
        return webmercator_to_lonlat(x, y)
    if 32601 <= s <= 32660 or 32701 <= s <= 32760:
        zone = s % 100
        lon0 = -183.0 + 6 * zone
        return tm_to_lonlat(x, y, lon0, s >= 32701)
    if 25828 <= s <= 25838:  # ETRS89 / UTM zone 28N-38N (GRS80 ~ WGS84)
        return tm_to_lonlat(x, y, -183.0 + 6 * (s - 25800), False)
    if s in _PROJ_REGISTRY or s in _USER_REGISTRY:
        return _registry_inverse(s, x, y)
    raise ValueError(
        f"unsupported source CRS EPSG:{s} (supported: {_SUPPORTED_MSG})")


def _from_lonlat(d, lon, lat):
    if d in (4326, 4258, 4269):
        return lon, lat
    if d == 3857:
        return lonlat_to_webmercator(lon, lat)
    if 32601 <= d <= 32660 or 32701 <= d <= 32760:
        zone = d % 100
        lon0 = -183.0 + 6 * zone
        return lonlat_to_tm(lon, lat, lon0, d >= 32701)
    if 25828 <= d <= 25838:
        return lonlat_to_tm(lon, lat, -183.0 + 6 * (d - 25800), False)
    if d in _PROJ_REGISTRY or d in _USER_REGISTRY:
        return _registry_forward(d, lon, lat)
    raise ValueError(
        f"unsupported target CRS EPSG:{d} (supported: {_SUPPORTED_MSG})")


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
