"""Scalar kernels vs hand-computed expectations (values pinned from the
reference docstrings, e.g. GeoSeries.area -> [0.5, 25.0, 2.0, 0.0, 0.0]
pattern at base.py:65-71, adapted to our fixtures)."""

import numpy as np
import pytest

from geopandas_spark.geom import kernels as K
from geopandas_spark.geom import transforms as T
from geopandas_spark.geom import wkt as W


def P(*w):
    return W.from_wkt(list(w))


FIX = P(
    "POLYGON ((0 0, 1 0, 1 1, 0 0))",        # t1: area .5
    "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",    # square: 25
    "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))",    # rect: 2
    "LINESTRING (0 0, 3 4)",                  # len 5
    "POINT (5 5)",
    None,
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",  # 96
)


def test_area():
    a = K.area(FIX)
    assert np.allclose(a[:5], [0.5, 25.0, 2.0, 0.0, 0.0])
    assert np.isnan(a[5])
    assert a[6] == 96.0


def test_length():
    ln = K.length(FIX)
    assert ln[3] == 5.0
    assert ln[1] == 20.0
    assert ln[6] == 48.0  # 40 exterior + 8 hole
    assert np.isnan(ln[5])


def test_bounds_total_bounds():
    b = K.bounds(FIX)
    assert list(b[1]) == [0, 0, 5, 5]
    assert np.isnan(b[5]).all()
    # total_bounds = plain min/max agg (base.py:4703)
    tb = [np.nanmin(b[:, 0]), np.nanmin(b[:, 1]), np.nanmax(b[:, 2]), np.nanmax(b[:, 3])]
    assert tb == [0, 0, 10, 10]


def test_centroid():
    c = K.centroid(FIX)
    assert np.allclose(c[1], [2.5, 2.5])
    assert np.allclose(c[4], [5, 5])
    assert np.allclose(c[3], [1.5, 2.0])
    # hole-aware: (100*5 - 4*3)/96
    assert np.allclose(c[6], [(500 - 12) / 96, (500 - 12) / 96])


def test_point_in_polygon_boundary_semantics():
    poly = P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    st = K.points_in_geom(
        np.array([2.0, 0.0, 4.0, 5.0, 2.0]),
        np.array([2.0, 0.0, 2.0, 5.0, 4.0]), poly, 0)
    assert list(st) == [K.INSIDE, K.BOUNDARY, K.BOUNDARY, K.OUTSIDE, K.BOUNDARY]


def test_pip_with_hole():
    poly = P("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    st = K.points_in_geom(np.array([3.0, 1.0, 2.0]), np.array([3.0, 1.0, 3.0]), poly, 0)
    assert list(st) == [K.OUTSIDE, K.INSIDE, K.BOUNDARY]


def test_x_y():
    pts = P("POINT (1 2)", "POINT (3 4)", None)
    assert list(K.get_x(pts)[:2]) == [1, 3]
    assert np.isnan(K.get_x(pts)[2])
    with pytest.raises(ValueError):
        K.get_x(FIX)


def test_counts():
    assert list(K.count_coordinates(FIX)) == [4, 5, 5, 2, 1, 0, 10]
    multi = P("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert K.count_geometries(multi)[0] == 2
    assert K.count_interior_rings(FIX)[6] == 1


def test_affine_family():
    sq = P("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    t = T.translate(sq, 1, 1)
    assert list(K.bounds(t)[0]) == [1, 1, 3, 3]
    s = T.scale(sq, 2, 2, origin=(0, 0))
    assert list(K.bounds(s)[0]) == [0, 0, 4, 4]
    r = T.rotate(sq, 90, origin=(0, 0))
    assert np.allclose(K.bounds(r)[0], [-2, 0, 0, 2])
    assert np.allclose(K.area(r), 4.0)


def test_envelope_convex_hull():
    tri = P("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    env = T.envelope(tri)
    assert K.area(env)[0] == 1.0
    pts = P("MULTIPOINT ((0 0), (1 0), (1 1), (0.5 0.2))")
    h = T.convex_hull(pts)
    assert np.isclose(K.area(h)[0], 0.5)


def test_buffer_points():
    pts = P("POINT (0 0)")
    buf = T.buffer_points(pts, 1.0, quad_segs=64)
    assert abs(K.area(buf)[0] - np.pi) < 0.01
    with pytest.raises(NotImplementedError):
        T.buffer_points(P("LINESTRING (0 0, 1 1)"), 1.0)


def test_simplify():
    line = W.from_wkt(["LINESTRING (0 0, 1 0.001, 2 0, 3 0.001, 4 0)"])
    s = T.simplify(line, 0.01)
    assert K.count_coordinates(s)[0] == 2


def test_clip_by_rect():
    sq = P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    c = T.clip_by_rect(sq, 2, 2, 6, 6)
    assert K.area(c)[0] == 4.0
    line = P("LINESTRING (0 0, 4 4)")
    cl = T.clip_by_rect(line, 1, 1, 2, 2)
    assert np.isclose(K.length(cl)[0], np.sqrt(2))
    pt = P("POINT (5 5)")
    cp = T.clip_by_rect(pt, 0, 0, 1, 1)
    assert cp.is_empty()[0]


def test_get_parts():
    multi = P("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
              "POINT (9 9)")
    parts, gi, pi = T.get_parts(multi)
    assert len(parts) == 3
    assert list(gi) == [0, 0, 1]
    assert list(pi) == [0, 1, 0]


def test_hilbert_reference_algorithm():
    from geopandas_spark.index.hilbert import xy2d

    # level-1 Hilbert curve visits (0,0),(0,1),(1,1),(1,0) in order
    d = xy2d(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]), 1)
    assert list(d) == [0, 1, 2, 3]
    # all distinct on a full grid
    xs, ys = np.meshgrid(np.arange(32), np.arange(32))
    dd = xy2d(xs.ravel(), ys.ravel(), 5)
    assert len(np.unique(dd)) == 1024


def test_crs_laea_lcc_utm():
    """Round-2 CRS additions: EPSG:3035 (LAEA, pinned to the EPSG
    Guidance Note 7-2 worked example), EPSG:2154 (Lambert-93, pinned to
    Paris), estimate_utm_crs zone math."""
    import numpy as np
    from geopandas_spark.geom.crs import estimate_utm_crs, transform_xy

    x, y = transform_xy(np.array([5.0]), np.array([50.0]), 4326, 3035)
    assert abs(x[0] - 3962799.45) < 0.01 and abs(y[0] - 2999718.85) < 0.01
    lon, lat = transform_xy(x, y, 3035, 4326)
    assert abs(lon[0] - 5.0) < 1e-9 and abs(lat[0] - 50.0) < 1e-9

    x, y = transform_xy(np.array([2.3522]), np.array([48.8566]), 4326, 2154)
    assert abs(x[0] - 652469.02) < 0.5 and abs(y[0] - 6862035.26) < 0.5
    lon, lat = transform_xy(x, y, 2154, 4326)
    assert abs(lon[0] - 2.3522) < 1e-9 and abs(lat[0] - 48.8566) < 1e-9

    # zone math: Berlin -> 33N, Sydney -> 56S
    assert estimate_utm_crs(13.0, 52.0, 13.8, 52.6) == 32633
    assert estimate_utm_crs(150.8, -34.0, 151.4, -33.5) == 32756
    # chained: 3035 -> 2154 goes through lon/lat
    x, y = transform_xy(np.array([3962799.45]), np.array([2999718.85]),
                        3035, 2154)
    lon, lat = transform_xy(x, y, 2154, 4326)
    assert abs(lon[0] - 5.0) < 1e-6 and abs(lat[0] - 50.0) < 1e-6


def test_crs_generic_registry_round4():
    """Round-4 CRS additions (ref geoseries.py:878 arbitrary-CRS to_crs):
    Albers 5070/3310/3577 (EPSG method 9822), OSGB 27700 (TM on Airy +
    Helmert datum shift — pinned to the OS worked example), NZTM 2193,
    ETRS89 UTM 258xx."""
    import numpy as np
    from geopandas_spark.geom.crs import (
        _ELLIPSOIDS, lonlat_to_tm_generic, transform_xy)

    # OS worked example (projection only, OSGB36 geographic in, Airy):
    # 52d39'27.2531"N 1d43'4.5177"E -> E 651409.903 N 313177.270
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    E, N = lonlat_to_tm_generic(
        np.array([lon]), np.array([lat]), lon0=-2.0, lat0=49.0,
        k0=0.9996012717, fe=400000.0, fn=-100000.0, ellps="airy")
    assert abs(E[0] - 651409.903) < 0.01
    assert abs(N[0] - 313177.270) < 0.01

    # Albers natural origin maps exactly to (FE, FN)
    x, y = transform_xy(np.array([-96.0]), np.array([23.0]), 4326, 5070)
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6

    # equal-area property: numeric Jacobian == ellipsoidal area element
    a_, f_ = _ELLIPSOIDS["GRS80"]
    e2 = f_ * (2 - f_)
    h = 1e-6

    def fwd(lo, la):
        return transform_xy(np.array([lo]), np.array([la]), 4326, 5070)

    x0, y0 = fwd(-100.0, 40.0)
    xl, yl = fwd(-100.0 + h, 40.0)
    xp, yp = fwd(-100.0, 40.0 + h)
    J = abs((xl[0] - x0[0]) * (yp[0] - y0[0])
            - (xp[0] - x0[0]) * (yl[0] - y0[0])) / np.radians(h) ** 2
    phi = np.radians(40.0)
    M = a_ * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    Nr = a_ / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    assert abs(J / (M * Nr * np.cos(phi)) - 1) < 1e-6

    # round-trips on every new code (incl. southern-hemisphere Albers
    # where n < 0, and the Helmert-shifted 27700)
    for code, (lo, la) in [(5070, (-75.0, 35.0)), (3310, (-120.5, 36.0)),
                           (3577, (145.0, -30.0)), (27700, (-0.1278, 51.5074)),
                           (2193, (174.78, -41.29)), (25832, (9.0, 52.0))]:
        x, y = transform_xy(np.array([lo]), np.array([la]), 4326, code)
        lon2, lat2 = transform_xy(x, y, code, 4326)
        assert abs(lon2[0] - lo) < 1e-7 and abs(lat2[0] - la) < 1e-7, code

    # ETRS89 UTM == WGS84 UTM (GRS80 ~ WGS84 shortcut, documented)
    a1 = transform_xy(np.array([9.5]), np.array([50.0]), 4326, 25832)
    b1 = transform_xy(np.array([9.5]), np.array([50.0]), 4326, 32632)
    assert abs(a1[0][0] - b1[0][0]) < 1e-9 and abs(a1[1][0] - b1[1][0]) < 1e-9

    # geographic aliases pass through
    x, y = transform_xy(np.array([7.0]), np.array([46.0]), 4269, 4326)
    assert x[0] == 7.0 and y[0] == 46.0


def test_register_crs():
    """register_crs (ref geoseries.py:878 arbitrary-CRS to_crs): any
    projected CRS on the four embedded methods is user-registerable by
    its published parameters, validated by a round-trip probe."""
    import numpy as np
    import pytest

    from geopandas_spark.geom.crs import (
        _USER_REGISTRY, register_crs, transform_xy)

    # NAD83 / UTM 17N registered as generic TM on GRS80: must agree with
    # the built-in WGS84 UTM 17N to sub-mm (flattenings differ in the
    # 9th decimal)
    register_crs(26917, "tm", lon0=-81.0, lat0=0.0, k0=0.9996,
                 fe=500000.0, fn=0.0, ellps="GRS80")
    try:
        lo, la = np.array([-79.38]), np.array([43.65])  # Toronto
        xa, ya = transform_xy(lo, la, 4326, 26917)
        xb, yb = transform_xy(lo, la, 4326, 32617)
        assert abs(xa[0] - xb[0]) < 1e-3 and abs(ya[0] - yb[0]) < 1e-3
        lon2, lat2 = transform_xy(xa, ya, 26917, 4326)
        assert abs(lon2[0] + 79.38) < 1e-7 and abs(lat2[0] - 43.65) < 1e-7

        # Statistics Canada Lambert (EPSG:3347) via the LCC method
        register_crs(3347, "lcc", lon0=-91.8666667, lat0=63.390675,
                     lat1=49.0, lat2=77.0, fe=6200000.0, fn=3000000.0)
        x, y = transform_xy(np.array([-106.0]), np.array([52.0]),
                            4326, 3347)
        lon2, lat2 = transform_xy(x, y, 3347, 4326)
        assert abs(lon2[0] + 106.0) < 1e-7 and abs(lat2[0] - 52.0) < 1e-7

        # parameter validation fails loudly
        with pytest.raises(ValueError, match="unknown projection method"):
            register_crs(9999, "mercator", lon0=0.0)
        with pytest.raises(ValueError, match="must be exactly"):
            register_crs(9999, "tm", lon0=0.0, lat0=0.0)  # missing k0/fe/fn
        with pytest.raises(ValueError, match="unknown ellipsoid"):
            register_crs(9999, "tm", lon0=0.0, lat0=0.0, k0=1.0,
                         fe=0.0, fn=0.0, ellps="bessel-not-embedded")
        with pytest.raises(ValueError, match="WGS84-constant"):
            register_crs(9999, "lcc", lon0=0.0, lat0=0.0, lat1=30.0,
                         lat2=60.0, fe=0.0, fn=0.0, ellps="airy")
        assert 9999 not in _USER_REGISTRY
    finally:
        _USER_REGISTRY.pop(26917, None)
        _USER_REGISTRY.pop(3347, None)


def test_nad27_and_towgs84():
    """NAD27 (EPSG:4267) geographic support + register_crs towgs84
    7-param (ref geoseries.py:878 accepts any pyproj CRS; this engine
    embeds Clarke 1866 + the CONUS 3-param Helmert, ~5-10 m accuracy
    vs NADCON — documented in geom/crs.py)."""
    import numpy as np
    import pytest

    from geopandas_spark.geom.crs import (_USER_REGISTRY, register_crs,
                                          transform_xy)

    lon = np.array([-100.0]); lat = np.array([40.0])
    lon2, lat2 = transform_xy(lon, lat, 4267, 4326)
    # CONUS NAD27->WGS84 shifts are tens of meters
    d_m = float(np.hypot((lon2 - lon) * np.cos(np.radians(lat)) * 111320,
                         (lat2 - lat) * 111320)[0])
    assert 10.0 < d_m < 100.0
    blon, blat = transform_xy(lon2, lat2, 4326, 4267)
    assert abs(float(blon[0]) - -100.0) < 1e-7
    assert abs(float(blat[0]) - 40.0) < 1e-7
    # towgs84 on a registered geographic CRS (3-param zero-padded)
    register_crs(90801, "geo", ellps="intl", towgs84=(-87, -98, -121))
    try:
        x, y = transform_xy(np.array([10.0]), np.array([50.0]), 90801, 4326)
        assert abs(float(x[0]) - 10.0) > 1e-4  # the shift is real
        # towgs84 on a projected CRS: NAD27 / UTM 14N
        register_crs(90802, "tm", lon0=-99.0, lat0=0.0, k0=0.9996,
                     fe=500000.0, fn=0.0, ellps="clrk66",
                     towgs84=(-8, 160, 176))
        e, n = transform_xy(np.array([-100.0]), np.array([40.0]), 4326, 90802)
        lo, la = transform_xy(e, n, 90802, 4326)
        assert abs(float(lo[0]) + 100.0) < 1e-7
        assert abs(float(la[0]) - 40.0) < 1e-7
        with pytest.raises(ValueError, match="3 or 7"):
            register_crs(90803, "geo", towgs84=(1, 2, 3, 4))
        with pytest.raises(ValueError, match="not both"):
            register_crs(90803, "geo", datum="OSGB36", towgs84=(1, 2, 3))
    finally:
        for c in (90801, 90802, 90803):
            _USER_REGISTRY.pop(c, None)


def test_register_crs_proj_strings():
    """register_crs_proj binds proj.4 strings/dicts to the embedded
    methods (ref geoseries.py:878 accepts proj strings via pyproj)."""
    import numpy as np
    import pytest

    from geopandas_spark.geom.crs import (_USER_REGISTRY, register_crs_proj,
                                          transform_xy)

    try:
        register_crs_proj(
            90901, "+proj=utm +zone=17 +datum=NAD83 +units=m +no_defs")
        e1, n1 = transform_xy(np.array([-81.5]), np.array([35.0]),
                              4326, 90901)
        e2, n2 = transform_xy(np.array([-81.5]), np.array([35.0]),
                              4326, 32617)
        # NAD83 ~ WGS84; GRS80-vs-WGS84 ellipsoid difference is sub-mm E
        assert abs(float(e1[0] - e2[0])) < 1e-3
        assert abs(float(n1[0] - n2[0])) < 1e-2
        register_crs_proj(
            90902, "+proj=tmerc +lat_0=0 +lon_0=-99 +k=0.9996 "
            "+x_0=500000 +y_0=0 +ellps=clrk66 +towgs84=-8,160,176")
        e, n = transform_xy(np.array([-100.0]), np.array([40.0]),
                            4326, 90902)
        lo, la = transform_xy(e, n, 90902, 4326)
        assert abs(float(lo[0]) + 100.0) < 1e-7
        assert abs(float(la[0]) - 40.0) < 1e-7
        register_crs_proj(90903, {"proj": "longlat", "ellps": "intl",
                                  "towgs84": "-87,-98,-121"})
        x, y = transform_xy(np.array([10.0]), np.array([50.0]), 90903, 4326)
        assert abs(float(x[0]) - 10.0) > 1e-4
        with pytest.raises(ValueError, match="proj='omerc'"):
            register_crs_proj(90904, "+proj=omerc +lat_0=4")
        with pytest.raises(ValueError, match="nadgrids"):
            register_crs_proj(
                90904, "+proj=tmerc +lat_0=0 +lon_0=0 +nadgrids=x")
        with pytest.raises(ValueError, match="lonc"):
            register_crs_proj(90904, "+proj=tmerc +lat_0=0 +lonc=3")
    finally:
        for c in (90901, 90902, 90903, 90904):
            _USER_REGISTRY.pop(c, None)


def test_simplify_preserve_topology():
    """base.py:4874 preserve_topology: a thin triangle that plain DP
    collapses survives with its ring valid; preserve_topology=False
    keeps the old drop-degenerate behavior."""
    import numpy as np

    from geopandas_spark.geom import transforms as T
    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.kernels import area

    thin = W.from_wkt(["POLYGON ((0 0, 10 0, 5 0.1, 0 0))"])
    kept = T.simplify(thin, 1.0, preserve_topology=True)
    assert area(kept)[0] > 0  # ring survived, still a valid triangle
    dropped = T.simplify(thin, 1.0, preserve_topology=False)
    assert area(dropped)[0] == 0  # degenerate output dropped
    # a well-behaved square is identical under both modes
    sq = W.from_wkt(["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"])
    a = W.to_wkt(T.simplify(sq, 0.5, preserve_topology=True))[0]
    b = W.to_wkt(T.simplify(sq, 0.5, preserve_topology=False))[0]
    assert a == b
