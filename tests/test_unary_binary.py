"""Unary/binary kernel tests mirroring the reference fixture style
(/root/reference/geopandas/tests/test_geom_methods.py:40-75: triangles,
squares, points; expectations hand-computed)."""

import numpy as np
import pytest

from geopandas_spark.geom import binary as B2
from geopandas_spark.geom import unary as U
from geopandas_spark.geom.ragged import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    POINT,
    POLYGON,
    GeometryBatchBuilder,
)


def G(*specs):
    """specs: ('point', (x,y)) | ('line', [pts]) | ('poly', [rings]) |
    ('mline', [[pts],...]) | ('missing',)"""
    bld = GeometryBatchBuilder()
    for s in specs:
        kind = s[0]
        if kind == "missing":
            bld.add_missing()
        elif kind == "point":
            bld.add(POINT, [(POINT, [np.array([s[1]], dtype=float)])])
        elif kind == "line":
            bld.add(LINESTRING, [(LINESTRING, [np.array(s[1], dtype=float)])])
        elif kind == "poly":
            bld.add(POLYGON, [(POLYGON, [np.array(r, dtype=float) for r in s[1]])])
        elif kind == "mline":
            bld.add(MULTILINESTRING,
                    [(LINESTRING, [np.array(l, dtype=float)]) for l in s[1]])
        else:
            raise ValueError(kind)
    return bld.finish()


SQ = [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]
BOWTIE = [[(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)]]
HOLE_OUT = [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
            [(2, 2), (3, 2), (3, 3), (2, 3), (2, 2)]]


def test_is_closed():
    b = G(("line", [(0, 0), (1, 0), (1, 1), (0, 0)]),
          ("line", [(0, 0), (1, 0)]),
          ("point", (0, 0)),
          ("poly", SQ))
    assert list(U.is_closed(b)) == [True, False, False, False]


def test_is_simple_and_ring():
    b = G(("line", [(0, 0), (1, 1), (1, 0), (0, 1), (0, 0)]),  # self-cross
          ("line", [(0, 0), (1, 0), (1, 1), (0, 0)]),
          ("point", (3, 3)))
    assert list(U.is_simple(b)) == [False, True, True]
    assert list(U.is_ring(b)) == [False, True, False]


def test_is_ccw():
    ccw = [(0, 0), (1, 0), (1, 1), (0, 0)]
    cw = ccw[::-1]
    b = G(("line", ccw), ("line", cw), ("line", [(0, 0), (1, 0)]))
    assert list(U.is_ccw(b)) == [True, False, False]


def test_is_valid():
    b = G(("poly", SQ), ("poly", BOWTIE), ("poly", HOLE_OUT), ("point", (0, 0)))
    ok, msgs = U.is_valid(b, reason=True)
    assert list(ok) == [True, False, False, True]
    assert msgs[1] == "Self-intersection"
    assert msgs[2] == "Hole lies outside shell"
    assert msgs[0] == "Valid Geometry"


def test_get_geometry_and_exterior():
    b = G(("poly", HOLE_OUT))
    ext = U.exterior(b)
    assert ext.types[0] == LINESTRING
    assert np.allclose(ext.coords, np.array(HOLE_OUT[0], dtype=float))
    ints = U.interiors(b)
    assert len(ints[0]) == 1 and len(ints[0][0]) == 5

    m = G(("mline", [[(0, 0), (1, 0)], [(2, 2), (3, 3)]]))
    g1 = U.get_geometry(m, 1)
    assert g1.types[0] == LINESTRING
    assert np.allclose(g1.coords, [[2, 2], [3, 3]])
    gneg = U.get_geometry(m, -1)
    assert np.allclose(gneg.coords, [[2, 2], [3, 3]])
    gout = U.get_geometry(m, 5)
    assert gout.types[0] == 0  # missing


def test_extract_unique_points():
    b = G(("poly", SQ))
    u = U.extract_unique_points(b)
    assert u.types[0] == MULTIPOINT
    assert len(u.coords) == 4  # closing vertex deduped


def test_remove_repeated_points():
    b = G(("line", [(0, 0), (0, 0), (1, 0), (1, 0), (2, 0)]))
    r = U.remove_repeated_points(b, 0.0)
    assert np.allclose(r.coords, [[0, 0], [1, 0], [2, 0]])


def test_normalize_idempotent_and_orientation():
    ccw_sq = [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]
    cw_sq = [[(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]]
    a = U.normalize(G(("poly", ccw_sq)))
    b = U.normalize(G(("poly", cw_sq)))
    assert np.allclose(a.coords, b.coords)
    c = U.normalize(a)
    assert np.allclose(a.coords, c.coords)


def test_segmentize():
    b = G(("line", [(0, 0), (4, 0)]))
    s = U.segmentize(b, 1.0)
    assert np.allclose(s.coords[:, 0], [0, 1, 2, 3, 4])
    with pytest.raises(ValueError):
        U.segmentize(b, 0)


def test_line_merge():
    b = G(("mline", [[(0, 0), (1, 0)], [(1, 0), (2, 0)]]))
    m = U.line_merge(b)
    assert m.types[0] == LINESTRING
    assert np.allclose(m.coords, [[0, 0], [1, 0], [2, 0]])
    b2 = G(("mline", [[(0, 0), (1, 0)], [(5, 5), (6, 6)]]))
    m2 = U.line_merge(b2)
    assert m2.types[0] == MULTILINESTRING


def test_minimum_rotated_rectangle():
    # 45-degree segment cloud -> rotated rect with near-zero width
    pts = [(0, 0), (1, 1), (2, 2), (3, 3)]
    b = G(("line", pts))
    r = U.minimum_rotated_rectangle(b)
    from geopandas_spark.geom.kernels import area

    assert area(r)[0] < 1e-9
    sq = G(("poly", SQ))
    r2 = U.minimum_rotated_rectangle(sq)
    assert abs(area(r2)[0] - 1.0) < 1e-9


def test_minimum_bounding_circle_radius():
    b = G(("poly", SQ))
    r = U.minimum_bounding_radius(b)
    assert abs(r[0] - np.sqrt(2) / 2) < 1e-9
    circ = U.minimum_bounding_circle(b)
    from geopandas_spark.geom.kernels import area

    assert abs(area(circ)[0] - np.pi / 2) < 0.01  # pi*r^2, r=sqrt(2)/2


def test_minimum_clearance():
    b = G(("poly", SQ))
    assert abs(U.minimum_clearance(b)[0] - 1.0) < 1e-12
    tri = G(("line", [(0, 0), (1, 0)]))
    assert np.isinf(U.minimum_clearance(tri)[0])


def test_set_precision():
    b = G(("point", (0.123, 0.987)))
    p = U.set_precision(b, 0.1)
    assert np.allclose(p.coords, [[0.1, 1.0]])


def test_interpolate_project_roundtrip():
    line = G(("line", [(0, 0), (10, 0)]))
    p = U.interpolate(line, 3.0)
    assert np.allclose(p.coords, [[3, 0]])
    pn = U.interpolate(line, 0.5, normalized=True)
    assert np.allclose(pn.coords, [[5, 0]])
    pts = G(("point", (3.0, 4.0)))
    d = U.project(line, pts)
    assert abs(d[0] - 3.0) < 1e-12
    dn = U.project(line, pts, normalized=True)
    assert abs(dn[0] - 0.3) < 1e-12


def test_force3d_hasz_z():
    b = G(("point", (1, 2)))
    assert not U.has_z(b).any()
    z = U.force_3d(b, 9.0)
    assert U.has_z(z).all()
    assert U.get_z(z)[0] == 9.0


def test_hausdorff_frechet():
    a = G(("line", [(0, 0), (10, 0)]))
    b = G(("line", [(0, 1), (10, 1)]))
    assert abs(B2.hausdorff_distance(a, b)[0] - 1.0) < 1e-12
    assert abs(B2.frechet_distance(a, b)[0] - 1.0) < 1e-12
    # reversed direction: hausdorff unchanged, frechet = diagonal
    c = G(("line", [(10, 1), (0, 1)]))
    assert abs(B2.hausdorff_distance(a, c)[0] - 1.0) < 1e-12
    assert abs(B2.frechet_distance(a, c)[0] - np.hypot(10, 1)) < 1e-12


def test_geom_equals_exact():
    a = G(("poly", SQ))
    b = G(("poly", [[(0, 0.001), (1, 0), (1, 1), (0, 1), (0, 0.001)]]))
    assert not B2.geom_equals_exact(a, b, 0.0001)[0]
    assert B2.geom_equals_exact(a, b, 0.01)[0]


def test_shortest_line():
    a = G(("point", (0, 0)))
    b = G(("poly", [[(2, -1), (3, -1), (3, 1), (2, 1), (2, -1)]]))
    sl = B2.shortest_line(a, b)
    assert np.allclose(sl.coords, [[0, 0], [2, 0]])


def test_snap():
    a = G(("line", [(0.05, 0.0), (5, 5)]))
    b = G(("point", (0, 0)))
    s = B2.snap(a, b, tolerance=0.1)
    assert np.allclose(s.coords[0], [0, 0])
    s2 = B2.snap(a, b, tolerance=0.01)
    assert np.allclose(s2.coords[0], [0.05, 0.0])


def test_shared_paths():
    a = G(("line", [(0, 0), (10, 0)]))
    b = G(("line", [(3, 0), (7, 0)]))
    sp = B2.shared_paths(a, b)
    assert sp.types[0] == MULTILINESTRING
    assert np.allclose(sorted(sp.coords[:, 0]), [3, 7])
    c = G(("line", [(0, 5), (10, 5)]))
    sp2 = B2.shared_paths(a, c)
    assert len(sp2.coords) == 0


def test_get_coordinates():
    b = G(("poly", SQ), ("point", (9, 9)))
    coords, idx = U.get_coordinates(b)
    assert len(coords) == 6
    assert list(idx) == [0] * 5 + [1]


def test_pairwise_boolean_general():
    """Martinez-Rueda general booleans (base.py:3852-4192) on a
    non-convex L vs rotated diamond (neither rectilinear)."""
    import pandas as pd

    from geopandas_spark.geom import wkb as W
    from geopandas_spark.geom.clipping import (
        pairwise_boolean, pairwise_intersection,
    )
    from geopandas_spark.geom.kernels import area, length

    def M(b):
        return W.from_wkb(pd.Series([W.to_wkb(b)[0]]))

    L = M(G(("poly", [[(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3), (0, 0)]])))
    D = M(G(("poly", [[(1.5, -0.5), (2.5, 0.5), (1.5, 1.5), (0.5, 0.5), (1.5, -0.5)]])))
    assert abs(area(pairwise_intersection(L, D))[0] - 1.5) < 1e-9
    assert abs(area(pairwise_boolean(L, D, "union"))[0] - 5.5) < 1e-9
    assert abs(area(pairwise_boolean(L, D, "difference"))[0] - 3.5) < 1e-9
    assert abs(area(pairwise_boolean(L, D, "symmetric_difference"))[0] - 4.0) < 1e-9
    # line x polygon clip
    line = M(G(("line", [(-1, 0.5), (4, 0.5)])))
    li = pairwise_intersection(line, L)
    assert abs(length(li)[0] - 3.0) < 1e-9


def test_union_batch_parts_general():
    from geopandas_spark.geom import wkb as W
    from geopandas_spark.geom.kernels import area
    from geopandas_spark.operators.dissolve import union_batch_parts

    tri1 = G(("poly", [[(0, 0), (2, 0), (1, 2), (0, 0)]]))
    tri2 = G(("poly", [[(1, 0), (3, 0), (2, 2), (1, 0)]]))
    w = union_batch_parts([W.to_wkb(tri1)[0], W.to_wkb(tri2)[0]], "unary")
    import pandas as pd

    merged = W.from_wkb(pd.Series([w]))
    # each triangle area 2; overlap is a smaller triangle area 0.5
    assert abs(area(merged)[0] - 3.5) < 1e-9


def test_crs_transforms():
    import numpy as np

    from geopandas_spark.geom.crs import estimate_utm_crs, transform_xy

    lon = np.array([-122.4194, 151.2093])
    lat = np.array([37.7749, -33.8688])
    x, y = transform_xy(lon, lat, 4326, 3857)
    lon2, lat2 = transform_xy(x, y, 3857, 4326)
    assert np.allclose(lon, lon2) and np.allclose(lat, lat2)
    e, n = transform_xy(lon[:1], lat[:1], 4326, 32610)
    lon3, lat3 = transform_xy(e, n, 32610, 4326)
    assert abs(lon3[0] - lon[0]) < 1e-9 and abs(lat3[0] - lat[0]) < 1e-9
    assert estimate_utm_crs(-122.5, 37.7, -122.3, 37.8) == 32610
    assert estimate_utm_crs(151.0, -34.0, 151.4, -33.7) == 32756


def test_delaunay_voronoi_concave():
    import numpy as np

    from geopandas_spark.geom.transforms import _hull_one
    from geopandas_spark.geom.triangulate import concave_hull, delaunay, voronoi

    rng = np.random.default_rng(11)
    pts = rng.random((40, 2))
    tris, up = delaunay(pts)
    tri_area = sum(
        abs(np.cross(up[b] - up[a], up[c] - up[a])) / 2 for a, b, c in tris)
    h = _hull_one(pts)
    hull_area = abs(np.cross(h, np.roll(h, -1, axis=0)).sum()) / 2
    assert abs(tri_area - hull_area) < 1e-9
    cells, _ = voronoi(pts, (0, 0, 1, 1))
    va = sum(abs(np.cross(c[:-1], c[1:]).sum()) / 2
             for c in cells if c is not None)
    assert abs(va - 1.0) < 1e-9  # cells tile the extent
    r1 = concave_hull(pts, ratio=1.0)
    a1 = abs(np.cross(r1[0][:-1], r1[0][1:]).sum()) / 2
    assert abs(a1 - hull_area) < 1e-9  # ratio=1 == convex hull
    r0 = concave_hull(pts, ratio=0.2)
    a0 = abs(np.cross(r0[0][:-1], r0[0][1:]).sum()) / 2
    assert a0 <= hull_area + 1e-12


def test_polygonize():
    from geopandas_spark.geom.polygonize import polygonize_segments

    # a unit square drawn as 4 separate segments + one dangle
    segs = [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)),
            ((0, 1), (0, 0)), ((1, 1), (2, 2))]
    res = polygonize_segments(segs)
    assert len(res["polygons"]) == 1
    r = res["polygons"][0]
    assert abs(np.cross(r[:-1], r[1:]).sum() / 2 - 1.0) < 1e-12
    assert len(res["dangles"]) == 1
    # two squares sharing an edge -> two faces
    segs2 = [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)),
             ((0, 1), (0, 0)), ((1, 0), (2, 0)), ((2, 0), (2, 1)),
             ((2, 1), (1, 1))]
    res2 = polygonize_segments(segs2)
    assert len(res2["polygons"]) == 2
    assert abs(sum(np.cross(r[:-1], r[1:]).sum() / 2
                   for r in res2["polygons"]) - 2.0) < 1e-12


def test_buffer_general():
    import math

    from geopandas_spark.geom.kernels import area
    from geopandas_spark.geom.transforms import buffer_general

    b = G(("point", (0, 0)),
          ("line", [(0, 0), (10, 0)]),
          ("poly", [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]]))
    disc = 16 * math.sin(2 * math.pi / 32)  # 32-gon unit-disc area
    r = buffer_general(b, 1.0, quad_segs=8)
    assert abs(area(r)[0] - disc) < 1e-9
    assert abs(area(r)[1] - (20 + disc)) < 1e-9
    # half-step-rotated arcs dip ~r*(1-cos(pi/n)) inside at capsule
    # corners - a discretization effect, not an error
    assert abs(area(r)[2] - (32 + disc)) < 1e-3
    e = buffer_general(b, -0.4, quad_segs=8)
    assert abs(area(e)[2] - 3.2 * 3.2) < 1e-9


def test_offset_curve():
    from geopandas_spark.geom.kernels import length
    from geopandas_spark.geom.transforms import offset_curve

    b = G(("line", [(0, 0), (5, 0), (5, 5)]),
          ("line", [(0, 0), (10, 0)]))
    left = offset_curve(b, 1.0)
    assert abs(length(left)[0] - 8.0) < 1e-9       # inside turn trims
    assert abs(length(left)[1] - 10.0) < 1e-9
    assert np.allclose(left.coords[-2:], [[0, 1], [10, 1]])
    right = offset_curve(b, -1.0)
    assert 11.4 < length(right)[0] < 11.7          # round-join arc


def test_relate_de9im():
    """DE-9IM matrices pinned to GEOS truth values."""
    from geopandas_spark.geom.relate import matches_pattern, relate

    sq = [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]
    a = G(("poly", sq))
    cases = [
        (G(("poly", [[(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]])), "FF2FF1212"),
        (G(("poly", sq)), "2FFF1FFF2"),
        (G(("poly", [[(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]])),
         "212101212"),
        (G(("poly", [[(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75),
                      (0.25, 0.25)]])), "212FF1FF2"),
        (G(("poly", [[(1, 0), (2, 0), (2, 1), (1, 1), (1, 0)]])), "FF2F11212"),
    ]
    for other, expect in cases:
        assert relate(a, other)[0] == expect
    p_in = G(("point", (0.5, 0.5)))
    assert relate(p_in, a)[0] == "0FFFFF212"
    p_on = G(("point", (0.0, 0.5)))
    assert relate(p_on, a)[0] == "F0FFFF212"
    l1 = G(("line", [(0, 0), (2, 2)]))
    l2 = G(("line", [(0, 2), (2, 0)]))
    assert relate(l1, l2)[0] == "0F1FF0102"
    l3 = G(("line", [(-1, 0.5), (2, 0.5)]))
    assert relate(l3, a)[0] == "101FF0212"
    # pattern matching: overlaps mask
    ov = G(("poly", [[(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]]))
    assert matches_pattern(relate(a, ov)[0], "T*T***T**")
    assert not matches_pattern(relate(a, a)[0], "FF*FF****")


def test_relate_lineal_ie_ei():
    """Line-vs-line IE/EI entries (covered/equal pairs — round-2 fix:
    these were hard-coded '1')."""
    from geopandas_spark.geom.relate import relate

    h = G(("line", [(0, 0), (2, 0)]))
    assert relate(h, G(("line", [(0, 0), (2, 0)])))[0] == "1FFF0FFF2"
    # contained line: endpoints inside the host's interior
    assert relate(h, G(("line", [(0.5, 0), (1.5, 0)])))[0] == "101FF0FF2"
    assert relate(G(("line", [(0.5, 0), (1.5, 0)])), h)[0] == "1FF0FF102"
    # disjoint parallel / proper crossing keep their matrices
    assert relate(h, G(("line", [(0, 1), (2, 1)])))[0] == "FF1FF0102"
    assert relate(h, G(("line", [(1, -1), (1, 1)])))[0] == "0F1FF0102"


def test_relate_lineal_endpoint_touches():
    """Line touches at endpoints/vertices (session-2 fix): II is '0' only
    when an intersection point is interior to BOTH lines; an endpoint
    touch is boundary, not interior (GEOS truth matrices)."""
    from geopandas_spark.geom.relate import relate

    cases = [
        (("line", [(0, 0), (1, 0)]), ("line", [(1, 0), (2, 0)]), "FF1F00102"),
        (("line", [(0, 0), (2, 0)]), ("line", [(1, 0), (1, 1)]), "F01FF0102"),
        (("line", [(0, 0), (1, 0)]), ("line", [(1, 0), (1, 1)]), "FF1F00102"),
        (("line", [(0.5, 0), (0.5, 1)]), ("line", [(0, 0), (1, 0)]),
         "FF10F0102"),
        # interior VERTEX of a touching an endpoint of b is still a's
        # interior -> IB
        (("line", [(0, 0), (1, 0), (1, 1)]), ("line", [(1, 0), (2, 0)]),
         "F01FF0102"),
        # interior-vertex x interior-vertex -> II=0
        (("line", [(0, 0), (1, 0), (2, 0)]),
         ("line", [(1, 1), (1, 0), (1, -1)]), "0F1FF0102"),
    ]
    for wa, wb, exp in cases:
        assert relate(G(wa), G(wb))[0] == exp, (wa, wb, exp)


def test_type_matrix_intersection():
    """Round-2 full binary-op type matrix (base.py:4192): line x line,
    point x line, point x point, GeometryCollection."""
    import pandas as pd
    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.clipping import (
        pairwise_boolean, pairwise_intersection)

    def g(*w):
        return W.from_wkt(pd.Series(list(w)))

    def show(b):
        return list(W.to_wkt(b))

    a = g("LINESTRING (0 0, 2 0)", "LINESTRING (0 0, 2 0)",
          "POINT (1 0)", "MULTIPOINT (0 0, 5 5)")
    b = g("LINESTRING (1 -1, 1 1)", "LINESTRING (1 0, 3 0)",
          "LINESTRING (0 0, 2 0)", "MULTIPOINT (0 0, 9 9)")
    assert show(pairwise_intersection(a, b)) == [
        "POINT (1 0)", "LINESTRING (1 0, 2 0)", "POINT (1 0)", "POINT (0 0)"]
    # GC decomposition
    gc = g("GEOMETRYCOLLECTION (POINT (1 0), LINESTRING (0 1, 2 1), "
           "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
    win = g("POLYGON ((0.5 -0.5, 3 -0.5, 3 3, 0.5 3, 0.5 -0.5))")
    got = show(pairwise_intersection(gc, win))[0]
    assert got.startswith("GEOMETRYCOLLECTION")
    assert "POINT (1 0)" in got and "LINESTRING (0.5 1, 2 1)" in got
    # mixed-dim difference / union
    lp = g("LINESTRING (-1 0.5, 3 0.5)")
    poly = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert show(pairwise_boolean(lp, poly, "difference")) == [
        "MULTILINESTRING ((-1 0.5, 0 0.5), (2 0.5, 3 0.5))"]
    assert show(pairwise_boolean(poly, lp, "difference")) == [
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"]
    u = show(pairwise_boolean(poly, lp, "union"))[0]
    assert u.startswith("GEOMETRYCOLLECTION") and "POLYGON" in u
    # line/line difference with full coverage -> typed empty
    same = g("LINESTRING (0 0, 2 0)")
    assert show(pairwise_boolean(same, same, "difference")) == [
        "LINESTRING EMPTY"]
    assert show(pairwise_boolean(same, same, "symmetric_difference")) == [
        "LINESTRING EMPTY"]


def test_make_valid():
    """base.py:1641 — bowtie split, nested-shell even-odd, pass-through."""
    import pandas as pd
    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.kernels import area
    from geopandas_spark.geom.unary import is_valid
    from geopandas_spark.geom.validity import make_valid

    def g(*w):
        return W.from_wkt(pd.Series(list(w)))

    bow = g("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert not is_valid(bow)[0]
    mv = make_valid(bow)
    assert list(W.to_wkt(mv)) == [
        "MULTIPOLYGON (((0 0, 1 1, 0 2, 0 0)), ((2 2, 1 1, 2 0, 2 2)))"]
    assert is_valid(mv)[0] and abs(area(mv)[0] - 2.0) < 1e-12
    # nested shells -> shell + hole
    nested = g("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
               "((1 1, 3 1, 3 3, 1 3, 1 1)))")
    assert not is_valid(nested)[0]
    mv2 = make_valid(nested)
    assert abs(area(mv2)[0] - 12.0) < 1e-12  # 16 - 4 (even-odd hole)
    assert is_valid(mv2)[0]
    # valid / non-polygonal rows unchanged
    ok = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "LINESTRING (0 0, 1 1)")
    assert list(W.to_wkt(make_valid(ok))) == list(W.to_wkt(ok))
    # island-in-donut stays valid (nesting check must not flag it)
    donut = g("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), "
              "(1 1, 3 1, 3 3, 1 3, 1 1)), "
              "((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5)))")
    assert is_valid(donut)[0]


def test_gh_batch_matches_sweep():
    """Batched Greiner-Hormann intersection (geom/ghclip.py) must agree
    with the Martinez-Rueda sweep on random non-convex pairs, and flag
    degenerate (vertex-sharing) pairs for fallback."""
    from geopandas_spark.geom.boolean import boolean_rings, group_rings
    from geopandas_spark.geom.ghclip import batch_intersection

    rng = np.random.default_rng(3)

    def star(cx, cy, r, k, rot):
        th = np.linspace(0, 2 * np.pi, 2 * k, endpoint=False) + rot
        rad = r * (0.6 + 0.4 * (np.arange(2 * k) % 2))
        pts = np.column_stack([cx + rad * np.cos(th), cy + rad * np.sin(th)])
        return np.vstack([pts, pts[:1]])

    def ring_area(r):
        x, y = r[:-1, 0], r[:-1, 1]
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    subs, clips = [], []
    for _ in range(300):
        s = star(rng.uniform(0, 1), rng.uniform(0, 1), rng.uniform(0.03, 0.1),
                 int(rng.integers(4, 9)), rng.uniform(0, 3))
        c = star(s[0, 0] + rng.uniform(-0.08, 0.08),
                 s[0, 1] + rng.uniform(-0.08, 0.08),
                 rng.uniform(0.03, 0.1), int(rng.integers(4, 9)),
                 rng.uniform(0, 3))
        subs.append(s)
        clips.append(c)
    res, fb = batch_intersection(subs, clips)
    assert fb.sum() <= 3  # random data: essentially no degenerate pairs
    for i in range(300):
        if fb[i]:
            continue
        sweep = group_rings(boolean_rings([subs[i]], [clips[i]],
                                          "intersection"))
        a_sw = sum(ring_area(grp[0]) - sum(ring_area(h) for h in grp[1:])
                   for grp in sweep)
        a_gh = sum(ring_area(r) for r in res[i])
        assert abs(a_gh - a_sw) <= 1e-9 * max(a_sw, 1e-12)
    # degenerate: shared vertex -> fallback, not a wrong answer
    tri1 = np.array([[0, 0], [2, 0], [1, 1], [0, 0]], float)
    tri2 = np.array([[2, 0], [4, 0], [3, 1], [2, 0]], float)
    _, fb2 = batch_intersection([tri1], [tri2])
    assert fb2[0]


def test_intersection_boundary_contact():
    """GEOS parity (session-2): polygon x polygon with touching boundaries
    intersect to the shared edge / corner point, not POLYGON EMPTY."""
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.clipping import pairwise_intersection
    from geopandas_spark.geom.kernels import area, length

    def b(*w):
        return W.from_wkt(pd.Series(list(w)))

    P = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    cases = [
        ("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "LINESTRING (2 0, 2 2)"),
        ("POLYGON ((2 2, 3 3, 2 3, 2 2))", "POINT (2 2)"),
        ("POLYGON ((2 1, 3 0, 3 2, 2 1))", "POINT (2 1)"),
        ("POLYGON ((2 0.5, 2 1.5, 3 1, 2 0.5))",
         "LINESTRING (2 0.5, 2 1.5)"),
        ("POLYGON ((3 3, 4 3, 4 4, 3 4, 3 3))", "POLYGON EMPTY"),
    ]
    for wb, exp in cases:
        res = pairwise_intersection(b(P), b(wb))
        assert W.to_wkt(res)[0] == exp, (wb, exp, W.to_wkt(res)[0])
        assert area(res)[0] == 0.0


def test_interpolate_negative_from_end():
    """GEOS parity: negative interpolate distances measure backward from
    the line's end (base.py:5240)."""
    import numpy as np

    from geopandas_spark.geom.unary import interpolate
    from geopandas_spark.geom.wkt import to_wkt

    line = G(("line", [(0, 0), (1, 0)]))
    assert to_wkt(interpolate(line, np.array([-0.25])))[0] == "POINT (0.75 0)"
    assert to_wkt(interpolate(line, np.array([-5.0])))[0] == "POINT (0 0)"
    assert to_wkt(interpolate(line, np.array([-0.25]),
                              normalized=True))[0] == "POINT (0.75 0)"


def test_normalize_linestring_direction():
    """GEOS parity: normalize orients a linestring so the lesser endpoint
    comes first (closed lines unchanged)."""
    from geopandas_spark.geom.unary import normalize
    from geopandas_spark.geom.wkt import to_wkt

    assert to_wkt(normalize(G(("line", [(1, 1), (0, 0)]))))[0] == \
        "LINESTRING (0 0, 1 1)"
    assert to_wkt(normalize(G(("line", [(0, 0), (1, 1), (0, 0)]))))[0] == \
        "LINESTRING (0 0, 1 1, 0 0)"


def test_polygonize_hole_assignment():
    """GEOS parity (session-2): disconnected nested rings — the island
    boundary becomes a hole of its containing face (polygonize keeps the
    island as its own polygon; build_area drops odd-depth faces)."""
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.polygonize import (
        batch_segments, polygonize_segments)

    def segs(*wkts):
        batch = W.from_wkt(pd.Series(list(wkts)))
        out = []
        for g in range(len(batch)):
            out.extend(batch_segments(batch, g))
        return out

    res = polygonize_segments(segs(
        "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)",
        "LINESTRING (1 1, 3 1, 3 3, 1 3, 1 1)"))
    got = sorted((f["depth"], len(f["rings"])) for f in res["faces"])
    assert got == [(0, 2), (1, 1)]

    res3 = polygonize_segments(segs(
        "LINESTRING (0 0, 8 0, 8 8, 0 8, 0 0)",
        "LINESTRING (1 1, 7 1, 7 7, 1 7, 1 1)",
        "LINESTRING (2 2, 3 2, 3 3, 2 3, 2 2)"))
    assert sorted(f["depth"] for f in res3["faces"]) == [0, 1, 2]


def test_set_precision_modes():
    """Reference docstring examples (base.py:1389): valid_output dedupes +
    drops collapsed elements; pointwise keeps duplicates; keep_collapsed
    retains collapsed lines as 2-equal-point linestrings."""
    from geopandas_spark.geom import wkt as W

    b = W.from_wkt([
        "POINT (0.9 0.9)",
        "LINESTRING (0 0, 0 0.1, 0 1, 1 1)",
        "LINESTRING (0 0, 0 0.1, 0.1 0.1)",
    ])
    v = W.to_wkt(U.set_precision(b, 1.0), rounding=0)
    assert list(v) == ["POINT (1 1)", "LINESTRING (0 0, 0 1, 1 1)",
                       "LINESTRING EMPTY"]
    p = W.to_wkt(U.set_precision(b, 1.0, mode="pointwise"), rounding=0)
    assert list(p) == ["POINT (1 1)", "LINESTRING (0 0, 0 0, 0 1, 1 1)",
                       "LINESTRING (0 0, 0 0, 0 0)"]
    k = W.to_wkt(U.set_precision(b, 1.0, mode="keep_collapsed"), rounding=0)
    assert list(k) == ["POINT (1 1)", "LINESTRING (0 0, 0 1, 1 1)",
                       "LINESTRING (0 0, 0 0)"]
    # collapsed polygon drops in BOTH non-pointwise modes
    poly = W.from_wkt(["POLYGON ((0 0, 0.2 0, 0.2 0.2, 0 0.2, 0 0))",
                       "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"])
    for m in ("valid_output", "keep_collapsed"):
        out = U.set_precision(poly, 1.0, mode=m)
        assert out.is_empty()[0] and not out.is_empty()[1]
    # bowtie created by snapping is repaired (valid output)
    tie = W.from_wkt(["POLYGON ((0 0, 4 0.4, 4 3.6, 0 4, 0 0))"])
    snapped = U.set_precision(tie, 4.0)
    assert U.is_valid(snapped)[0]


def test_set_precision_untouched_rows_keep_z():
    """valid_output's make_valid repair must only touch rows that need
    it: a valid Z linestring snapped alongside a polygon keeps its Z
    (ADVICE r2: the whole-batch repair used to strip it)."""
    from geopandas_spark.geom import wkt as W

    b = W.from_wkt([
        "LINESTRING Z (0 0 5, 0 1 6, 1 1 7)",
        "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))",
    ])
    out = U.set_precision(b, 1.0)
    w = W.to_wkt(out, rounding=0)
    assert list(w) == ["LINESTRING Z (0 0 5, 0 1 6, 1 1 7)",
                       "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"]


def test_make_valid_passthrough_keeps_z():
    """make_valid leaves already-valid rows byte-identical, including Z."""
    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.validity import make_valid

    b = W.from_wkt([
        "POINT Z (1 2 3)",
        "LINESTRING Z (0 0 1, 2 2 4)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))",  # bowtie: repaired
    ])
    out = make_valid(b)
    w = W.to_wkt(out, rounding=0)
    assert w[0] == "POINT Z (1 2 3)"
    assert w[1] == "LINESTRING Z (0 0 1, 2 2 4)"
    assert w[2] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert "POLYGON" in w[3] and U.is_valid(out)[3]


def test_dart_intersection_constant():
    """The overlay_dart_intersection oracle constant: unit darts
    (0,0),(2,1),(4,0),(2,3) and its 180-degree rotation about (2,1.5)
    intersect in area EXACTLY 2 (GH kernel == Martinez-Rueda sweep ==
    hand computation), scale-invariantly 2*s^2."""
    import numpy as np

    from geopandas_spark.geom.boolean import boolean_rings, group_rings
    from geopandas_spark.geom.ghclip import batch_intersection

    def area(rings):
        s = 0.0
        for r in rings:
            x, y = r[:, 0], r[:, 1]
            s += 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        return s

    for s in (1.0, 0.005, 3.7):
        A = np.array([[0, 0], [2, 1], [4, 0], [2, 3], [0, 0]], float) * s
        B = np.array([[4, 3], [2, 2], [0, 3], [2, 0], [4, 3]], float) * s
        res, fb = batch_intersection([A], [B])
        assert not fb[0], "dart pair must take the GH path, not fallback"
        gh_area = area(res[0])
        sweep = group_rings(boolean_rings([A], [B], "intersection"))
        sw_area = sum(area(p) for p in sweep)
        assert abs(gh_area - 2 * s * s) < 1e-12 * max(1.0, s * s)
        assert abs(sw_area - 2 * s * s) < 1e-12 * max(1.0, s * s)


def test_3d_fixture_parity():
    """Reference 3-D fixtures (tests/test_geom_methods.py:40-76): Z is
    carried through the data model, has_z/z work, and the measures
    (area/length/centroid/distance) compute on xy exactly like the
    reference (GEOS is 2-D for these — Z is ignored, not an error)."""
    from geopandas_spark.geom import wkt as W

    gz = W.from_wkt([
        "POLYGON Z ((1 1 1, 2 2 2, 3 3 3, 1 1 1))",      # tz (degenerate)
        "POLYGON Z ((1 1 1, 2 2 2, 3 3 3, 4 4 4, 1 1 1))",  # sqz
        "POINT (5 5)",                                    # p0 (2-D)
        "POINT Z (5 5 5)",                                # p3d
        "POLYGON ((0 0, 1 0, 1 1, 0 0))",                 # t1 (2-D)
    ])
    # has_z (reference test_has_z)
    assert list(gz.geom_has_z) == [True, True, False, True, False]
    # measures are xy-only (reference semantics): the collinear Z
    # polygons have zero 2-D area; t1 has area 0.5
    from geopandas_spark.geom.kernels import area as _area

    a = _area(gz)
    assert abs(a[0]) < 1e-15 and abs(a[1]) < 1e-15
    assert abs(a[4] - 0.5) < 1e-15
    # get_coordinates(include_z): NaN z on 2-D rows
    c3, idx = U.get_coordinates(gz, include_z=True)
    import numpy as np

    p0_rows = c3[idx == 2]
    assert np.isnan(p0_rows[:, 2]).all()
    p3d_rows = c3[idx == 3]
    assert p3d_rows[0, 2] == 5.0
    # force_2d drops Z; force_3d(0) fills it
    from geopandas_spark.geom.transforms import force_2d as _f2d

    f2 = _f2d(gz)
    assert f2.geom_has_z is None or not f2.geom_has_z.any()
    f3 = U.force_3d(f2, 9.0)
    assert f3.geom_has_z.all() and (f3.zs == 9.0).all()


def test_buffer_cap_join_styles():
    """base.py:4806 cap_style/join_style/mitre_limit — GEOS conventions
    on arc-free fixtures with exact closed-form areas."""
    import numpy as np
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.kernels import area as _area
    from geopandas_spark.geom.transforms import buffer_general

    d, L = 2.0, 10.0
    seg = W.from_wkt(pd.Series(["LINESTRING (0 0, 10 0)"]))
    # square-cap capsule: 2dL + 4d^2; flat: 2dL (GEOS doc semantics)
    assert _area(buffer_general(seg, d, cap_style="square"))[0] == \
        2 * d * L + 4 * d * d
    assert _area(buffer_general(seg, d, cap_style="flat"))[0] == 2 * d * L
    # round cap at high resolution approaches 2dL + pi d^2 from below
    a_round = _area(buffer_general(seg, d, quad_segs=64))[0]
    assert 2 * d * L + np.pi * d * d * 0.999 < a_round < 2 * d * L + np.pi * d * d
    # L-shape joins: mitre fills the corner square (2d(L1+L2) with flat
    # caps), bevel loses d^2/2 at the corner
    ell = W.from_wkt(pd.Series(["LINESTRING (0 0, 10 0, 10 10)"]))
    am = _area(buffer_general(ell, d, cap_style="flat", join_style="mitre"))[0]
    ab = _area(buffer_general(ell, d, cap_style="flat", join_style="bevel"))[0]
    assert am == 2 * d * (10 + 10)
    assert am - ab == d * d / 2
    # polygon joins: mitred square grows to (s+2d)^2; erosion is
    # style-independent for a square: (s-2d)^2
    sq = W.from_wkt(pd.Series(["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"]))
    assert _area(buffer_general(sq, d, join_style="mitre"))[0] == (10 + 2 * d) ** 2
    assert _area(buffer_general(sq, d, join_style="bevel"))[0] == \
        (10 + 2 * d) ** 2 - 4 * (d * d / 2)
    assert _area(buffer_general(sq, -d, join_style="mitre"))[0] == (10 - 2 * d) ** 2
    # mitre_limit crops the spike of a sharp corner
    sharp = W.from_wkt(pd.Series(["LINESTRING (0 0, 10 0, 0 1)"]))
    a_unl = _area(buffer_general(sharp, d, cap_style="flat",
                                 join_style="mitre", mitre_limit=1000.0))[0]
    a_lim = _area(buffer_general(sharp, d, cap_style="flat",
                                 join_style="mitre", mitre_limit=2.0))[0]
    assert a_lim < a_unl
    # lone points: flat -> empty, square -> 2d x 2d square
    pt = W.from_wkt(pd.Series(["POINT (3 4)"]))
    assert _area(buffer_general(pt, d, cap_style="flat"))[0] == 0.0
    assert _area(buffer_general(pt, d, cap_style="square"))[0] == 4 * d * d
    # invalid style names raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap_style"):
        buffer_general(seg, d, cap_style="pointy")
    with _pytest.raises(ValueError, match="join_style"):
        buffer_general(seg, d, join_style="sharp")


def test_line_merge_directed_and_offset_join_styles():
    """line_merge(directed) never reverses a line (base.py:1887);
    offset_curve join_style mitre/bevel shape convex turns
    (base.py:1265)."""
    import numpy as np
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.transforms import offset_curve
    from geopandas_spark.geom.unary import line_merge

    lm = W.from_wkt(pd.Series(
        ["MULTILINESTRING ((0 0, 1 0), (2 0, 1 0))",
         "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))"]))
    und = W.to_wkt(line_merge(lm))
    dird = W.to_wkt(line_merge(lm, directed=True))
    assert und[0] == "LINESTRING (0 0, 1 0, 2 0)"      # reversal allowed
    assert dird[0].startswith("MULTILINESTRING")        # not merged
    assert dird[1] == "LINESTRING (0 0, 1 0, 2 0)"      # direction agrees
    # offset mitre passes through the offset-line intersection; bevel
    # connects the segment offsets directly (shorter)
    line = W.from_wkt(pd.Series(["LINESTRING (0 0, 10 0, 10 -10)"]))
    om = offset_curve(line, 2.0, join_style="mitre")
    ob = offset_curve(line, 2.0, join_style="bevel")
    cm = om.coords
    assert any((abs(c[0] - 12) < 1e-12 and abs(c[1] - 2) < 1e-12)
               for c in cm)  # mitre point (12, 2)
    def _len(b):
        c = b.coords
        return float(np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1)).sum())
    assert _len(ob) < _len(om)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="join_style"):
        offset_curve(line, 2.0, join_style="sharp")


def test_delaunay_voronoi_tolerance():
    """base.py:908/999 ``tolerance``: vertices within the tolerance snap
    together before triangulation (4 points with one near-duplicate ->
    1 triangle; tolerance 0 keeps it as 2)."""
    import numpy as np

    from geopandas_spark.geom.triangulate import delaunay, snap_points, voronoi

    pts = np.array([[0.0, 0.0], [10.0, 0.0], [5.0, 8.0], [0.001, 0.001]])
    tris0, up0 = delaunay(pts, tolerance=0.0)
    tris1, up1 = delaunay(pts, tolerance=0.01)
    assert len(up0) == 4 and len(tris0) == 3  # near-dup splits the fan
    assert len(up1) == 3 and len(tris1) == 1
    cells, upv = voronoi(pts, (-1, -1, 11, 9), tolerance=0.01)
    assert len(upv) == 3 and sum(c is not None for c in cells) == 3
    # snapped coordinates collapse onto the FIRST kept point
    s = snap_points(pts, 0.01)
    assert (s[3] == s[0]).all()


def test_buffer_single_sided():
    """base.py:4806 single_sided: left strip for +d, right for -d, flat
    ends; round joins use a wedge (no spill across the line); polygons
    ignore the flag (GEOS parity). Closed-form areas at d=2."""
    import numpy as np
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.kernels import area as _area
    from geopandas_spark.geom.transforms import buffer_general

    d = 2.0
    seg = W.from_wkt(pd.Series(["LINESTRING (0 0, 10 0)"]))
    assert _area(buffer_general(seg, d, single_sided=True))[0] == d * 10
    assert _area(buffer_general(seg, -d, single_sided=True))[0] == d * 10
    ell = W.from_wkt(pd.Series(["LINESTRING (0 0, 10 0, 10 10)"]))
    # the L turns left: the left strip's corner is inner (-d^2), the
    # right strip's is outer (+d^2 mitre, +d^2/2 bevel, +pi d^2/4 round)
    assert _area(buffer_general(
        ell, d, single_sided=True, join_style="mitre"))[0] == 20 * d - d * d
    assert _area(buffer_general(
        ell, -d, single_sided=True, join_style="mitre"))[0] == 20 * d + d * d
    assert _area(buffer_general(
        ell, -d, single_sided=True, join_style="bevel"))[0] == \
        20 * d + d * d / 2
    ar = _area(buffer_general(ell, -d, single_sided=True,
                              join_style="round", quad_segs=64))[0]
    want = 20 * d + np.pi * d * d / 4
    assert want * 0.999 < ar < want + 1e-9
    sq = W.from_wkt(pd.Series(["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"]))
    assert _area(buffer_general(
        sq, d, single_sided=True, join_style="mitre"))[0] == (10 + 2 * d) ** 2


def test_buffer_styles_holed_polygon():
    """Join styles only shape CONVEX offset corners: a hole's corners
    are concave, so the remaining hole is the exact erosion of the hole
    under EVERY style (Minkowski semantics) — outer-ring corners still
    differ by style."""
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.kernels import area as _area
    from geopandas_spark.geom.transforms import buffer_general

    holed = W.from_wkt(pd.Series([
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(3 3, 7 3, 7 7, 3 7, 3 3))"]))
    d = 1.0
    # grow: outer (10+2d)^2 with style corners; hole erodes to (4-2d)^2
    assert _area(buffer_general(holed, d, join_style="mitre"))[0] == \
        12 * 12 - 2 * 2
    assert _area(buffer_general(holed, d, join_style="bevel"))[0] == \
        (12 * 12 - 4 * 0.5) - 2 * 2
    # erode: outer shrinks exactly (concave from the offset's view);
    # the hole DILATES, and the dilated hole's corners are CONVEX, so
    # style applies there — mitre fills the full corner square, bevel
    # cuts d^2/2 per corner off the dilation
    assert _area(buffer_general(holed, -d, join_style="mitre"))[0] == \
        8 * 8 - 6 * 6
    assert _area(buffer_general(holed, -d, join_style="bevel"))[0] == \
        8 * 8 - (6 * 6 - 4 * 0.5)
