"""Codec round-trips + fixture geometries from the reference test suite
(t1..t6, squares, nested squares — tests/test_geom_methods.py:40-75)."""

import numpy as np
import pytest

from geopandas_spark.geom import wkb as B
from geopandas_spark.geom import wkt as W
from geopandas_spark.geom.ragged import points_batch

CASES = [
    "POINT (5 5)",
    "POINT EMPTY",
    "LINESTRING (0 0, 3 4)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "POLYGON EMPTY",
    "MULTIPOINT ((1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 0), (0 1, 1 1, 1 2))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    "MULTIPOLYGON EMPTY",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
]


@pytest.mark.parametrize("wkt", CASES)
def test_wkt_wkb_roundtrip(wkt):
    b = W.from_wkt([wkt])
    wkb = B.to_wkb(b)
    b2 = B.from_wkb(list(wkb))
    assert W.to_wkt(b2)[0] == wkt


def test_missing_roundtrip():
    b = W.from_wkt([None, "POINT (1 2)"])
    assert b.types[0] == 0
    wkb = B.to_wkb(b)
    assert wkb[0] is None
    b2 = B.from_wkb(list(wkb))
    assert b2.types[0] == 0


def test_point_fast_path_matches_general():
    x = np.array([0.1, 0.25, 0.99])
    y = np.array([0.7, 0.0, 0.5])
    fast = B.to_wkb(points_batch(x, y))
    slow = B.to_wkb(W.from_wkt([f"POINT ({a!r} {b!r})" for a, b in zip(x, y)]))
    assert list(fast) == list(slow)
    back = B.from_wkb(list(fast))
    assert np.allclose(back.coords, np.column_stack([x, y]))


def test_z_parsing():
    b = W.from_wkt(["POINT Z (1 2 3)"])
    assert b.geom_has_z is not None and b.geom_has_z[0]
    assert b.zs[0] == 3.0
    # Z round-trips through WKB and WKT (reference array.py:118-207)
    assert W.to_wkt(B.from_wkb(list(B.to_wkb(b))))[0] == "POINT Z (1 2 3)"


def test_z_roundtrip_all_types():
    """Z survives WKT -> batch -> WKB -> batch -> WKT for every type,
    and 2-D rows in the same batch stay 2-D (reference 3-D fixtures,
    tests/test_geom_methods.py:40-75)."""
    wkts = [
        "POINT Z (1 2 3)",
        "LINESTRING Z (0 0 1, 2 2 4, 3 1 5)",
        "POLYGON Z ((0 0 1, 4 0 2, 4 4 3, 0 4 4, 0 0 1))",
        "MULTIPOINT Z ((1 1 9), (2 2 8))",
        "MULTILINESTRING Z ((0 0 1, 1 1 2), (2 2 3, 3 3 4))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 2, 1 1 3, 0 0 1)))",
        "GEOMETRYCOLLECTION Z (POINT Z (5 6 7))",
        "POINT (9 9)",  # 2-D row in a mixed batch
        None,
    ]
    b = W.from_wkt(wkts)
    rt = W.to_wkt(B.from_wkb(list(B.to_wkb(b))), rounding=0)
    assert list(rt) == wkts
    assert not b.geom_has_z[7]


def test_big_endian_wkb():
    import struct

    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    assert W.to_wkt(B.from_wkb([be]))[0] == "POINT (3 4)"


def test_on_invalid_policies():
    with pytest.raises(W.WKTParseError):
        W.from_wkt(["NOT A GEOM"])
    b = W.from_wkt(["NOT A GEOM", "POINT (1 1)"], on_invalid="ignore")
    assert b.types[0] == 0 and b.types[1] == 1


def test_z_roundtrip_geojson():
    """Z survives WKT -> GeoJSON -> WKT (RFC 7946 3-element positions)."""
    import json

    from geopandas_spark.geom.ragged import GeometryBatchBuilder
    from geopandas_spark.sources.geojson import (_add_geojson,
                                                 geojson_geometry)

    wkts = [
        "POINT Z (1 2 3)",
        "LINESTRING Z (0 0 1, 2 2 4)",
        "POLYGON Z ((0 0 1, 4 0 2, 4 4 3, 0 0 1))",
        "MULTIPOINT Z ((1 1 9), (2 2 8))",
        "GEOMETRYCOLLECTION Z (POINT Z (5 6 7))",
        "POINT (9 9)",
    ]
    b = W.from_wkt(wkts)
    bld = GeometryBatchBuilder()
    for g in range(len(b)):
        _add_geojson(bld, json.loads(json.dumps(geojson_geometry(b, g))))
    assert list(W.to_wkt(bld.finish(), rounding=0)) == wkts


def test_get_coordinates_include_z():
    from geopandas_spark.geom import unary as U

    b = W.from_wkt(["LINESTRING Z (0 0 5, 1 1 6)", "POINT (2 3)"])
    c3, idx = U.get_coordinates(b, include_z=True)
    assert c3.shape == (3, 3)
    assert list(idx) == [0, 0, 1]
    assert list(c3[:, 2][:2]) == [5.0, 6.0]
    assert np.isnan(c3[2, 2])
    c2, _ = U.get_coordinates(b)
    assert c2.shape == (3, 2)
