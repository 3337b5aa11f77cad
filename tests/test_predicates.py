"""All 11 binary predicates vs hand-computed truth + random cross-check
(mirrors tests/test_geom_methods.py predicate coverage)."""

import numpy as np
import pytest

from geopandas_spark.geom import wkt as W
from geopandas_spark.geom.predicates import (
    PREDICATES, pairwise_distance, pairwise_predicate)


def P(*w):
    return W.from_wkt(list(w))


SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
INNER = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
OVERLAP = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
TOUCH = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"
DISJ = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"


@pytest.mark.parametrize("pred,expected", [
    ("intersects",       [True, True, True, False, True]),
    ("within",           [True, False, False, False, True]),
    ("covered_by",       [True, False, False, False, True]),
    ("overlaps",         [False, True, False, False, False]),
    ("touches",          [False, False, True, False, False]),
    ("equals",           [False, False, False, False, True]),
    ("crosses",          [False, False, False, False, False]),
])
def test_polygon_polygon(pred, expected):
    lb = P(INNER, OVERLAP, TOUCH, DISJ, SQ)
    rb = P(SQ, SQ, SQ, SQ, SQ)
    assert list(pairwise_predicate(pred, lb, rb)) == expected


@pytest.mark.parametrize("pred,expected", [
    ("intersects",        [True, True, False, True]),
    ("within",            [True, False, False, False]),
    ("touches",           [False, True, False, True]),
])
def test_point_vs_polygon(pred, expected):
    lb = P("POINT (1 1)", "POINT (0 0)", "POINT (5 5)", "POINT (4 2)")
    rb = P(SQ, SQ, SQ, SQ)
    assert list(pairwise_predicate(pred, lb, rb)) == expected


def test_polygon_contains_point():
    lb = P(SQ, SQ, SQ, SQ)
    rb = P("POINT (1 1)", "POINT (0 0)", "POINT (5 5)", "POINT (4 2)")
    assert list(pairwise_predicate("contains", lb, rb)) == [True, False, False, False]
    assert list(pairwise_predicate("covers", lb, rb)) == [True, True, False, True]
    assert list(pairwise_predicate("contains_properly", lb, rb)) == [True, False, False, False]


def test_line_polygon():
    lb = P("LINESTRING (1 1, 2 2)", "LINESTRING (2 2, 6 6)",
           "LINESTRING (5 0, 6 1)", "LINESTRING (0 0, 4 0)")
    rb = P(SQ, SQ, SQ, SQ)
    assert list(pairwise_predicate("intersects", lb, rb)) == [True, True, False, True]
    assert list(pairwise_predicate("crosses", lb, rb)) == [False, True, False, False]
    assert list(pairwise_predicate("within", lb, rb)) == [True, False, False, False]
    assert list(pairwise_predicate("touches", lb, rb)) == [False, False, False, True]


def test_distance_and_dwithin():
    lb = P("POINT (0 0)", "POINT (0 0)", "POINT (0 0)", "LINESTRING (0 0, 0 10)")
    rb = P("POINT (3 4)", SQ, DISJ, "POINT (5 5)")
    d = pairwise_distance(lb, rb)
    assert d[0] == 5.0
    assert d[1] == 0.0
    assert np.isclose(d[2], np.sqrt(200))
    assert d[3] == 5.0
    assert list(pairwise_predicate("dwithin", lb, rb, 5.0)) == [True, True, False, True]
    assert list(pairwise_predicate("dwithin", lb, rb, 4.9)) == [False, True, False, False]


def test_none_empty_never_match():
    lb = W.from_wkt([None, "POINT EMPTY", "POINT (1 1)"])
    rb = P(SQ, SQ, SQ)
    for pred in PREDICATES:
        res = pairwise_predicate(pred, lb, rb, 1.0)
        assert not res[0] and not res[1]


def test_dwithin_requires_no_missing_crash():
    lb = W.from_wkt([None])
    rb = P(SQ)
    assert not pairwise_predicate("dwithin", lb, rb, 100.0)[0]


def test_grouping_correctness_with_mixed_right():
    """Many identical + some distinct right geoms in one batch: the group
    vectorization must not leak results across groups."""
    rng = np.random.default_rng(3)
    pts = [f"POINT ({x} {y})" for x, y in rng.random((50, 2)) * 8]
    rights = [SQ if i % 3 else OVERLAP for i in range(50)]
    lb = P(*pts)
    rb = P(*rights)
    got = pairwise_predicate("intersects", lb, rb)
    exp = [pairwise_predicate("intersects", P(p), P(r))[0]
           for p, r in zip(pts, rights)]
    assert list(got) == exp


def test_lineal_predicate_matrix_path():
    """Session-2 fix: line x line and line-through-polygon predicates via
    the exact DE-9IM slow path (GEOS truth values)."""
    import pandas as pd

    from geopandas_spark.geom import wkt as W
    from geopandas_spark.geom.predicates import pairwise_predicate

    def b(*w):
        return W.from_wkt(pd.Series(list(w)))

    P = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    cases = [
        ("crosses", "LINESTRING (1 -1, 1 3)", P, True),
        ("crosses", "LINESTRING (0 0, 2 0)", P, False),
        ("crosses", "MULTIPOINT (1 1, 5 5)", P, True),
        ("crosses", "MULTIPOINT (1 1, 0.5 0.5)", P, False),
        ("crosses", "LINESTRING (0 0, 2 2)", "LINESTRING (2 0, 0 2)", True),
        ("crosses", "LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)", False),
        ("overlaps", "LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)", True),
        ("overlaps", "LINESTRING (0 0, 2 0)", "LINESTRING (0 0, 2 0)", False),
        ("overlaps", "LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 2 0)", False),
        ("touches", "LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)", False),
        ("within", "LINESTRING (1 0, 2 0)", "LINESTRING (0 0, 3 0)", True),
        ("within", "LINESTRING (0 0, 2 0)", "LINESTRING (0 0, 3 0)", True),
        ("contains", "LINESTRING (0 0, 3 0)", "LINESTRING (1 0, 2 0)", True),
        ("covers", "LINESTRING (0 0, 3 0)", "LINESTRING (0 0, 2 0)", True),
        ("equals", "LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 0 0)", True),
        ("equals", "LINESTRING (0 0, 2 0)", "LINESTRING (0 0, 1 0)", False),
        ("contains", "LINESTRING (0 0, 2 0)", "POINT (1 0)", True),
        ("contains", "LINESTRING (0 0, 2 0)", "POINT (0 0)", False),
        ("touches", "LINESTRING (0 0, 2 0)", "POINT (0 0)", True),
        ("covers", "LINESTRING (0 0, 2 0)", "POINT (0 0)", True),
        ("within", "POINT (1 0)", "LINESTRING (0 0, 2 0)", True),
        ("within", "POINT (0 0)", "LINESTRING (0 0, 2 0)", False),
        ("contains_properly", P, "LINESTRING (0.5 0.5, 1 1)", True),
        ("contains_properly", P, "LINESTRING (0 0, 1 1)", False),
    ]
    for pred, wa, wb, exp in cases:
        got = bool(pairwise_predicate(pred, b(wa), b(wb))[0])
        assert got == exp, (pred, wa, wb, exp, got)
