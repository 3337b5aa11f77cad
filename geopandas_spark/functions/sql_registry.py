"""SQL surface: ``register_sql_functions(spark)``.

SURVEY §2.5 note made concrete: exposing the engine through
``spark.sql("SELECT st_area(geometry) FROM t")`` costs nothing beyond
registering the SAME pandas-UDF factories the Column API uses
(functions/st.py), so SQL and DataFrame results are identical — pinned
by test_sql_registry's per-function SQL-vs-Column comparison.

Arity notes: Spark SQL UDFs are fixed-arity, so parameterized
functions register with their most common signature (``st_buffer(geom,
distance)`` with quad_segs=8, etc.) and require the parameter to be a
constant per call (a SQL literal) — varying per-row parameters raise a
clear error rather than silently taking the first row's value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _const(p: pd.Series, name: str):
    u = pd.unique(p)
    if len(u) != 1:
        raise ValueError(
            f"{name}: the SQL-registered form needs a constant (literal) "
            "parameter; use the Column API for per-row parameters")
    return u[0]


def _astext_udf():
    @pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.wkb import from_wkb
        from ..geom.wkt import to_wkt

        return pd.Series(list(to_wkt(from_wkb(s))))

    return _f


def _fromtext_udf():
    @pandas_udf("binary")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.wkb import to_wkb
        from ..geom.wkt import from_wkt

        return pd.Series(list(to_wkb(from_wkt(s))))

    return _f


def _point_udf():
    @pandas_udf("binary")
    def _f(xs: pd.Series, ys: pd.Series) -> pd.Series:
        from ..geom.ragged import points_batch
        from ..geom.wkb import to_wkb

        miss = xs.isna().to_numpy() | ys.isna().to_numpy()
        b = points_batch(
            np.nan_to_num(xs.to_numpy(dtype=np.float64)),
            np.nan_to_num(ys.to_numpy(dtype=np.float64)),
            mask_missing=miss)
        return pd.Series(list(to_wkb(b)))

    return _f


def _centroid_udf():
    @pandas_udf("binary")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.kernels import centroid
        from ..geom.ragged import points_batch
        from ..geom.wkb import from_wkb, to_wkb

        c = centroid(from_wkb(s))
        miss = np.isnan(c[:, 0])
        return pd.Series(list(to_wkb(points_batch(
            np.nan_to_num(c[:, 0]), np.nan_to_num(c[:, 1]),
            mask_missing=miss))))

    return _f


def _geomtype_udf():
    @pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.ragged import TYPE_NAMES
        from ..geom.wkb import from_wkb

        return pd.Series([TYPE_NAMES[int(t)] for t in from_wkb(s).types])

    return _f


def _isempty_udf():
    @pandas_udf("boolean")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.wkb import from_wkb

        return pd.Series(from_wkb(s).is_empty())

    return _f


def _pred_udf(pred: str):
    @pandas_udf("boolean")
    def _f(sa: pd.Series, sb: pd.Series) -> pd.Series:
        from ..geom.predicates import pairwise_predicate
        from ..geom.wkb import from_wkb

        return pd.Series(pairwise_predicate(pred, from_wkb(sa),
                                            from_wkb(sb), None))

    return _f


def _dwithin_udf():
    @pandas_udf("boolean")
    def _f(sa: pd.Series, sb: pd.Series, d: pd.Series) -> pd.Series:
        from ..geom.predicates import pairwise_predicate
        from ..geom.wkb import from_wkb

        dist = float(_const(d, "st_dwithin"))
        return pd.Series(pairwise_predicate("dwithin", from_wkb(sa),
                                            from_wkb(sb), dist))

    return _f


def _distance_udf():
    @pandas_udf("double")
    def _f(sa: pd.Series, sb: pd.Series) -> pd.Series:
        from ..geom.predicates import pairwise_distance
        from ..geom.wkb import from_wkb

        return pd.Series(pairwise_distance(from_wkb(sa), from_wkb(sb)))

    return _f


def _buffer_udf():
    @pandas_udf("binary")
    def _f(s: pd.Series, d: pd.Series) -> pd.Series:
        from ..geom import transforms as t
        from ..geom.ragged import POINT
        from ..geom.wkb import from_wkb, to_wkb

        dist = float(_const(d, "st_buffer"))
        b = from_wkb(s)
        if dist > 0 and len(b) and (b.types == POINT).all() and (
                b.n_coords_per_geom() == 1).all():
            out = t.buffer_points(b, dist, 8)
        else:
            out = t.buffer_general(b, dist, 8)
        return pd.Series(list(to_wkb(out)))

    return _f


def _param_transform_udf(meth: str, name: str):
    @pandas_udf("binary")
    def _f(s: pd.Series, p: pd.Series) -> pd.Series:
        from ..geom import transforms
        from ..geom.wkb import from_wkb, to_wkb

        v = float(_const(p, name))
        return pd.Series(list(to_wkb(
            getattr(transforms, meth)(from_wkb(s), v))))

    return _f


def _param_unary_udf(meth: str, name: str):
    @pandas_udf("binary")
    def _f(s: pd.Series, p: pd.Series) -> pd.Series:
        from ..geom import unary
        from ..geom.wkb import from_wkb, to_wkb

        v = float(_const(p, name))
        return pd.Series(list(to_wkb(getattr(unary, meth)(from_wkb(s), v))))

    return _f


def build_registry() -> dict:
    """name -> pandas_udf for every SQL-registrable function."""
    from . import st as S

    reg: dict = {
        "st_astext": _astext_udf(),
        "st_geomfromtext": _fromtext_udf(),
        "st_point": _point_udf(),
        "st_centroid": _centroid_udf(),
        "st_geometry_type": _geomtype_udf(),
        "st_is_empty": _isempty_udf(),
        "st_distance": _distance_udf(),
        "st_dwithin": _dwithin_udf(),
        "st_buffer": _buffer_udf(),
        "st_simplify": _param_transform_udf("simplify", "st_simplify"),
        "st_segmentize": _param_unary_udf("segmentize", "st_segmentize"),
        "st_set_precision": _param_unary_udf("set_precision",
                                             "st_set_precision"),
        "st_interpolate": _param_unary_udf("interpolate", "st_interpolate"),
    }
    for name, kern, ret in (
            ("st_area", "area", "double"),
            ("st_length", "length", "double"),
            ("st_x", "get_x", "double"),
            ("st_y", "get_y", "double"),
            ("st_num_coordinates", "count_coordinates", "long"),
            ("st_num_geometries", "count_geometries", "long"),
            ("st_num_interior_rings", "count_interior_rings", "int")):
        reg[name] = S._scalar_udf(kern, ret)
    for name, kern, ret in (
            ("st_is_valid", "is_valid", "boolean"),
            ("st_is_simple", "is_simple", "boolean"),
            ("st_is_ring", "is_ring", "boolean"),
            ("st_is_ccw", "is_ccw", "boolean"),
            ("st_is_closed", "is_closed", "boolean"),
            ("st_has_z", "has_z", "boolean"),
            ("st_z", "get_z", "double"),
            ("st_minimum_bounding_radius", "minimum_bounding_radius",
             "double"),
            ("st_minimum_clearance", "minimum_clearance", "double")):
        reg[name] = S._unary_scalar_udf(kern, ret)
    for name, kern in (
            ("st_exterior", "exterior"),
            ("st_extract_unique_points", "extract_unique_points"),
            ("st_normalize", "normalize"),
            ("st_line_merge", "line_merge"),
            ("st_minimum_rotated_rectangle", "minimum_rotated_rectangle"),
            ("st_minimum_bounding_circle", "minimum_bounding_circle")):
        reg[name] = S._unary_geom_udf(kern)
    for name, meth in (
            ("st_envelope", "envelope"),
            ("st_convex_hull", "convex_hull"),
            ("st_boundary", "boundary"),
            ("st_reverse", "reverse"),
            ("st_force_2d", "force_2d")):
        reg[name] = S._transform_udf(
            lambda t, b, _m=meth: getattr(t, _m)(b))
    for pred in ("intersects", "contains", "contains_properly", "within",
                 "covers", "covered_by", "touches", "crosses", "overlaps",
                 "disjoint", "equals"):
        reg[f"st_{pred}"] = _pred_udf(pred)
    for name, op in (
            ("st_intersection", "intersection"),
            ("st_difference", "difference"),
            ("st_union", "union"),
            ("st_symmetric_difference", "symmetric_difference")):
        reg[name] = S._pairwise_geom_udf(op)
    return reg


def register_sql_functions(spark) -> list[str]:
    """Register the engine's st_* surface for ``spark.sql`` string
    queries. Returns the sorted list of registered function names."""
    reg = build_registry()
    for name, f in reg.items():
        spark.udf.register(name, f)
    return sorted(reg)
