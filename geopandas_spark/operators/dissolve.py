"""dissolve / union_all — grouped geometry union + attribute aggregation.

Reference: GeoDataFrame.dissolve (/root/reference/geopandas/geodataframe.py:
1325-1415): groupby(by) -> geometry union_all per group + pandas
groupby.agg(aggfunc) for the other columns; by=None -> one group.
union_all methods (base.py:1954-2015): 'unary' (full boolean union),
'coverage' (fast path for non-overlapping inputs).

Physical plan (SURVEY.md §2.5): two-level partial aggregation —
groupBy(by, salt) unions partition-sized chunks, then groupBy(by) unions
the partials (the Spark partial+final agg pattern; bounds the biggest
single union to ~|group|/64). Attribute aggs run as plain Catalyst aggs
(no UDF) and join back on the keys.

Union engine: exact boolean union when every geometry in the group is a
rectilinear polygon (geom/clipping.rectilinear_boolean); otherwise parts
are collected into a Multi* — exact when inputs are disjoint (the
reference dissolve test fixtures are disjoint, tests/test_dissolve.py:
15-24). Overlapping non-rectilinear unions raise unless
``method='coverage'`` (collect) is requested explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_AGG_MAP = {
    "first": F.first, "last": F.last, "sum": F.sum, "min": F.min,
    "max": F.max, "mean": F.avg, "avg": F.avg, "count": F.count,
}


def union_batch_parts(wkbs, method: str):
    """Union a list of WKB geometries -> single WKB (numpy path)."""
    from ..geom import wkb as B
    from ..geom.clipping import polygons_rectilinear, rectilinear_boolean
    from ..geom.ragged import (
        GeometryBatchBuilder, LINESTRING, MULTILINESTRING, MULTIPOINT,
        MULTIPOLYGON, POINT, POLYGON,
    )

    vals = [w for w in wkbs if w is not None]
    if not vals:
        return None
    batch = B.from_wkb(vals)
    n = len(batch)
    # exact rectilinear union when possible and requested
    if method == "unary":
        from ..geom.clipping import rect_union_many

        rects = [polygons_rectilinear(batch, g) for g in range(n)]
        if all(r is not None and len(r) for r in rects):
            polys = rect_union_many(rects)
            out = GeometryBatchBuilder()
            _add_polys(out, polys)
            return B.to_wkb(out.finish())[0]
        # general polygonal union: Martinez-Rueda sweep, tree-folded
        from ..geom.ragged import TYPE_DIM

        if (TYPE_DIM[batch.types] == 2).all():
            from ..geom.boolean import boolean_rings, group_rings
            from ..geom.clipping import _all_poly_rings

            ring_sets = [_all_poly_rings(batch, g)[0] for g in range(n)]
            ring_sets = [r for r in ring_sets if r]
            while len(ring_sets) > 1:
                nxt = []
                for i in range(0, len(ring_sets), 2):
                    if i + 1 < len(ring_sets):
                        nxt.append(boolean_rings(
                            ring_sets[i], ring_sets[i + 1], "union"))
                    else:
                        nxt.append(ring_sets[i])
                ring_sets = nxt
            out = GeometryBatchBuilder()
            _add_polys(out, group_rings(ring_sets[0]) if ring_sets else [])
            return B.to_wkb(out.finish())[0]
    # collect path: gather all parts into a Multi*
    out = GeometryBatchBuilder()
    parts = []
    ptypes = set()
    for p in range(batch.n_parts):
        pt = int(batch.part_types[p])
        rings = batch.part_rings(p)
        if rings:
            parts.append((pt, rings))
            ptypes.add(pt)
    if not parts:
        out.add(POLYGON, [(POLYGON, [])])
    elif len(parts) == 1:
        out.add(parts[0][0], parts)
    elif len(ptypes) == 1:
        multi = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING,
                 POLYGON: MULTIPOLYGON}[parts[0][0]]
        out.add(multi, parts)
    else:
        from ..geom.ragged import GEOMETRYCOLLECTION
        out.add(GEOMETRYCOLLECTION, parts)
    return B.to_wkb(out.finish())[0]


def _add_polys(out, polys):
    from ..geom.ragged import MULTIPOLYGON, POLYGON

    if not polys:
        out.add(POLYGON, [(POLYGON, [])])
    elif len(polys) == 1:
        out.add(POLYGON, [(POLYGON, polys[0])])
    else:
        out.add(MULTIPOLYGON, [(POLYGON, rings) for rings in polys])


def _union_arr_udf(method: str):
    @pandas_udf("binary")
    def _f(arrs: pd.Series) -> pd.Series:
        return pd.Series([union_batch_parts(list(a), method) for a in arrs])

    return _f


def dissolve(
    df: DataFrame,
    by: str | list[str] | None = None,
    aggfunc="first",
    geom: str = "geometry",
    method: str = "unary",
    two_level: bool = True,
    salt_buckets: int = 64,
    dropna: bool = True,
) -> DataFrame:
    """Grouped geometry union + attribute aggregation.

    aggfunc: a name ('first','sum',...) applied to all non-key columns, or
    a dict {column: name} (reference geodataframe.py:1343-1351).
    """
    if by is None:
        keys: list[str] = []
    elif isinstance(by, str):
        keys = [by]
    else:
        keys = list(by)
    if dropna and keys:
        df = df.dropna(subset=keys)

    attr_cols = [c for c in df.columns if c != geom and c not in keys]
    if isinstance(aggfunc, str):
        aggmap = {c: aggfunc for c in attr_cols}
    else:
        aggmap = dict(aggfunc)
    aggs = []
    for c, fn in aggmap.items():
        if fn not in _AGG_MAP:
            raise ValueError(f"unsupported aggfunc {fn!r} for column {c!r}")
        aggs.append(_AGG_MAP[fn](F.col(c)).alias(c))

    gkeys = keys if keys else [F.lit(0).alias("__g")]
    gnames = keys if keys else ["__g"]

    # --- geometry union: two-level partial aggregation -------------------
    gdf = df.select(*gkeys, F.col(geom).alias("__geom"))
    if two_level:
        gdf = gdf.withColumn("__salt", F.pmod(F.xxhash64("__geom"), F.lit(salt_buckets)))
        partial = (
            gdf.groupBy(*gnames, "__salt")
            .agg(F.collect_list("__geom").alias("__arr"))
            .withColumn("__u", _union_arr_udf(method)(F.col("__arr")))
            .drop("__arr")
        )
        final = (
            partial.groupBy(*gnames)
            .agg(F.collect_list("__u").alias("__arr"))
            .withColumn(geom, _union_arr_udf(method)(F.col("__arr")))
            .drop("__arr")
        )
    else:
        final = (
            gdf.groupBy(*gnames)
            .agg(F.collect_list("__geom").alias("__arr"))
            .withColumn(geom, _union_arr_udf(method)(F.col("__arr")))
            .drop("__arr")
        )

    if aggs:
        attrs = df.groupBy(*gkeys).agg(*aggs)
        outdf = final.join(attrs, on=gnames, how="inner")
    else:
        outdf = final
    if not keys:
        outdf = outdf.drop("__g")
    return outdf


def union_all(df: DataFrame, geom: str = "geometry", method: str = "unary") -> bytes | None:
    """N-ary union of a whole column -> single WKB (base.py:1954)."""
    row = dissolve(df.select(geom), by=None, geom=geom, method=method).collect()
    return row[0][geom] if row else None
