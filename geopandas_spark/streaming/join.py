"""Stream-static spatial join (Structured Streaming).

The reference (GeoPandas) is batch-only, but the engine's spatial-join
machinery (sjoin.py:224, cells.py:184) is stateless per row-pair, so it
maps directly onto a Spark stream-static inner join:

    stream side (unbounded)  — cell cover, narrow per-microbatch
    static side (dimension)  — cell cover computed ONCE, cached, and
                               broadcast into every microbatch

No watermark, no state store: candidate generation is an equi-join on
cell id, and exact-pair dedup uses the stateless reference-point rule (a
pair is emitted only from the cell containing the top-left corner of the
two bboxes' intersection), so a geometry covered by many cells still
yields each pair exactly once — without dropDuplicates, which would need
unbounded state on a stream.

At 100 TB/day this is the shape you want: the static side is a bounded
dimension (boundaries, geofences) whose exploded cover fits in executor
memory; every microbatch does a broadcast hash join plus an Arrow refine,
all narrow, no shuffle of the stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..index.cells import DOMAIN_UNIT

# predicates whose true pairs always have overlapping bboxes — the
# reference-point dedup rule is exact for these. dwithin needs a cover
# expansion that would couple resolution to distance; not offered here.
_BBOX_SAFE = frozenset({
    "intersects", "contains", "contains_properly", "within", "covers",
    "covered_by", "touches", "crosses", "overlaps", "equals",
})


def _refine_keep(predicate: str, domain) -> Column:
    """Pairwise predicate + reference-point cell ownership, one Arrow pass."""

    @pandas_udf("boolean")
    def _f(lg: pd.Series, rg: pd.Series, cell: pd.Series) -> pd.Series:
        from ..geom.kernels import bounds
        from ..geom.predicates import pairwise_predicate
        from ..geom.wkb import from_wkb
        from ..index import cells as C

        lb = from_wkb(lg)
        rb = from_wkb(rg)
        ok = np.asarray(pairwise_predicate(predicate, lb, rb), dtype=bool)
        lbb = bounds(lb)
        rbb = bounds(rb)
        rpx = np.maximum(lbb[:, 0], rbb[:, 0])
        rpy = np.maximum(lbb[:, 1], rbb[:, 1])
        ids = cell.to_numpy(dtype=np.int64)
        own = np.empty(len(ids), dtype=np.int64)
        for r in np.unique(C.cell_res(ids)):
            m = C.cell_res(ids) == r
            own[m] = C.point_cell(np.nan_to_num(rpx[m]), np.nan_to_num(rpy[m]),
                                  int(r), domain=domain)
        return pd.Series(ok & (own == ids))

    return _f


def sjoin_stream(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    resolution: int = 7,
    left_geom: str = "geometry",
    right_geom: str = "geometry",
    right_id: str = "index_right",
    domain=DOMAIN_UNIT,
    max_cells: int = 4096,
) -> DataFrame:
    """Spatial join of a (possibly streaming) ``left`` against a STATIC
    ``right``. Returns left rows joined with ``right``'s id column; works
    identically on batch frames (the pytest oracle runs it both ways).

    ``resolution`` is fixed (no stats pass — a streaming plan cannot
    collect), chosen by the caller from the static side's feature size
    via index.cells.pick_resolution.
    """
    if predicate not in _BBOX_SAFE:
        raise ValueError(
            f"sjoin_stream supports {sorted(_BBOX_SAFE)}; got {predicate!r}"
            " (dwithin needs a distance-expanded cover; use batch sjoin)")
    from ..functions.st import st_cells

    rcells = (
        right.withColumn(
            "__cell",
            F.explode(st_cells(right_geom, resolution, domain=domain,
                               max_cells=max_cells)))
        .select(F.col(right_id),
                F.col(right_geom).alias("__rgeom"), "__cell")
        # lazy localCheckpoint pins ONE materialization of the static
        # cover across microbatches; its blocks are GC-freed by the
        # ContextCleaner when the query stops (persist() would leak a
        # CacheManager entry until an explicit unpersist)
        .localCheckpoint(eager=False)
    )
    lcells = left.withColumn(
        "__cell",
        F.explode(st_cells(left_geom, resolution, domain=domain,
                           max_cells=max_cells)))
    joined = lcells.join(F.broadcast(rcells), "__cell", "inner")
    keep = _refine_keep(predicate, domain)
    out = joined.filter(keep(F.col(left_geom), F.col("__rgeom"),
                             F.col("__cell")))
    return out.drop("__cell", "__rgeom")
