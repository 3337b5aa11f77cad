"""Tiling: geometry -> tile assignments + per-tile clipped geometry, and a
raster<->vector bridge (SURVEY.md §2.8; north rule "raster<->vector").

``to_tiles(zoom)`` assigns every geometry the quadtree cells at
res=zoom whose boxes its bbox covers (tile scheme == cell scheme, i.e.
slippy-map z/x/y over the configured domain), then clips the geometry to
each tile window with the exact rect clip — the distributed analogue of
the reference's per-window ``clip``/``cx`` semantics (tools/clip.py,
base.py:5513).

``rasterize`` (vector -> raster) emits per-tile pixel coverage by testing
pixel centers against the clipped geometry; ``vectorize`` (raster ->
vector) turns a pixel mask back into rectilinear polygons via the exact
boundary tracer. Both stay partition-local per tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.st import st_cells
from ..index.cells import DOMAIN_UNIT


def to_tiles(df: DataFrame, zoom: int, geom: str = "geometry",
             domain=DOMAIN_UNIT, clip: bool = True) -> DataFrame:
    """-> input columns + tile_id (long) + tile_geom (clipped WKB)."""
    from ..conf import widen

    df = widen(df)
    tiled = df.withColumn("tile_id", F.explode(st_cells(geom, zoom, domain=domain)))

    if not clip:
        return tiled

    @pandas_udf("binary")
    def _clip_to_tile(g: pd.Series, tile: pd.Series) -> pd.Series:
        from ..geom import wkb as B
        from ..geom.transforms import clip_by_rect
        from ..index import cells as C

        batch = B.from_wkb(g)
        tb = C.cell_bounds(tile.to_numpy(dtype=np.int64), domain=domain)
        out = np.empty(len(g), dtype=object)
        # group rows by tile so each clip call is vectorized per tile
        order = np.argsort(tile.to_numpy(), kind="stable")
        ids = tile.to_numpy()[order]
        bnd = np.nonzero(np.diff(ids))[0] + 1
        for grp in np.split(order, bnd):
            r = tb[grp[0]]
            sub = batch.take(grp)
            clipped = clip_by_rect(sub, r[0], r[1], r[2], r[3])
            out[grp] = B.to_wkb(clipped)
        return pd.Series(out)

    return tiled.withColumn("tile_geom", _clip_to_tile(F.col(geom), F.col("tile_id")))


def rasterize(df: DataFrame, zoom: int, pixels: int = 16,
              geom: str = "geometry", domain=DOMAIN_UNIT) -> DataFrame:
    """vector -> raster: (tile_id, px, py, covered) pixel-coverage rows.
    Pixel centers tested against the geometry (exact PIP kernel)."""
    tiled = to_tiles(df, zoom, geom=geom, domain=domain, clip=True)

    @pandas_udf("array<int>")
    def _pixels(g: pd.Series, tile: pd.Series) -> pd.Series:
        from ..geom import wkb as B
        from ..geom.kernels import points_in_geom
        from ..index import cells as C

        batch = B.from_wkb(g)
        tb = C.cell_bounds(tile.to_numpy(dtype=np.int64), domain=domain)
        out = []
        for i in range(len(g)):
            if g.iloc[i] is None:
                out.append(None)
                continue
            minx, miny, maxx, maxy = tb[i]
            xs = np.linspace(minx, maxx, pixels, endpoint=False) + (maxx - minx) / (2 * pixels)
            ys = np.linspace(miny, maxy, pixels, endpoint=False) + (maxy - miny) / (2 * pixels)
            XX, YY = np.meshgrid(xs, ys, indexing="ij")
            st = points_in_geom(XX.ravel(), YY.ravel(), batch, i)
            out.append(np.nonzero(st != 0)[0].astype(np.int32).tolist())
        return pd.Series(out)

    return tiled.withColumn("covered_pixels",
                            _pixels(F.col("tile_geom"), F.col("tile_id")))


def vectorize_mask(df: DataFrame, zoom: int, pixels: int = 16,
                   mask_col: str = "covered_pixels",
                   tile_col: str = "tile_id",
                   domain=DOMAIN_UNIT,
                   out_col: str = "geometry") -> DataFrame:
    """raster -> vector: pixel index arrays back to rectilinear WKB
    polygons per tile (exact boundary tracing)."""

    @pandas_udf("binary")
    def _vec(mask: pd.Series, tile: pd.Series) -> pd.Series:
        from ..geom import wkb as B
        from ..geom.clipping import _trace_cells
        from ..geom.ragged import (
            MULTIPOLYGON, POLYGON, GeometryBatchBuilder,
        )
        from ..index import cells as C

        tb = C.cell_bounds(tile.to_numpy(dtype=np.int64), domain=domain)
        bld = GeometryBatchBuilder()
        for i in range(len(mask)):
            m = mask.iloc[i]
            if m is None:
                bld.add_missing()
                continue
            sel = np.zeros((pixels, pixels), dtype=bool)
            idx = np.asarray(m, dtype=np.int64)
            sel[idx // pixels, idx % pixels] = True
            minx, miny, maxx, maxy = tb[i]
            xs = np.linspace(minx, maxx, pixels + 1)
            ys = np.linspace(miny, maxy, pixels + 1)
            polys = _trace_cells(xs, ys, sel)
            if not polys:
                bld.add(POLYGON, [(POLYGON, [])])
            elif len(polys) == 1:
                bld.add(POLYGON, [(POLYGON, polys[0])])
            else:
                bld.add(MULTIPOLYGON, [(POLYGON, r) for r in polys])
        return pd.Series(list(B.to_wkb(bld.finish())))

    return df.withColumn(out_col, _vec(F.col(mask_col), F.col(tile_col)))
