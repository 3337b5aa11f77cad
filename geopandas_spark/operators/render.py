"""Render sink: rasterize a geometry column into a PNG image.

Reference surface: ``plot`` / ``explore`` (plotting.py:207, explore.py:15)
are matplotlib/folium sinks — unavailable here and not how a 100 TB
table renders anyway. The engine's render path is the tiling/rasterize
stage (§2.8) plus this full-frame renderer: pixel coverage is computed
per row on the executors, aggregated with a plain groupBy (map-side
combine), and only the BOUNDED pixel grid (<= max_pixels counts) reaches
the driver, where operators/codecs.py encodes a real PNG. That is the
standard datashader-style shape: shuffle pixels, not features.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _pixel_cover_udf(width: int, height: int, bbox: tuple):
    minx, miny, maxx, maxy = (float(v) for v in bbox)
    sx = width / (maxx - minx) if maxx > minx else 1.0
    sy = height / (maxy - miny) if maxy > miny else 1.0

    @pandas_udf("array<long>")
    def _cover(g: pd.Series) -> pd.Series:
        from ..geom import wkb as B
        from ..geom.kernels import points_in_geom
        from ..geom.ragged import TYPE_DIM

        batch = B.from_wkb(g)
        out = []
        for i in range(len(batch)):
            t = int(batch.types[i])
            if t == 0:
                out.append(None)
                continue
            dim = int(TYPE_DIM[t])
            c0, c1 = batch.geom_coord_off[i], batch.geom_coord_off[i + 1]
            coords = batch.coords[c0:c1]
            if len(coords) == 0:
                out.append([])
                continue
            if dim == 0:  # points: their own pixel
                px = np.floor((coords[:, 0] - minx) * sx).astype(np.int64)
                py = np.floor((coords[:, 1] - miny) * sy).astype(np.int64)
            elif dim == 1:  # lines: sample each ring at half-pixel steps
                xs, ys = [], []
                r0 = batch.geom_ring_off[i]
                r1 = batch.geom_ring_off[i + 1]
                step = 0.5 / max(sx, sy)
                for r in range(r0, r1):
                    a0, a1 = batch.ring_coord_off[r], batch.ring_coord_off[r + 1]
                    ring = batch.coords[a0:a1]
                    for k in range(len(ring) - 1):
                        p, q = ring[k], ring[k + 1]
                        n = max(1, int(np.hypot(*(q - p)) / step))
                        ts = np.linspace(0.0, 1.0, n + 1)
                        xs.append(p[0] + ts * (q[0] - p[0]))
                        ys.append(p[1] + ts * (q[1] - p[1]))
                if not xs:
                    out.append([])
                    continue
                fx = np.concatenate(xs)
                fy = np.concatenate(ys)
                px = np.floor((fx - minx) * sx).astype(np.int64)
                py = np.floor((fy - miny) * sy).astype(np.int64)
            else:  # polygons: pixel centers inside, restricted to bbox
                gx0 = max(0, int(np.floor((coords[:, 0].min() - minx) * sx)))
                gx1 = min(width - 1,
                          int(np.floor((coords[:, 0].max() - minx) * sx)))
                gy0 = max(0, int(np.floor((coords[:, 1].min() - miny) * sy)))
                gy1 = min(height - 1,
                          int(np.floor((coords[:, 1].max() - miny) * sy)))
                if gx1 < gx0 or gy1 < gy0:
                    out.append([])
                    continue
                cx = minx + (np.arange(gx0, gx1 + 1) + 0.5) / sx
                cy = miny + (np.arange(gy0, gy1 + 1) + 0.5) / sy
                XX, YY = np.meshgrid(cx, cy, indexing="ij")
                st = points_in_geom(XX.ravel(), YY.ravel(), batch, i)
                sel = st != 0
                PX, PY = np.meshgrid(np.arange(gx0, gx1 + 1),
                                     np.arange(gy0, gy1 + 1), indexing="ij")
                px = PX.ravel()[sel]
                py = PY.ravel()[sel]
            ok = (px >= 0) & (px < width) & (py >= 0) & (py < height)
            out.append(np.unique(py[ok] * width + px[ok]).tolist())
        return pd.Series(out)

    return _cover


def render_counts(df: DataFrame, width: int = 256, height: int = 256,
                  geom: str = "geometry", bbox=None) -> DataFrame:
    """-> (pixel, n) counts DataFrame — the distributed part of the
    render: explode per-row pixel covers, groupBy pixel (map-side
    combine). ``bbox`` defaults to the frame's total bounds."""
    if bbox is None:
        from ..functions.st import st_bounds

        b = df.select(st_bounds(geom).alias("b")).agg(
            F.min("b.minx"), F.min("b.miny"),
            F.max("b.maxx"), F.max("b.maxy")).collect()[0]
        bbox = tuple(b)
    cover = _pixel_cover_udf(width, height, bbox)
    return (df.select(F.explode(cover(F.col(geom))).alias("pixel"))
            .groupBy("pixel").agg(F.count("*").alias("n")))


def render_png(df: DataFrame, width: int = 256, height: int = 256,
               geom: str = "geometry", bbox=None,
               max_pixels: int = 16_777_216) -> bytes:
    """Full-frame render -> PNG bytes (greyscale density, white
    background, darker = more features; y axis points up like `plot`).
    Only the aggregated pixel grid reaches the driver."""
    from .codecs import encode_png

    if width * height > max_pixels:
        raise ValueError(
            f"{width}x{height} exceeds max_pixels={max_pixels:,}; render "
            "tiles (to_tiles + rasterize) instead of one frame")
    rows = render_counts(df, width, height, geom, bbox).collect()
    grid = np.zeros(width * height, dtype=np.int64)
    for r in rows:
        grid[int(r["pixel"])] = int(r["n"])
    img = grid.reshape(height, width)[::-1]  # row 0 = top of frame
    peak = img.max()
    if peak == 0:
        return encode_png(np.full((height, width), 255, dtype=np.uint8))
    # perceptual-ish sqrt ramp, white (empty) -> black (dense)
    shade = 255 - np.sqrt(img / peak) * 255.0
    return encode_png(shade.clip(0, 255).astype(np.uint8))
