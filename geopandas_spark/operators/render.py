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


# ---------------------------------------------------------------------------
# column-colored render (choropleth) + plot/explore sinks
# ---------------------------------------------------------------------------

# viridis anchor colors (the CC0 colormap's endpoints + interior samples);
# linear interpolation between anchors approximates the full ramp closely
# enough for a density/choropleth render.
_VIRIDIS = np.array([
    (68, 1, 84), (71, 44, 122), (59, 81, 139), (44, 113, 142),
    (33, 144, 141), (39, 173, 129), (92, 200, 99), (170, 220, 50),
    (253, 231, 37)], dtype=np.float64)


def _colormap(vals: np.ndarray, cmap: str = "viridis") -> np.ndarray:
    """vals in [0,1] -> uint8 RGB via anchor interpolation."""
    if cmap == "greys":
        g = (255 - vals * 255.0).clip(0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if cmap != "viridis":
        raise ValueError(f"unknown cmap {cmap!r} (viridis|greys)")
    pos = vals.clip(0.0, 1.0) * (len(_VIRIDIS) - 1)
    i = np.floor(pos).astype(np.int64).clip(0, len(_VIRIDIS) - 2)
    t = (pos - i)[..., None]
    rgb = _VIRIDIS[i] * (1.0 - t) + _VIRIDIS[i + 1] * t
    return rgb.round().clip(0, 255).astype(np.uint8)


def render_values(df: DataFrame, column: str, width: int = 256,
                  height: int = 256, geom: str = "geometry", bbox=None,
                  aggfunc: str = "mean") -> DataFrame:
    """-> (pixel, v) per-pixel aggregate of ``column`` — the distributed
    half of a choropleth ``plot(column=...)`` (plotting.py:252's
    color-by-value semantics re-expressed as pixel aggregation: every
    pixel a feature covers carries the feature's value; overlapping
    features combine via ``aggfunc`` mean|sum|min|max)."""
    if bbox is None:
        from ..functions.st import st_bounds

        b = df.select(st_bounds(geom).alias("b")).agg(
            F.min("b.minx"), F.min("b.miny"),
            F.max("b.maxx"), F.max("b.maxy")).collect()[0]
        bbox = tuple(b)
    if aggfunc not in ("mean", "sum", "min", "max"):
        raise ValueError("aggfunc must be mean|sum|min|max")
    cover = _pixel_cover_udf(width, height, bbox)
    agg = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[aggfunc]
    return (df.select(F.col(column).cast("double").alias("v"),
                      F.explode(cover(F.col(geom))).alias("pixel"))
            .groupBy("pixel").agg(agg("v").alias("v")))


def plot(df: DataFrame, column: str | None = None, width: int = 512,
         height: int = 512, geom: str = "geometry", bbox=None,
         cmap: str = "viridis", aggfunc: str = "mean",
         path: str | None = None, max_pixels: int = 16_777_216):
    """``GeoDataFrame.plot`` (plotting.py:207) as a distributed render:
    matplotlib isn't in this environment and isn't how a 100 TB frame
    draws anyway — pixel covers are computed on the executors, ONLY the
    aggregated (pixel, value) grid reaches the driver, and the PNG is
    encoded by the in-repo codec. ``column=None`` renders feature
    density (darker = more features); ``column=`` renders the per-pixel
    ``aggfunc`` of that column through ``cmap``. Returns PNG bytes, or
    writes them when ``path`` is given.
    """
    from .codecs import encode_png

    if width * height > max_pixels:
        raise ValueError(
            f"{width}x{height} exceeds max_pixels={max_pixels:,}; render "
            "tiles (to_tiles + rasterize) instead of one frame")
    if column is None:
        png = render_png(df, width, height, geom, bbox, max_pixels)
    else:
        rows = render_values(df, column, width, height, geom, bbox,
                             aggfunc).collect()
        grid = np.full(width * height, np.nan)
        for r in rows:
            grid[int(r["pixel"])] = float(r["v"])
        img = grid.reshape(height, width)[::-1]
        ok = np.isfinite(img)
        rgb = np.full((height, width, 3), 255, dtype=np.uint8)
        if ok.any():
            lo, hi = np.nanmin(img), np.nanmax(img)
            span = (hi - lo) or 1.0
            rgb[ok] = _colormap((img[ok] - lo) / span, cmap)
        png = encode_png(rgb)
    if path is not None:
        with open(path, "wb") as f:
            f.write(png)
    return png


_EXPLORE_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title><style>
 body {{ margin: 0; font: 13px sans-serif; }}
 #wrap {{ position: relative; overflow: hidden; width: 100vw;
          height: 100vh; background: #fff; cursor: grab; }}
 #img {{ position: absolute; transform-origin: 0 0;
         image-rendering: pixelated; }}
 #pos {{ position: fixed; bottom: 6px; left: 8px; background: #fffc;
         padding: 2px 6px; border-radius: 3px; }}
 #leg {{ position: fixed; top: 6px; right: 8px; background: #fffc;
         padding: 4px 8px; border-radius: 3px; }}
</style></head><body>
<div id="wrap"><img id="img" src="data:image/png;base64,{b64}"></div>
<div id="pos"></div><div id="leg">{legend}</div>
<script>
 const B = {bbox}, W = {w}, H = {h};
 let s = 1, tx = 0, ty = 0, drag = null;
 const img = document.getElementById('img'),
       wrap = document.getElementById('wrap'),
       pos = document.getElementById('pos');
 function apply() {{
   img.style.transform = `translate(${{tx}}px,${{ty}}px) scale(${{s}})`;
 }}
 wrap.addEventListener('wheel', e => {{
   e.preventDefault();
   const k = e.deltaY < 0 ? 1.25 : 0.8;
   tx = e.clientX - k * (e.clientX - tx);
   ty = e.clientY - k * (e.clientY - ty);
   s *= k; apply();
 }});
 wrap.addEventListener('mousedown', e => drag = [e.clientX-tx, e.clientY-ty]);
 window.addEventListener('mouseup', () => drag = null);
 window.addEventListener('mousemove', e => {{
   if (drag) {{ tx = e.clientX-drag[0]; ty = e.clientY-drag[1]; apply(); }}
   const px = (e.clientX - tx) / s, py = (e.clientY - ty) / s;
   const x = B[0] + px / W * (B[2]-B[0]),
         y = B[3] - py / H * (B[3]-B[1]);
   pos.textContent = x.toFixed(6) + ', ' + y.toFixed(6);
 }});
 apply();
</script></body></html>
"""


def explore(df: DataFrame, path: str, column: str | None = None,
            width: int = 1024, height: int = 1024,
            geom: str = "geometry", bbox=None, cmap: str = "viridis",
            aggfunc: str = "mean", title: str = "explore") -> str:
    """``GeoDataFrame.explore`` (explore.py:15) as a self-contained HTML
    viewer: folium/leaflet tiles aren't available offline, so the map is
    the engine's own distributed render embedded base64 with wheel-zoom,
    drag-pan and a live coordinate readout in data (CRS) units. Writes
    ``path`` and returns it."""
    import base64

    if bbox is None:
        from ..functions.st import st_bounds

        b = df.select(st_bounds(geom).alias("b")).agg(
            F.min("b.minx"), F.min("b.miny"),
            F.max("b.maxx"), F.max("b.maxy")).collect()[0]
        bbox = tuple(float(v) for v in b)
    png = plot(df, column, width, height, geom, bbox, cmap, aggfunc)
    legend = (f"density ({width}x{height})" if column is None
              else f"{column} ({aggfunc}, {cmap})")
    html = _EXPLORE_HTML.format(
        title=title, b64=base64.b64encode(png).decode(),
        bbox=list(bbox), w=width, h=height, legend=legend)
    with open(path, "w") as f:
        f.write(html)
    return path
