"""Vectorized geometry kernels over GeometryBatch (numpy, no GEOS).

Each kernel mirrors a reference operator (file:line cited per function,
paths under /root/reference/geopandas/). Scalar-per-geometry kernels use
``np.*.reduceat`` over the ragged offsets — one numpy pass per batch.
Pairwise kernels (predicates, distance) vectorize over the longer operand.
"""

from __future__ import annotations

import numpy as np

from .ragged import (
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    TYPE_DIM,
    GeometryBatch,
)

# ---------------------------------------------------------------------------
# reduceat helpers


def _reduceat_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum of values[offsets[i]:offsets[i+1]] per segment; empty -> 0."""
    n = len(offsets) - 1
    if len(values) == 0:
        return np.zeros(n, dtype=np.float64)
    out = np.zeros(n, dtype=np.float64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if nonempty.any():
        res = np.add.reduceat(values, starts[nonempty])
        out[nonempty] = res
    return out


def _per_ring_pair_terms(batch: GeometryBatch, fn) -> np.ndarray:
    """Apply fn(x0,y0,x1,y1) to consecutive coord pairs, zeroing terms that
    cross a ring boundary; returns array of length T-1 (or empty)."""
    c = batch.coords
    T = len(c)
    if T < 2:
        return np.zeros(0, dtype=np.float64)
    terms = fn(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1])
    ends = batch.ring_coord_off[1:-1]  # boundaries between rings
    valid_ends = ends[(ends > 0) & (ends < T)]
    terms[valid_ends - 1] = 0.0
    return terms


def _ring_sums(batch: GeometryBatch, terms: np.ndarray) -> np.ndarray:
    """Per-ring sums of pair terms (terms has length T-1)."""
    R = len(batch.ring_coord_off) - 1
    if R == 0:
        return np.zeros(0, dtype=np.float64)
    starts = np.minimum(batch.ring_coord_off[:-1], max(len(terms) - 1, 0))
    if len(terms) == 0:
        return np.zeros(R, dtype=np.float64)
    sums = np.add.reduceat(terms, starts)
    # rings of length < 2 contribute spurious single terms — zero them
    ring_len = batch.ring_coord_off[1:] - batch.ring_coord_off[:-1]
    sums[ring_len < 2] = 0.0
    # a ring whose start == len(terms)-1 region collapses; reduceat with
    # duplicate/descending indices yields element values — the mask above
    # plus boundary zeroing keeps results correct for closed rings
    return sums


# ---------------------------------------------------------------------------
# scalar measures


def signed_ring_areas(batch: GeometryBatch) -> np.ndarray:
    """Signed shoelace area per ring (0 for non-polygon rings too — caller
    masks by part type)."""
    terms = _per_ring_pair_terms(
        batch, lambda x0, y0, x1, y1: x0 * y1 - x1 * y0
    )
    return 0.5 * _ring_sums(batch, terms)


def area(batch: GeometryBatch) -> np.ndarray:
    """Per-geometry area (reference: base.py:39; Point/Line -> 0,
    missing -> nan). Holes subtract: |exterior| - sum|holes| per part."""
    ring_a = np.abs(signed_ring_areas(batch))
    # first ring of each polygon part is the exterior
    P = batch.n_parts
    geom_area = np.zeros(len(batch), dtype=np.float64)
    if P:
        pr = batch.part_ring_off
        is_first = np.zeros(len(ring_a), dtype=bool)
        has_ring = pr[1:] > pr[:-1]
        is_first[pr[:-1][has_ring]] = True
        sign = np.where(is_first, 1.0, -1.0)
        poly_part = batch.part_types == POLYGON
        part_area = _reduceat_sum(ring_a * sign, pr)
        part_area[~poly_part] = 0.0
        geom_area = _reduceat_sum(part_area, batch.geom_part_off)
    geom_area[batch.types == MISSING] = np.nan
    return geom_area


def length(batch: GeometryBatch) -> np.ndarray:
    """Per-geometry length (base.py:153): lines -> length, polygons ->
    perimeter (all rings), points -> 0, missing -> nan."""
    terms = _per_ring_pair_terms(
        batch,
        lambda x0, y0, x1, y1: np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2),
    )
    ring_len = _ring_sums(batch, terms)
    part_len = _reduceat_sum(ring_len, batch.part_ring_off)
    part_len[batch.part_types == POINT] = 0.0
    out = _reduceat_sum(part_len, batch.geom_part_off)
    out[batch.types == MISSING] = np.nan
    return out


def bounds(batch: GeometryBatch) -> np.ndarray:
    """(n,4) minx,miny,maxx,maxy per geometry (base.py:4672); empty/missing
    rows -> nan (matches geopandas bounds of empty)."""
    n = len(batch)
    out = np.full((n, 4), np.nan)
    off = batch.geom_coord_off
    nonempty = off[1:] > off[:-1]
    if nonempty.any() and len(batch.coords):
        starts = off[:-1][nonempty]
        out[nonempty, 0] = np.minimum.reduceat(batch.coords[:, 0], starts)
        out[nonempty, 1] = np.minimum.reduceat(batch.coords[:, 1], starts)
        out[nonempty, 2] = np.maximum.reduceat(batch.coords[:, 0], starts)
        out[nonempty, 3] = np.maximum.reduceat(batch.coords[:, 1], starts)
        # reduceat spans from starts[i] to starts[i+1]; when geometries are
        # separated by empty ones the spans are still correct because starts
        # are the true coord offsets of nonempty geoms and coords between
        # consecutive nonempty geoms belong to exactly the earlier one.
    return out


def centroid(batch: GeometryBatch) -> np.ndarray:
    """(n,2) centroid per geometry (base.py:764). GEOS semantics: use the
    highest-dimension components (polygon area-weighted; else line
    length-weighted; else point mean). Empty/missing -> nan.

    Hole handling does not rely on WKB ring orientation: each ring's terms
    are flipped to positive-area frame, then exterior rings (first of each
    part) add and interior rings subtract.
    """
    n = len(batch)
    out = np.full((n, 2), np.nan)
    if len(batch.coords) == 0:
        return out
    pr = batch.part_ring_off
    gp = batch.geom_part_off
    P = batch.n_parts
    R = len(batch.ring_coord_off) - 1
    dims = TYPE_DIM[batch.types]
    use_poly = np.zeros(n, dtype=bool)
    if P and R:
        cx_terms = _per_ring_pair_terms(
            batch, lambda x0, y0, x1, y1: (x0 + x1) * (x0 * y1 - x1 * y0)
        )
        cy_terms = _per_ring_pair_terms(
            batch, lambda x0, y0, x1, y1: (y0 + y1) * (x0 * y1 - x1 * y0)
        )
        ring_sa = signed_ring_areas(batch)
        ring_cx = _ring_sums(batch, cx_terms) / 6.0
        ring_cy = _ring_sums(batch, cy_terms) / 6.0
        flip = np.where(ring_sa < 0, -1.0, 1.0)  # -> positive-area frame
        is_first = np.zeros(R, dtype=bool)
        has_ring = pr[1:] > pr[:-1]
        is_first[pr[:-1][has_ring]] = True
        ring_sign = np.where(is_first, 1.0, -1.0)  # exterior +, holes -
        w = flip * ring_sign
        part_sa = _reduceat_sum(ring_sa * w, pr)
        part_cx = _reduceat_sum(ring_cx * w, pr)
        part_cy = _reduceat_sum(ring_cy * w, pr)
        poly_mask = batch.part_types == POLYGON
        g_sa = _reduceat_sum(np.where(poly_mask, part_sa, 0.0), gp)
        g_cx = _reduceat_sum(np.where(poly_mask, part_cx, 0.0), gp)
        g_cy = _reduceat_sum(np.where(poly_mask, part_cy, 0.0), gp)
        use_poly = (g_sa != 0) & (dims == 2)
        out[use_poly, 0] = g_cx[use_poly] / g_sa[use_poly]
        out[use_poly, 1] = g_cy[use_poly] / g_sa[use_poly]
    # --- lineal: length-weighted segment midpoints ---
    need_line = ~use_poly & (dims >= 1) & (batch.types != MISSING)
    if need_line.any():
        seg_len = _per_ring_pair_terms(
            batch, lambda x0, y0, x1, y1: np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        )
        swx = _ring_sums(batch, _per_ring_pair_terms(
            batch, lambda x0, y0, x1, y1: (x0 + x1) / 2
            * np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)))
        swy = _ring_sums(batch, _per_ring_pair_terms(
            batch, lambda x0, y0, x1, y1: (y0 + y1) / 2
            * np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)))
        ring_L = _ring_sums(batch, seg_len)
        g_L = _reduceat_sum(_reduceat_sum(ring_L, pr), gp)
        g_wx = _reduceat_sum(_reduceat_sum(swx, pr), gp)
        g_wy = _reduceat_sum(_reduceat_sum(swy, pr), gp)
        m = need_line & (g_L > 0)
        out[m, 0] = g_wx[m] / g_L[m]
        out[m, 1] = g_wy[m] / g_L[m]
    # --- puntal (or degenerate): mean of coordinates ---
    need_pt = (batch.types != MISSING) & np.isnan(out[:, 0])
    if need_pt.any():
        off = batch.geom_coord_off
        cnt = (off[1:] - off[:-1]).astype(np.float64)
        ok = need_pt & (cnt > 0)
        if ok.any():
            sx = _reduceat_sum(batch.coords[:, 0], off)
            sy = _reduceat_sum(batch.coords[:, 1], off)
            out[ok, 0] = sx[ok] / cnt[ok]
            out[ok, 1] = sy[ok] / cnt[ok]
    return out


def get_x(batch: GeometryBatch) -> np.ndarray:
    """Point x (geoseries.py:171); nan for missing/empty; raises if a
    non-point is present (matching GeoSeries.x ValueError)."""
    present = batch.types != MISSING
    if not (batch.types[present] == POINT).all():
        raise ValueError("x attribute access only provided for Point geometries")
    n = len(batch)
    out = np.full(n, np.nan)
    off = batch.geom_coord_off
    has = off[1:] > off[:-1]
    out[has] = batch.coords[off[:-1][has], 0]
    return out


def get_y(batch: GeometryBatch) -> np.ndarray:
    present = batch.types != MISSING
    if not (batch.types[present] == POINT).all():
        raise ValueError("y attribute access only provided for Point geometries")
    n = len(batch)
    out = np.full(n, np.nan)
    off = batch.geom_coord_off
    has = off[1:] > off[:-1]
    out[has] = batch.coords[off[:-1][has], 1]
    return out


def count_coordinates(batch: GeometryBatch) -> np.ndarray:
    """base.py:321 — number of coordinates per geometry (0 for None)."""
    return batch.n_coords_per_geom().astype(np.int64)


def count_geometries(batch: GeometryBatch) -> np.ndarray:
    """base.py:364 — number of parts (1 for simple, 0 for None)."""
    n_parts = batch.n_parts_per_geom().astype(np.int64)
    simple = np.isin(batch.types, (POINT, LINESTRING, POLYGON))
    out = np.where(simple, np.minimum(n_parts, 1), n_parts)
    # empty simple geometries still count 1 in GEOS? shapely counts 1 for
    # POINT EMPTY; keep parts>=1 convention for present simple geoms
    out = np.where(simple & (batch.types != MISSING), 1, out)
    out[batch.types == MISSING] = 0
    return out


def count_interior_rings(batch: GeometryBatch) -> np.ndarray:
    """base.py:408 — interior rings of the first polygon part."""
    n = len(batch)
    out = np.zeros(n, dtype=np.int64)
    gp = batch.geom_part_off
    pr = batch.part_ring_off
    for g in np.nonzero(np.isin(batch.types, (POLYGON, MULTIPOLYGON)))[0]:
        p0 = gp[g]
        if p0 < gp[g + 1]:
            out[g] = max(int(pr[p0 + 1] - pr[p0]) - 1, 0)
    return out


# ---------------------------------------------------------------------------
# point-in-polygon (the refine kernel of the flagship sjoin)

OUTSIDE, BOUNDARY, INSIDE = 0, 1, 2


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray,
                   eps: float = 0.0) -> np.ndarray:
    """Crossing-number + boundary test of many points vs one closed ring.

    Vectorized over points × edges ((k, E) temporaries — callers chunk
    points). Returns int8 {OUTSIDE, BOUNDARY, INSIDE}. Analogue of the
    prepared-geometry covers/contains refine the reference does per
    candidate pair (sindex.py:86-87).
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    # boundary: point on segment. ``eps`` is a true DISTANCE band: the
    # cross product encodes perpendicular-distance * seg_len, so the
    # tolerance scales with seg_len — the old max(seg_len, 1) floor
    # inflated the band to eps/seg_len for sub-unit segments, swallowing
    # features smaller than ~eps (ADVICE r4 band finding).
    dx, dy = x1 - x0, y1 - y0
    cross = (px - x0) * dy - (py - y0) * dx
    dot = (px - x0) * dx + (py - y0) * dy
    seg_len2 = dx * dx + dy * dy
    # hot path (sjoin refine) runs eps=0: skip the per-edge sqrt there
    tol = eps * np.sqrt(seg_len2) if eps != 0.0 else 0.0
    on_seg = (np.abs(cross) <= tol) & (dot >= -tol) & (dot <= seg_len2 + tol)
    zl = seg_len2 == 0
    if zl.any():
        # zero-length edge: contains only its own point (the generic
        # form degenerates to 0<=0 and reads True everywhere)
        on_seg[:, zl] = ((px - x0[zl]) ** 2 + (py - y0[zl]) ** 2) <= eps * eps
    is_boundary = on_seg.any(axis=1)
    # crossing number (half-open rule avoids double-count at vertices)
    cond = (y0 <= py) != (y1 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * dx / np.where(dy == 0, np.inf, dy)
    crossings = (cond & (px < xint)).sum(axis=1)
    inside = (crossings % 2) == 1
    out = np.where(is_boundary, BOUNDARY, np.where(inside, INSIDE, OUTSIDE))
    return out.astype(np.int8)


def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      rings: list[np.ndarray], eps: float = 0.0) -> np.ndarray:
    """Many points vs one polygon-with-holes. int8 {OUT,BOUNDARY,IN}."""
    if not rings or len(rings[0]) == 0:
        return np.zeros(len(px), dtype=np.int8)
    res = points_in_ring(px, py, rings[0], eps)
    for hole in rings[1:]:
        if len(hole) == 0:
            continue
        h = points_in_ring(px, py, hole, eps)
        res = np.where(h == INSIDE, OUTSIDE, np.where((h == BOUNDARY) & (res != OUTSIDE), BOUNDARY, res))
    return res.astype(np.int8)


def points_in_geom(px, py, batch: GeometryBatch, g: int, eps: float = 0.0) -> np.ndarray:
    """Many points vs geometry g of batch (any polygonal type)."""
    gp0, gp1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
    res = np.zeros(len(px), dtype=np.int8)
    for p in range(gp0, gp1):
        if batch.part_types[p] != POLYGON:
            continue
        r = points_in_polygon(px, py, batch.part_rings(p), eps)
        res = np.maximum(res, r)
    return res


# ---------------------------------------------------------------------------
# segment intersection & distances


def segments_cross(a0, a1, b0, b1, eps: float = 1e-12):
    """Proper-or-touching intersection test between segment sets.

    a0,a1: (A,2); b0,b1: (B,2) -> bool (A,B)."""
    a0 = a0[:, None, :]
    a1 = a1[:, None, :]
    b0 = b0[None, :, :]
    b1 = b1[None, :, :]
    d1 = a1 - a0
    d2 = b1 - b0
    diff = b0 - a0
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    s_num = diff[..., 0] * d2[..., 1] - diff[..., 1] * d2[..., 0]
    t_num = diff[..., 0] * d1[..., 1] - diff[..., 1] * d1[..., 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = s_num / denom
        t = t_num / denom
    proper = (np.abs(denom) > eps) & (s >= -eps) & (s <= 1 + eps) & (t >= -eps) & (t <= 1 + eps)
    # collinear overlap: denom==0 and diff x d1 == 0 and ranges overlap
    coll = (np.abs(denom) <= eps) & (np.abs(diff[..., 0] * d1[..., 1] - diff[..., 1] * d1[..., 0]) <= eps)
    if coll.any():
        # project onto dominant axis of a
        La = np.maximum(np.abs(d1[..., 0]), np.abs(d1[..., 1]))
        use_x = np.abs(d1[..., 0]) >= np.abs(d1[..., 1])
        alo = np.where(use_x, np.minimum(a0[..., 0], a1[..., 0]), np.minimum(a0[..., 1], a1[..., 1]))
        ahi = np.where(use_x, np.maximum(a0[..., 0], a1[..., 0]), np.maximum(a0[..., 1], a1[..., 1]))
        blo = np.where(use_x, np.minimum(b0[..., 0], b1[..., 0]), np.minimum(b0[..., 1], b1[..., 1]))
        bhi = np.where(use_x, np.maximum(b0[..., 0], b1[..., 0]), np.maximum(b0[..., 1], b1[..., 1]))
        overlap = (blo <= ahi + eps) & (alo <= bhi + eps)
        coll = coll & overlap & (La > 0)
    return proper | coll


def points_on_segments(px, py, s0, s1) -> np.ndarray:
    """(k,E) bool: point exactly ON segment. Uses the cross/dot form —
    the projected-distance test (``dist2 <= 0``) double-rounds (t =
    dot/L2 then the residual), so a point EXACTLY on a segment can read
    ~1e-35 off it; cross((s1-s0), (p-s0)) is a single product difference
    and evaluates to exactly 0 for on-line dyadic inputs. Zero-length
    segments contain only their own point."""
    dx = s1[:, 0] - s0[:, 0]
    dy = s1[:, 1] - s0[:, 1]
    wx = px[:, None] - s0[None, :, 0]
    wy = py[:, None] - s0[None, :, 1]
    cross = wx * dy - wy * dx
    dot = wx * dx + wy * dy
    seg2 = dx * dx + dy * dy
    return np.where(seg2 > 0,
                    (cross == 0) & (dot >= 0) & (dot <= seg2),
                    (wx == 0) & (wy == 0))


def point_segment_dist2(px, py, s0, s1):
    """Squared distance of points (k,) to segments (E,2 each) -> (k,E)."""
    dx = s1[:, 0] - s0[:, 0]
    dy = s1[:, 1] - s0[:, 1]
    L2 = dx * dx + dy * dy
    wx = px[:, None] - s0[None, :, 0]
    wy = py[:, None] - s0[None, :, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (wx * dx + wy * dy) / np.where(L2 == 0, 1.0, L2)
    t = np.clip(np.where(L2[None, :] == 0, 0.0, t), 0.0, 1.0)
    ex = wx - t * dx
    ey = wy - t * dy
    return ex * ex + ey * ey


def geom_segments(batch: GeometryBatch, g: int) -> tuple[np.ndarray, np.ndarray]:
    """All segments (s0, s1) of geometry g (lines + polygon rings)."""
    s0s, s1s = [], []
    for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
        if batch.part_types[p] == POINT:
            continue
        for ring in batch.part_rings(p):
            if len(ring) >= 2:
                s0s.append(ring[:-1])
                s1s.append(ring[1:])
    if not s0s:
        z = np.empty((0, 2))
        return z, z
    return np.concatenate(s0s), np.concatenate(s1s)


def geom_points(batch: GeometryBatch, g: int) -> np.ndarray:
    c0, c1 = batch.geom_coord_off[g], batch.geom_coord_off[g + 1]
    return batch.coords[c0:c1]
