"""Batched polygon intersection (Greiner–Hormann) for the overlay hot path.

The Martinez–Rueda sweep (boolean.py) is robust but runs per pair with a
Python event heap — profiling shows >80% of general-polygon overlay time
in heap/event management. For the dominant case (two single-ring no-hole
polygons), this module computes intersections with:

* phase 1 — ALL edge-pair crossings of ALL pairs in one vectorized numpy
  pass (segments concatenated with pair ids; index arithmetic builds the
  per-pair cross-product blocks, VERDICT round-1 item #3);
* phase 2 — per pair, a short Greiner–Hormann trace over the precomputed
  crossing lists (no heap, no intersection discovery).

Degenerate configurations (touching vertices, collinear edges — anything
where a crossing parameter lands on an endpoint) are DETECTED in phase 1
and those pairs are flagged for the exact sweep fallback; random data
essentially never hits them, hand-made fixtures do.

Intersection of two Jordan domains is a disjoint set of Jordan domains,
so the result is a list of hole-free rings per pair.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _ring_segs(ring: np.ndarray):
    """Drop the closing vertex; return open vertex array (n,2)."""
    if len(ring) and (ring[0] == ring[-1]).all():
        return ring[:-1]
    return ring


def _shift1(v: np.ndarray) -> np.ndarray:
    """np.roll(v, -1, axis=0) without roll's axis-normalization overhead
    (this is the profile hot spot at batch sizes)."""
    out = np.empty_like(v)
    out[:-1] = v[1:]
    out[-1] = v[0]
    return out


def _ensure_ccw(v: np.ndarray) -> np.ndarray:
    x, y = v[:, 0], v[:, 1]
    yn = _shift1(y)
    xn = _shift1(x)
    area2 = np.sum(x * yn - xn * y)
    return v if area2 >= 0 else v[::-1]


def _point_in_ring(pt, v) -> bool:
    """Even-odd, open-vertex ring; boundary treated as inside-ish (callers
    avoid boundary cases via degeneracy detection)."""
    x, y = pt
    x0, y0 = v[:, 0], v[:, 1]
    x1, y1 = _shift1(x0), _shift1(y0)
    cross = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
    return int(np.count_nonzero(cross & (xs > x))) % 2 == 1


def batch_intersection(subjects: list, clips: list):
    """subjects/clips: equal-length lists of closed rings (or None).

    -> (results, fallback_mask): results[i] is a list of result rings
    (possibly empty) or None when fallback_mask[i] is True (degenerate —
    caller must use the exact sweep).
    """
    n = len(subjects)
    results: list = [None] * n
    fallback = np.zeros(n, dtype=bool)

    sv = [None] * n
    cv = [None] * n
    na = np.zeros(n, dtype=np.int64)
    nb = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if subjects[i] is None or clips[i] is None:
            fallback[i] = True
            continue
        a = _ensure_ccw(_ring_segs(np.asarray(subjects[i], dtype=np.float64)))
        b = _ensure_ccw(_ring_segs(np.asarray(clips[i], dtype=np.float64)))
        if len(a) < 3 or len(b) < 3:
            results[i] = []
            continue
        sv[i], cv[i] = a, b
        na[i], nb[i] = len(a), len(b)

    live = np.nonzero((na > 0) & (nb > 0))[0]
    if not len(live):
        return results, fallback

    # ---- phase 1: vectorized all-crossings over the whole batch ----------
    a_off = np.zeros(n + 1, dtype=np.int64)
    b_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(na, out=a_off[1:])
    np.cumsum(nb, out=b_off[1:])
    A = np.vstack([sv[i] for i in live])
    B = np.vstack([cv[i] for i in live])
    # next-vertex arrays: single shifted copy with per-ring wrap fix
    al = np.zeros(len(live) + 1, dtype=np.int64)
    bl = np.zeros(len(live) + 1, dtype=np.int64)
    np.cumsum(na[live], out=al[1:])
    np.cumsum(nb[live], out=bl[1:])
    An = np.empty_like(A)
    An[:-1] = A[1:]
    An[al[1:] - 1] = A[al[:-1]]
    Bn = np.empty_like(B)
    Bn[:-1] = B[1:]
    Bn[bl[1:] - 1] = B[bl[:-1]]

    tot = na[live] * nb[live]
    blk_off = np.zeros(len(live) + 1, dtype=np.int64)
    np.cumsum(tot, out=blk_off[1:])
    N = int(blk_off[-1])
    pid_local = np.repeat(np.arange(len(live)), tot)
    local = np.arange(N, dtype=np.int64) - blk_off[pid_local]
    ai = a_off[live][pid_local] + local // nb[live][pid_local]
    bi = b_off[live][pid_local] + local % nb[live][pid_local]

    p0 = A[ai]
    d1 = An[ai] - p0
    q0 = B[bi]
    d2 = Bn[bi] - q0
    w = q0 - p0
    denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    l1 = np.maximum(np.hypot(d1[:, 0], d1[:, 1]), _EPS)
    l2 = np.maximum(np.hypot(d2[:, 0], d2[:, 1]), _EPS)
    scale = l1 * l2
    nonpar = np.abs(denom) > _EPS * scale
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(nonpar,
                     (w[:, 0] * d2[:, 1] - w[:, 1] * d2[:, 0]) / denom, -1.0)
        s = np.where(nonpar,
                     (w[:, 0] * d1[:, 1] - w[:, 1] * d1[:, 0]) / denom, -1.0)
    tol_t = _EPS * 1e3 / l1  # endpoint guard in parameter units
    tol_s = _EPS * 1e3 / l2
    inside_t = (t > tol_t) & (t < 1 - tol_t)
    inside_s = (s > tol_s) & (s < 1 - tol_s)
    touching = ((t > -tol_t) & (t < 1 + tol_t) & (s > -tol_s) & (s < 1 + tol_s)
                & ~(inside_t & inside_s) & nonpar)
    # parallel + collinear overlapping edges are degenerate too
    par = ~nonpar
    wx = d1[:, 0] * w[:, 1] - d1[:, 1] * w[:, 0]
    collinear = par & (np.abs(wx) <= _EPS * 1e3 * np.maximum(l1 * l1, 1.0))
    if collinear.any():
        # overlap only if projections intersect
        u = d1 / l1[:, None]
        tb0 = ((q0 - p0) * u).sum(axis=1)
        tb1 = ((Bn[bi] - p0) * u).sum(axis=1)
        lo = np.minimum(tb0, tb1)
        hi = np.maximum(tb0, tb1)
        overlap = collinear & (hi > -_EPS) & (lo < l1 + _EPS)
        touching = touching | overlap
    bad_pairs = np.unique(pid_local[touching])
    for lp in bad_pairs:
        fallback[live[lp]] = True

    proper = inside_t & inside_s & ~fallback[live[pid_local]]
    # group crossings per pair
    cross_by_pair: dict = {}
    for k in np.nonzero(proper)[0]:
        lp = int(pid_local[k])
        cross_by_pair.setdefault(lp, []).append(
            (int(ai[k] - a_off[live[lp]]), float(t[k]),
             int(bi[k] - b_off[live[lp]]), float(s[k])))

    # ---- phase 2: per-pair trace ------------------------------------------
    for lp, gi in enumerate(live):
        if fallback[gi]:
            continue
        a = sv[gi]
        b = cv[gi]
        crossings = cross_by_pair.get(lp, [])
        if not crossings:
            # containment or disjoint
            if _point_in_ring(a[0], b):
                results[gi] = [np.vstack([a, a[:1]])]
            elif _point_in_ring(b[0], a):
                results[gi] = [np.vstack([b, b[:1]])]
            else:
                results[gi] = []
            continue
        if len(crossings) % 2:
            fallback[gi] = True  # numeric inconsistency -> exact path
            continue
        results[gi] = _trace(a, b, crossings)
        if results[gi] is None:
            fallback[gi] = True
    return results, fallback


def _trace(a: np.ndarray, b: np.ndarray, crossings: list):
    """Greiner–Hormann intersection trace. Returns list of closed rings,
    or None if the trace detects an inconsistency."""
    na, nb = len(a), len(b)
    # vertex chains: list of [point, is_inter, mate_index]
    # build per-edge sorted insertion lists
    a_ins: list = [[] for _ in range(na)]
    b_ins: list = [[] for _ in range(nb)]
    pts = []
    for ci, (ia, t, ib, s) in enumerate(crossings):
        p = a[ia] + t * (a[(ia + 1) % na] - a[ia])
        pts.append(p)
        a_ins[ia].append((t, ci))
        b_ins[ib].append((s, ci))
    for lst in a_ins:
        lst.sort()
    for lst in b_ins:
        lst.sort()

    # chains: sequences of (kind, idx): kind 0 = original vertex,
    # 1 = crossing ci
    a_chain, b_chain = [], []
    a_pos: dict = {}
    b_pos: dict = {}
    for i in range(na):
        a_chain.append((0, i))
        for _, ci in a_ins[i]:
            a_pos[ci] = len(a_chain)
            a_chain.append((1, ci))
    for i in range(nb):
        b_chain.append((0, i))
        for _, ci in b_ins[i]:
            b_pos[ci] = len(b_chain)
            b_chain.append((1, ci))
    La, Lb = len(a_chain), len(b_chain)

    # entry/exit marking along a: alternate starting from inside-status
    inside = _point_in_ring(a[0], b)
    entry_a: dict = {}
    for kind, idx in a_chain:
        if kind == 1:
            entry_a[idx] = not inside  # entering if currently outside
            inside = not inside
    rings = []
    visited = set()
    for ci0 in entry_a:
        if not entry_a[ci0] or ci0 in visited:
            continue
        ring = []
        on_a = True
        pos = a_pos[ci0]
        ci = ci0
        guard = 4 * (La + Lb)
        while True:
            visited.add(ci)
            ring.append(pts[ci])
            if on_a:
                # entering -> walk a forward to next crossing
                p = pos
                while True:
                    p = (p + 1) % La
                    kind, idx = a_chain[p]
                    if kind == 1:
                        ci = idx
                        pos = b_pos[ci]
                        on_a = False
                        break
                    ring.append(a[idx])
                    guard -= 1
                    if guard <= 0:
                        return None
            else:
                # on b: if this crossing is an exit for a (entry_a False),
                # a's interior continues along b forward CCW; trace b
                # forward to the next crossing
                p = pos
                while True:
                    p = (p + 1) % Lb
                    kind, idx = b_chain[p]
                    if kind == 1:
                        ci = idx
                        pos = a_pos[ci]
                        on_a = True
                        break
                    ring.append(b[idx])
                    guard -= 1
                    if guard <= 0:
                        return None
            guard -= 1
            if guard <= 0:
                return None
            if ci == ci0:
                break
        if len(ring) >= 3:
            r = np.array(ring)
            rings.append(np.vstack([r, r[:1]]))
    return rings
