"""Hilbert space-filling-curve key, vectorized.

Same algorithm as the reference's ``hilbert_distance``
(/root/reference/geopandas/tools/hilbert_curve.py:4-108): discretize bbox
midpoints to a (2^level, 2^level) grid over given total_bounds, then map
(x, y) -> distance along the Hilbert curve (`_xy2d`, hilbert_curve.py:98).
The level loop runs ``level`` times; each iteration is vectorized numpy
over all rows. Used for spatial clustering: ``repartitionByRange(key)``
before writes mirrors the reference's spatial-sort use case.
"""

from __future__ import annotations

import numpy as np


def discretize_midpoints(bounds: np.ndarray, total_bounds, level: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """bounds (n,4) -> integer grid coords of bbox midpoints
    (hilbert_curve.py:40-93)."""
    xmin, ymin, xmax, ymax = total_bounds
    n = (1 << level) - 1
    mx = (bounds[:, 0] + bounds[:, 2]) / 2.0
    my = (bounds[:, 1] + bounds[:, 3]) / 2.0
    with np.errstate(invalid="ignore"):
        fx = (mx - xmin) / max(xmax - xmin, 1e-300)
        fy = (my - ymin) / max(ymax - ymin, 1e-300)
    x = np.clip((fx * n).astype(np.int64), 0, n)
    y = np.clip((fy * n).astype(np.int64), 0, n)
    return x, y


def xy2d(x: np.ndarray, y: np.ndarray, level: int = 16) -> np.ndarray:
    """Vectorized Hilbert distance (hilbert_curve.py:98-108)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1 << (level - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= 1
    return d


def hilbert_distance(bounds: np.ndarray, total_bounds, level: int = 16) -> np.ndarray:
    """Per-row Hilbert key of bbox midpoints (base.py:5624). NaN bounds
    (missing geoms) raise, as the reference does."""
    if np.isnan(bounds).any():
        raise ValueError(
            "hilbert_distance cannot be computed on missing/empty geometries"
        )
    x, y = discretize_midpoints(bounds, total_bounds, level)
    return xy2d(x, y, level)
