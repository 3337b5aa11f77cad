"""sjoin_nearest vs brute-force kNN oracle (tie semantics per
tools/sjoin.py:428-439: all equidistant neighbors returned)."""

import numpy as np
import pandas as pd
import pytest

from geopandas_spark.geom import wkb as B
from geopandas_spark.geom.ragged import points_batch
from geopandas_spark.operators.nearest import sjoin_nearest

NL, NR = 300, 50


@pytest.fixture(scope="module")
def data(spark):
    r = np.random.default_rng(7)
    lx, ly = r.random(NL), r.random(NL)
    rx, ry = r.random(NR), r.random(NR)
    ldf = spark.createDataFrame(pd.DataFrame(
        {"pid": np.arange(NL), "geometry": list(B.to_wkb(points_batch(lx, ly)))}))
    rdf = spark.createDataFrame(pd.DataFrame(
        {"tid": np.arange(NR), "geometry": list(B.to_wkb(points_batch(rx, ry)))}))
    d = np.sqrt((lx[:, None] - rx[None, :]) ** 2 + (ly[:, None] - ry[None, :]) ** 2)
    return ldf, rdf, d


def test_nearest_exact(data, spark):
    ldf, rdf, d = data
    dmin = d.min(axis=1)
    exp = {(i, j) for i in range(NL) for j in np.nonzero(d[i] == dmin[i])[0]}
    out = sjoin_nearest(ldf, rdf, distance_col="dist",
                        left_id="pid", right_id="tid").toPandas()
    got = set(zip(out.pid.astype(int), out.index_right.astype(int)))
    assert got == exp
    m = out.set_index("pid").dist.to_dict()
    assert all(m[i] == dmin[i] for i in range(NL))


def test_nearest_ties(spark):
    # two right points exactly equidistant from the left point
    ldf = spark.createDataFrame(pd.DataFrame(
        {"pid": [0], "geometry": list(B.to_wkb(points_batch(
            np.array([0.5]), np.array([0.5]))))}))
    rdf = spark.createDataFrame(pd.DataFrame(
        {"tid": [0, 1, 2], "geometry": list(B.to_wkb(points_batch(
            np.array([0.4, 0.6, 0.9]), np.array([0.5, 0.5, 0.9]))))}))
    out = sjoin_nearest(ldf, rdf, left_id="pid", right_id="tid").toPandas()
    assert set(out.index_right.astype(int)) == {0, 1}  # both ties kept


def test_nearest_max_distance(data, spark):
    ldf, rdf, d = data
    dmin = d.min(axis=1)
    exp = {(i, j) for i in range(NL) if dmin[i] <= 0.05
           for j in np.nonzero(d[i] == dmin[i])[0]}
    out = sjoin_nearest(ldf, rdf, max_distance=0.05,
                        left_id="pid", right_id="tid").toPandas()
    got = set(zip(out.pid.astype(int), out.index_right.astype(int)))
    assert got == exp
    # how='left' pads the unmatched
    outl = sjoin_nearest(ldf, rdf, how="left", max_distance=0.05,
                         left_id="pid", right_id="tid").toPandas()
    assert len(outl) == len(exp) + NL - len({i for i, _ in exp})


def test_nearest_exclusive_self(spark):
    pts = points_batch(np.array([0.1, 0.5, 0.9]), np.array([0.1, 0.5, 0.9]))
    wkb = list(B.to_wkb(pts))
    df = spark.createDataFrame(pd.DataFrame({"pid": [0, 1, 2], "geometry": wkb}))
    df2 = spark.createDataFrame(pd.DataFrame({"tid": [0, 1, 2], "geometry": wkb}))
    out = sjoin_nearest(df, df2, exclusive=True,
                        left_id="pid", right_id="tid").toPandas()
    assert (out.pid != out.index_right).all()
    out2 = sjoin_nearest(df, df2, exclusive=False,
                         left_id="pid", right_id="tid").toPandas()
    assert (out2.pid == out2.index_right).all()


def test_nearest_lines_empty_corner_cells(spark):
    """ADVICE scenario: right-side diagonal lines cover bbox-corner cells
    that contain no geometry; the tail's distance bound must stay a valid
    upper bound (d* re-probe). Brute-force point-to-segment oracle."""
    from geopandas_spark.geom import wkt as W

    r = np.random.default_rng(11)
    nl, nr = 200, 30
    lx, ly = r.random(nl), r.random(nl)
    # long diagonals: bbox is large, geometry only on the diagonal
    x0, y0 = r.random(nr), r.random(nr)
    dx, dy = r.random(nr) * 0.4 + 0.1, r.random(nr) * 0.4 + 0.1
    wkts = [f"LINESTRING ({a} {b}, {min(a + c, 1.0)} {min(b + d, 1.0)})"
            for a, b, c, d in zip(x0, y0, dx, dy)]
    ldf = spark.createDataFrame(pd.DataFrame(
        {"pid": np.arange(nl),
         "geometry": list(B.to_wkb(points_batch(lx, ly)))}))
    rdf = spark.createDataFrame(pd.DataFrame(
        {"tid": np.arange(nr), "geometry": list(B.to_wkb(W.from_wkt(wkts)))}))

    # brute force point->segment distances
    ax, ay = x0, y0
    bx, by = np.minimum(x0 + dx, 1.0), np.minimum(y0 + dy, 1.0)
    vx, vy = bx - ax, by - ay
    L2 = vx * vx + vy * vy
    t = ((lx[:, None] - ax[None, :]) * vx[None, :]
         + (ly[:, None] - ay[None, :]) * vy[None, :]) / L2[None, :]
    t = np.clip(t, 0.0, 1.0)
    cx = ax[None, :] + t * vx[None, :]
    cy = ay[None, :] + t * vy[None, :]
    d = np.sqrt((lx[:, None] - cx) ** 2 + (ly[:, None] - cy) ** 2)
    dmin = d.min(axis=1)
    exp = {(i, j) for i in range(nl) for j in np.nonzero(d[i] == dmin[i])[0]}

    out = sjoin_nearest(ldf, rdf, distance_col="dist",
                        left_id="pid", right_id="tid").toPandas()
    got = set(zip(out.pid.astype(int), out.index_right.astype(int)))
    assert got == exp
    m = out.set_index("pid").dist.to_dict()
    assert all(abs(m[i] - dmin[i]) < 1e-12 for i in range(nl))
