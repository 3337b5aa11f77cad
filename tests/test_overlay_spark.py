"""overlay 5 modes vs the reference's documented expectations
(tools/overlay.py:124-165 docstring literals; tests/test_overlay.py goldens
are the same two offset 2x2 square grids)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopandas_spark.functions.st import st_area, st_astext
from geopandas_spark.geom import wkb as B
from geopandas_spark.geom import wkt as W
from geopandas_spark.operators.overlay import overlay
from geopandas_spark.testing import geom_set


@pytest.fixture(scope="module")
def frames(spark):
    df1 = spark.createDataFrame(pd.DataFrame({
        "col1": [1, 2],
        "geometry": list(B.to_wkb(W.from_wkt([
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"])))}))
    df2 = spark.createDataFrame(pd.DataFrame({
        "col2": [1, 2],
        "geometry": list(B.to_wkb(W.from_wkt([
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
            "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"])))}))
    return df1, df2


# expected rows/areas from tools/overlay.py:131-165
EXPECT = {
    "intersection": (3, 3.0),
    "union": (7, 13.0),
    "symmetric_difference": (4, 10.0),
    "difference": (2, 5.0),
    "identity": (5, 8.0),
}


@pytest.mark.parametrize("how", list(EXPECT))
def test_overlay_modes(frames, how, spark):
    df1, df2 = frames
    out = overlay(df1, df2, how=how).withColumn("a", st_area("geometry"))
    rows = out.collect()
    n, area = EXPECT[how]
    assert len(rows) == n
    assert np.isclose(sum(r["a"] for r in rows), area)
    if how == "difference":
        assert "col2" not in out.columns
    else:
        assert "col1" in out.columns and "col2" in out.columns


def test_overlay_intersection_exact_geometries(frames, spark):
    df1, df2 = frames
    out = overlay(df1, df2, how="intersection").collect()
    got = geom_set([r["geometry"] for r in out])
    exp = geom_set(B.to_wkb(W.from_wkt([
        "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
        "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))",
        "POLYGON ((3 3, 4 3, 4 4, 3 4, 3 3))",
    ])))
    assert got == exp
    pairs = {(r["col1"], r["col2"]) for r in out}
    assert pairs == {(1, 1), (2, 1), (2, 2)}


def test_overlay_union_attr_padding(frames, spark):
    df1, df2 = frames
    out = overlay(df1, df2, how="union").toPandas()
    assert out.col1.isna().sum() == 2  # df2 residuals
    assert out.col2.isna().sum() == 2  # df1 residuals


def test_overlay_candidates_matches_brute_force(spark):
    """overlay_candidates == the exact bbox-overlap pair set (brute
    force over all bboxes), including touching bboxes, mixed sizes that
    force min-res ancestor chains, and empty geometries (dropped)."""
    from geopandas_spark.operators.overlay import overlay_candidates

    rng = np.random.RandomState(7)
    def rect(x0, y0, w, h):
        return f"POLYGON (({x0} {y0}, {x0+w} {y0}, {x0+w} {y0+h}, {x0} {y0+h}, {x0} {y0}))"

    boxes1, boxes2 = [], []
    for i in range(40):
        x, y = rng.rand(2) * 0.8
        w = 0.01 + 0.5 * (i == 0)  # one huge bbox -> coarse cover row
        boxes1.append((x, y, w, 0.01 + 0.2 * (i == 1)))
    for j in range(40):
        x, y = rng.rand(2) * 0.8
        boxes2.append((x, y, 0.02, 0.02))
    # a guaranteed exactly-touching pair
    boxes1.append((0.9, 0.9, 0.05, 0.05))
    boxes2.append((0.95, 0.9, 0.05, 0.05))
    wkt1 = [rect(*b) for b in boxes1] + ["POLYGON EMPTY"]
    wkt2 = [rect(*b) for b in boxes2]
    df1 = spark.createDataFrame(pd.DataFrame({
        "i": range(len(wkt1)),
        "geometry": list(B.to_wkb(W.from_wkt(wkt1)))}))
    df2 = spark.createDataFrame(pd.DataFrame({
        "j": range(len(wkt2)),
        "geometry": list(B.to_wkb(W.from_wkt(wkt2)))}))
    got = {(r["i"], r["j"]) for r in
           overlay_candidates(df1, df2, id1="i", id2="j").collect()}
    want = set()
    for i, (x1, y1, w1, h1) in enumerate(boxes1):
        for j, (x2, y2, w2, h2) in enumerate(boxes2):
            if x1 <= x2 + w2 and x2 <= x1 + w1 and y1 <= y2 + h2 and y2 <= y1 + h1:
                want.add((i, j))
    assert got == want
    assert (len(boxes1) - 1, 40) in got  # the touching pair survived
    # envelope-intersection bounds are the pairwise max/min of the bboxes
    row = (overlay_candidates(df1, df2, id1="i", id2="j")
           .filter((F.col("i") == len(boxes1) - 1) & (F.col("j") == 40))
           .collect()[0])
    assert row["iminx"] == pytest.approx(0.95) and row["imaxx"] == pytest.approx(0.95)


def test_overlay_pair_on(spark):
    """pair_on restricts candidates to equal-key pairs, pushed into the
    cell join as an extra equi-join key; results equal the post-filtered
    unkeyed overlay."""
    from geopandas_spark.operators.overlay import overlay

    def rect(x, y, w, h):
        return (f"POLYGON (({x} {y}, {x+w} {y}, {x+w} {y+h}, "
                f"{x} {y+h}, {x} {y}))")

    # two overlapping groups of rects: every geometry overlaps every
    # other spatially, but keys split them into two disjoint pairs each
    wkt = [rect(0.1 * i, 0.0, 0.5, 0.5) for i in range(4)]
    df1 = spark.createDataFrame(pd.DataFrame({
        "i": range(4), "k": [0, 0, 1, 1],
        "geometry": list(B.to_wkb(W.from_wkt(wkt)))}))
    df2 = spark.createDataFrame(pd.DataFrame({
        "j": range(4), "k": [0, 1, 0, 1],
        "geometry": list(B.to_wkb(W.from_wkt(wkt)))}))
    keyed = overlay(df1, df2, how="intersection", id1="i", id2="j",
                    make_valid=False, pair_on="k")
    got = {(r["i"], r["j"]) for r in keyed.collect()}
    full = overlay(df1, df2, how="intersection", id1="i", id2="j",
                   make_valid=False)
    want = {(r["i"], r["j"]) for r in full.collect()
            if [0, 0, 1, 1][r["i"]] == [0, 1, 0, 1][r["j"]]}
    assert got == want and len(got) == 8  # 2 keys x (2x2) pairs
    with pytest.raises(ValueError, match="pair_on"):
        overlay(df1, df2.drop("k"), id1="i", id2="j", pair_on="k")
