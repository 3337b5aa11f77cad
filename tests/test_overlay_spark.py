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
