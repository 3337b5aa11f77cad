"""register_sql_functions: the spark.sql string surface must agree with
the Column API function-for-function (same pandas-UDF factories)."""

import pandas as pd
import pytest

from geopandas_spark import register_sql_functions
from geopandas_spark.functions import st as S

WKTS = [
    "POINT (1 2)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOLYGON (((5 5, 7 5, 7 7, 5 7, 5 5)))",
    None,
]


@pytest.fixture(scope="module")
def sql_table(spark):
    names = register_sql_functions(spark)
    assert len(names) >= 45
    pdf = pd.DataFrame({"wkt": WKTS, "k": range(len(WKTS))})
    df = spark.createDataFrame(pdf).select(
        "k", S.st_geomfromtext("wkt").alias("g"))
    df.createOrReplaceTempView("sqlreg_t")
    return df


def _pairs(spark, df, sql_expr, col_expr):
    a = [tuple(r) for r in spark.sql(
        f"SELECT k, {sql_expr} AS v FROM sqlreg_t ORDER BY k").collect()]
    b = [tuple(r) for r in
         df.select("k", col_expr.alias("v")).orderBy("k").collect()]
    return a, b


UNARY_CASES = [
    ("st_area(g)", lambda: S.st_area("g")),
    ("st_length(g)", lambda: S.st_length("g")),
    ("st_geometry_type(g)", lambda: S.st_geometry_type("g")),
    ("st_is_valid(g)", lambda: S.st_is_valid("g")),
    ("st_is_empty(g)", lambda: S.st_is_empty("g")),
    ("st_num_coordinates(g)", lambda: S.st_num_coordinates("g")),
    ("st_astext(st_centroid(g))", lambda: S.st_astext(S.st_centroid("g"))),
    ("st_astext(st_envelope(g))", lambda: S.st_astext(S.st_envelope("g"))),
    ("st_astext(st_convex_hull(g))",
     lambda: S.st_astext(S.st_convex_hull("g"))),
    ("st_astext(st_boundary(g))", lambda: S.st_astext(S.st_boundary("g"))),
    ("st_astext(st_buffer(g, 0.5))",
     lambda: S.st_astext(S.st_buffer("g", 0.5))),
    ("st_astext(st_simplify(g, 0.1))",
     lambda: S.st_astext(S.st_simplify("g", 0.1))),
    ("st_astext(st_segmentize(g, 1.0))",
     lambda: S.st_astext(S.st_segmentize("g", 1.0))),
]


def test_unary_sql_matches_column_api(spark, sql_table):
    for sql_expr, col in UNARY_CASES:
        a, b = _pairs(spark, sql_table, sql_expr, col())
        assert a == b, sql_expr


def test_binary_sql_matches_column_api(spark, sql_table):
    df = sql_table
    for sql_expr, col in [
        ("st_intersects(g, st_buffer(st_point(1.0, 2.0), 1.0))",
         lambda: S.st_intersects("g", S.st_buffer(S.st_point(
             __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1.0),
             __import__("pyspark.sql.functions", fromlist=["lit"]).lit(2.0)),
             1.0))),
        ("st_distance(g, st_point(0.0, 0.0))",
         lambda: S.st_distance("g", S.st_point(
             __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0.0),
             __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0.0)))),
        ("st_astext(st_intersection(g, st_buffer(st_point(1.0, 1.0), 2.0)))",
         lambda: S.st_astext(S.st_intersection("g", S.st_buffer(S.st_point(
             __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1.0),
             __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1.0)),
             2.0)))),
    ]:
        a, b = _pairs(spark, df, sql_expr, col())
        assert a == b, sql_expr


def test_sql_join_query(spark, sql_table):
    # a whole spatial query in SQL: which geometries fall within 3 units
    # of the unit square's center
    out = spark.sql(
        "SELECT k FROM sqlreg_t "
        "WHERE st_dwithin(g, st_point(2.0, 2.0), 3.0) ORDER BY k").collect()
    assert [r.k for r in out] == [0, 1, 2]


def test_varying_parameter_raises(spark, sql_table):
    from pyspark.sql.utils import PythonException

    with pytest.raises(PythonException, match="constant"):
        spark.sql(
            "SELECT st_buffer(g, CAST(k AS DOUBLE)) FROM sqlreg_t").collect()
