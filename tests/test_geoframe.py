"""GeoFrame wrapper — the GeoDataFrame-shaped API surface."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopandas_spark.frame import GeoFrame, read_geoparquet
from geopandas_spark.functions import st


@pytest.fixture(scope="module")
def gf(spark):
    pdf = pd.DataFrame({
        "name": ["a", "b", "c"],
        "grp": [1, 1, 2],
        "wkt": [
            "POINT (0.5 0.5)",
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
        ],
    })
    df = spark.createDataFrame(pdf).withColumn(
        "geometry", st.st_geomfromtext("wkt")).drop("wkt")
    return GeoFrame(df, crs="EPSG:4326")


def test_scalars_and_bounds(gf):
    a = {r["name"]: r["area"] for r in gf.area.collect()}
    assert a == {"a": 0.0, "b": 4.0, "c": 4.0}
    assert gf.total_bounds() == (0.0, 0.0, 3.0, 3.0)
    t = {r["name"]: r["geom_type"] for r in gf.geom_type.collect()}
    assert t["a"] == "Point" and t["b"] == "Polygon"


def test_constructive_chain(gf):
    buf = gf.filter(F.col("name") == "a").buffer(0.1)
    area = buf.area.collect()[0]["area"]
    assert abs(area - 16 * math.sin(2 * math.pi / 32) * 0.01) < 1e-9
    c = gf.centroid().filter(F.col("name") == "b")
    r = c.df.select(st.st_x("geometry").alias("x")).collect()[0]
    assert r["x"] == 1.0


def test_joins_and_overlay(gf, spark):
    polys = gf.filter(F.col("name") != "a")
    pts = gf.filter(F.col("name") == "a")
    j = pts.sjoin(polys, predicate="within", lsuffix="l", rsuffix="r")
    assert j.count() == 1  # point in polygon b only
    ov = polys.filter(F.col("name") == "b").overlay(
        polys.filter(F.col("name") == "c"), how="intersection", resolution=5)
    r = ov.area.collect()[0]["area"]
    assert abs(r - 1.0) < 1e-9


def test_dissolve_clip(gf):
    d = gf.filter(F.col("name") != "a").dissolve(by="grp", method="unary")
    assert d.count() == 2
    cl = gf.clip((0.0, 0.0, 1.0, 1.0))
    areas = sorted(r["area"] for r in cl.area.collect())
    assert abs(areas[-1] - 1.0) < 1e-9  # square b clipped to unit window


def test_to_crs_roundtrip(gf):
    m = gf.to_crs("EPSG:3857").to_crs("EPSG:4326")
    x = m.filter(F.col("name") == "a").df.select(
        st.st_x("geometry").alias("x")).collect()[0]["x"]
    assert abs(x - 0.5) < 1e-9


def test_geoparquet_roundtrip(gf, spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gpq") / "t")
    meta = gf.to_geoparquet(path)
    assert meta["primary_column"] == "geometry"
    back = read_geoparquet(spark, path)
    assert back.count() == 3 and back.crs == "EPSG:4326"


def test_geoarrow_roundtrip(spark):
    """to_arrow/from_arrow (geodataframe.py:540,786): WKB and point
    encodings round-trip with GeoArrow extension metadata."""
    import pandas as pd
    from geopandas_spark.frame import GeoFrame
    from geopandas_spark.functions import st

    pdf = pd.DataFrame({"id": [1, 2], "wkt": ["POINT (1 2)", "POINT (3 4)"]})
    df = spark.createDataFrame(pdf)
    gf = GeoFrame(df.withColumn("geometry", st.st_geomfromtext("wkt"))
                  .drop("wkt"), crs="EPSG:4326")

    t = gf.to_arrow()
    md = t.schema.field("geometry").metadata
    assert md[b"ARROW:extension:name"] == b"geoarrow.wkb"
    back = GeoFrame.from_arrow(spark, t)
    assert back.crs == "EPSG:4326"
    assert back.df.count() == 2
    xs = sorted(r[0] for r in back.df.select(st.st_x("geometry")).collect())
    assert xs == [1.0, 3.0]

    tp = gf.to_arrow(geometry_encoding="point")
    assert tp.schema.field("geometry").metadata[
        b"ARROW:extension:name"] == b"geoarrow.point"
    back2 = GeoFrame.from_arrow(spark, tp)
    ys = sorted(r[0] for r in back2.df.select(st.st_y("geometry")).collect())
    assert ys == [2.0, 4.0]


def test_feather_roundtrip(spark, tmp_path):
    """read_feather/to_feather (io/arrow.py:367) round-trips data + geo
    metadata blob."""
    import pandas as pd
    from geopandas_spark.functions import st
    from geopandas_spark.sources.feather import read_feather, write_feather

    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2], "wkt": ["POINT (1 2)", "LINESTRING (0 0, 1 1)"]}))
    df = df.withColumn("geometry", st.st_geomfromtext("wkt")).drop("wkt")
    path = str(tmp_path / "t.feather")
    meta = write_feather(df, path, crs="EPSG:4326")
    assert meta["columns"]["geometry"]["crs"] == "EPSG:4326"
    back, meta2 = read_feather(spark, path)
    assert meta2 == meta
    assert back.count() == 2
    assert sorted(meta2["columns"]["geometry"]["geometry_types"]) == [
        "LineString", "Point"]


def test_list_layers(spark, tmp_path, gf):
    """list_layers (io/file.py:123): one (name, geometry_type) row per
    geometry column, from the geo metadata blob; Unknown when mixed or
    the blob is absent."""
    from geopandas_spark.sources.feather import write_feather
    from geopandas_spark.sources.geoparquet import write_geoparquet
    from geopandas_spark.sources.listing import list_layers

    # directory + sidecar, mixed Point/Polygon -> Unknown
    d = str(tmp_path / "mixed")
    write_geoparquet(gf.df, d)
    assert list_layers(d) == [("geometry", "Unknown")]

    # single-type points in a feather file
    pts = gf.df.filter(F.col("name") == "a")
    f = str(tmp_path / "pts.feather")
    write_feather(pts, f)
    assert list_layers(f) == [("geometry", "Point")]

    # plain parquet without a geo blob -> binary columns, Unknown type
    plain = str(tmp_path / "plain")
    gf.df.write.parquet(plain)
    assert list_layers(plain) == [("geometry", "Unknown")]


def test_convenience_wrappers(gf, spark):
    """to_wkt / representative_point / distance / union_all wrappers."""
    from geopandas_spark.geom import wkb as B

    w = {r["name"]: r["geometry"] for r in gf.to_wkt.collect()}
    assert w["a"] == "POINT (0.5 0.5)"

    rp = gf.representative_point()
    assert rp.count() == 3

    d = gf.distance(st.st_geomfromtext(F.lit("POINT (0.5 0.5)")))
    vals = {r["name"]: r["distance"] for r in d.collect()}
    assert vals["a"] == 0.0 and vals["b"] == 0.0

    u = gf.filter(F.col("grp") == 1).union_all()
    assert u is not None and len(bytes(u)) > 0


def test_geojson_file_io(gf, spark, tmp_path):
    """GeoJSONSeq (distributed) and FeatureCollection (single file)
    round-trips (to_file drivers, io/file.py:583)."""
    from geopandas_spark.sources.geojson import (
        read_geojson_file, read_geojsonseq, write_geojson_file,
        write_geojsonseq)

    seq = str(tmp_path / "seq")
    write_geojsonseq(gf.df, seq)
    back = read_geojsonseq(spark, seq)
    assert back.count() == 3
    xs = sorted(r[0] for r in back.select(st.st_x(
        st.st_centroid("geometry"))).collect())
    assert abs(xs[0] - 0.5) < 1e-9 and abs(xs[1] - 1.0) < 1e-9

    fc = str(tmp_path / "t.geojson")
    write_geojson_file(gf.df, fc)
    back2 = read_geojson_file(spark, fc)
    assert back2.count() == 3
    import json as _json
    with open(fc) as f:
        blob = _json.load(f)
    assert blob["type"] == "FeatureCollection" and len(blob["features"]) == 3


def test_feather_dataset_roundtrip(spark, tmp_path):
    """Distributed Feather: one IPC file per partition (no driver
    materialization), geo blob carried, executor-side read."""
    import numpy as np
    import pandas as pd

    from geopandas_spark.geom.ragged import points_batch
    from geopandas_spark.geom.wkb import to_wkb
    from geopandas_spark.sources.feather import (read_feather_dataset,
                                                 write_feather_dataset)

    n = 5000
    r = np.random.default_rng(3)
    df = spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(n),
        "geometry": list(to_wkb(points_batch(r.random(n), r.random(n)))),
    })).repartition(6)
    path = str(tmp_path / "fds")
    meta = write_feather_dataset(df, path, crs="EPSG:4326")
    import os
    parts = [f for f in os.listdir(path) if f.endswith(".feather")]
    assert len(parts) >= 2, "expected one file per non-empty partition"
    back, meta2 = read_feather_dataset(spark, path)
    assert meta2 == meta and meta["columns"]["geometry"]["crs"] == "EPSG:4326"
    assert back.count() == n
    assert sorted(r2.pid for r2 in back.select("pid").collect()) == \
        list(range(n))


def test_geoarrow_dataset_roundtrip(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from geopandas_spark.geom.ragged import points_batch
    from geopandas_spark.geom.wkb import to_wkb
    from geopandas_spark.sources.geoarrow import (read_geoarrow_dataset,
                                                  write_geoarrow_dataset)

    n = 1000
    r = np.random.default_rng(4)
    df = spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(n),
        "geometry": list(to_wkb(points_batch(r.random(n), r.random(n)))),
    })).repartition(4)
    path = str(tmp_path / "gads")
    write_geoarrow_dataset(df, path, crs="EPSG:3857")
    back, geom_col, crs = read_geoarrow_dataset(spark, path)
    assert geom_col == "geometry" and crs == "EPSG:3857"
    assert back.count() == n
