"""read_file/to_file driver matrix: Shapefile (pure numpy), GeoPackage
(stdlib sqlite3), GeoJSON(-Seq), CSV-WKT — reference io/file.py:50-252,
extension map io/file.py:28-34, tests modeled on io/tests/test_file*.py
round-trips."""

import datetime as dt
import os

import numpy as np
import pandas as pd
import pytest

from geopandas_spark.functions.st import st_astext, st_geomfromtext
from geopandas_spark.sources.file import read_file, to_file
from geopandas_spark.sources.gpkg import gpkg_layers, read_gpkg, write_gpkg
from geopandas_spark.sources.listing import list_layers
from geopandas_spark.sources.shapefile import read_shapefile, write_shapefile


def _df(spark, wkts, **cols):
    pdf = pd.DataFrame({"wkt": wkts, **cols})
    return spark.createDataFrame(pdf).select(
        st_geomfromtext("wkt").alias("geometry"),
        *[c for c in cols])


def _wkts(df, order=None):
    rows = df.select(st_astext("geometry").alias("w"),
                     *([order] if order else [])).collect()
    if order:
        rows = sorted(rows, key=lambda r: r[order])
    return [r["w"] for r in rows]


POLY_WKTS = [
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
    "((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 6 5.5, 6 6, 5.5 6, 5.5 5.5)))",
    "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))",
]


class TestShapefile:
    def test_point_roundtrip_with_attrs(self, spark, tmp_path):
        df = _df(spark, ["POINT (1 2)", "POINT (3 4)", None, "POINT EMPTY"],
                 name=["a", "b", None, "d"], v=[1, 2, 3, 4],
                 x=[1.5, None, 2.25, -3.75])
        p = str(tmp_path / "pts.shp")
        write_shapefile(df, p)
        back = read_shapefile(spark, p).orderBy("v").toPandas()
        assert len(back) == 4
        got = [None if w is None else w for w in
               _wkts(read_shapefile(spark, p), order="v")]
        # missing and EMPTY both come back as null shapes (OGR parity)
        assert got == ["POINT (1 2)", "POINT (3 4)", None, None]
        assert list(back["name"]) == ["a", "b", None, "d"]
        assert list(back["v"]) == [1, 2, 3, 4]
        assert back["x"].iloc[0] == pytest.approx(1.5)
        assert pd.isna(back["x"].iloc[1])
        assert back["x"].iloc[3] == pytest.approx(-3.75)

    def test_polygon_holes_multipolygon(self, spark, tmp_path):
        df = _df(spark, POLY_WKTS, k=[1, 2, 3])
        p = str(tmp_path / "polys.shp")
        write_shapefile(df, p)
        got = _wkts(read_shapefile(spark, p), order="k")
        # ring order/orientation normalizes; compare via area + structure
        from geopandas_spark.geom.kernels import area
        from geopandas_spark.geom.wkt import from_wkt

        a0 = area(from_wkt(pd.Series(POLY_WKTS)))
        a1 = area(from_wkt(pd.Series(got)))
        np.testing.assert_allclose(a1, a0)
        assert got[0].startswith("POLYGON")
        assert got[1].startswith("MULTIPOLYGON")
        assert "5.5 5.5" in got[1]  # hole preserved inside 2nd part

    def test_lines_z_roundtrip(self, spark, tmp_path):
        wkts = ["LINESTRING Z (0 0 1, 1 1 2)",
                "MULTILINESTRING Z ((0 0 5, 2 0 6), (3 3 7, 4 4 8))"]
        df = _df(spark, wkts, k=[1, 2])
        p = str(tmp_path / "lines.shp")
        write_shapefile(df, p)
        assert _wkts(read_shapefile(spark, p), order="k") == wkts

    def test_bbox_columns_rows(self, spark, tmp_path):
        df = _df(spark, POLY_WKTS, k=[1, 2, 3])
        p = str(tmp_path / "polys.shp")
        write_shapefile(df, p)
        assert read_shapefile(spark, p, bbox=(19, 19, 31, 31)).count() == 1
        assert read_shapefile(spark, p, rows=2).count() == 2
        assert read_shapefile(spark, p, rows=slice(1, 3)).count() == 2
        sub = read_shapefile(spark, p, columns=["k"])
        assert sub.columns == ["geometry", "k"]
        with pytest.raises(ValueError, match="columns"):
            read_shapefile(spark, p, columns=["nope"]).count()

    def test_mixed_dimension_rejected(self, spark, tmp_path):
        df = _df(spark, ["POINT (0 0)", "LINESTRING (0 0, 1 1)"])
        with pytest.raises(ValueError, match="one geometry dimension"):
            write_shapefile(df, str(tmp_path / "bad.shp"))

    def test_distributed_read_partition_count(self, spark, tmp_path):
        n = 500
        x = np.arange(n, dtype=float)
        df = _df(spark, [f"POINT ({i} {i})" for i in x], v=list(range(n)))
        p = str(tmp_path / "many.shp")
        write_shapefile(df, p)
        back = read_shapefile(spark, p, num_partitions=8)
        assert back.rdd.getNumPartitions() > 1
        vals = sorted(r["v"] for r in back.select("v").collect())
        assert vals == list(range(n))


class TestGpkg:
    def test_roundtrip_types(self, spark, tmp_path):
        df = _df(spark,
                 ["POINT (1 2)", "LINESTRING (0 0, 2 2)", None,
                  "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"],
                 name=["a", None, "c", "d"], v=[1, 2, 3, 4],
                 x=[1.5, None, 2.25, -3.75],
                 flag=[True, False, None, True],
                 d=[dt.date(2020, 1, 2), None, dt.date(1999, 12, 31),
                    dt.date(2024, 2, 29)])
        p = str(tmp_path / "t.gpkg")
        write_gpkg(df, p, layer="mix")
        back = read_gpkg(spark, p).orderBy("v").toPandas()
        assert list(back["name"]) == ["a", None, "c", "d"]
        assert list(back["flag"]) == [True, False, None, True]
        assert back["d"].iloc[0] == dt.date(2020, 1, 2)
        assert pd.isna(back["d"].iloc[1])
        got = _wkts(read_gpkg(spark, p), order="v")
        assert got == ["POINT (1 2)", "LINESTRING (0 0, 2 2)", None,
                       "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"]

    def test_layers_and_append(self, spark, tmp_path):
        p = str(tmp_path / "multi.gpkg")
        write_gpkg(_df(spark, ["POINT (0 0)"]), p, layer="a")
        write_gpkg(_df(spark, ["POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"]),
                   p, layer="b", mode="append")
        assert gpkg_layers(p) == [("a", "POINT"), ("b", "POLYGON")]
        assert list_layers(p) == [("a", "Point"), ("b", "Polygon")]
        assert read_gpkg(spark, p, layer="b").count() == 1
        with pytest.raises(ValueError, match="layers"):
            read_gpkg(spark, p)

    def test_bbox_rows_columns(self, spark, tmp_path):
        df = _df(spark, [f"POINT ({i} {i})" for i in range(20)],
                 v=list(range(20)))
        p = str(tmp_path / "g.gpkg")
        write_gpkg(df, p)
        assert read_gpkg(spark, p, bbox=(4.5, 4.5, 9.5, 9.5)).count() == 5
        assert read_gpkg(spark, p, rows=7).count() == 7
        assert read_gpkg(spark, p, rows=slice(5, 9)).count() == 4
        assert read_gpkg(spark, p, columns=["v"]).columns == \
            ["geometry", "v"]

    def test_envelope_written(self, tmp_path, spark):
        import sqlite3

        df = _df(spark, ["POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"])
        p = str(tmp_path / "e.gpkg")
        write_gpkg(df, p, layer="l")
        with sqlite3.connect(p) as con:
            ext = con.execute(
                "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
            ).fetchone()
            blob = con.execute('SELECT geometry FROM "l"').fetchone()[0]
        assert ext == (0.0, 0.0, 5.0, 5.0)
        assert blob[:2] == b"GP" and (blob[3] >> 1) & 0b111 == 1


class TestReadToFileDispatch:
    @pytest.mark.parametrize("fname", ["x.shp", "x.gpkg", "x.csv"])
    def test_roundtrip_preserves_attrs(self, spark, tmp_path, fname):
        df = _df(spark, ["POINT (1 2)", "POINT (8 9)", "POINT (3 3)"],
                 name=["a", "b", "c"], v=[1, 2, 3])
        p = str(tmp_path / fname)
        to_file(df, p)
        back = read_file(spark, p)
        assert back.count() == 3
        assert sorted(back.columns) == ["geometry", "name", "v"]
        assert _wkts(back, order="v") == \
            ["POINT (1 2)", "POINT (8 9)", "POINT (3 3)"]

    def test_bbox_and_mask(self, spark, tmp_path):
        df = _df(spark, ["POINT (1 2)", "POINT (8 9)", "POINT (3 3)"],
                 v=[1, 2, 3])
        p = str(tmp_path / "x.gpkg")
        to_file(df, p)
        assert read_file(spark, p, bbox=(0, 0, 4, 4)).count() == 2
        assert read_file(
            spark, p,
            mask="POLYGON ((7 8, 9 8, 9 10, 7 10, 7 8))").count() == 1
        with pytest.raises(ValueError, match="bbox and mask"):
            read_file(spark, str(tmp_path / "y.geojson"), bbox=(0, 0, 1, 1),
                      mask="POINT (0 0)")

    def test_unsupported_driver_names_ogr(self, spark, tmp_path):
        with pytest.raises(NotImplementedError, match="DGN"):
            read_file(spark, "a.dgn")
        with pytest.raises(NotImplementedError, match="MapInfo"):
            to_file(_df(spark, ["POINT (0 0)"]), str(tmp_path / "a.tab"))

    def test_geojson_and_seq(self, spark, tmp_path):
        df = _df(spark, ["POINT (1 2)", "POINT (8 9)"], v=[1, 2])
        for fname in ("f.geojson", "f.geojsonl"):
            p = str(tmp_path / fname)
            to_file(df, p)
            back = read_file(spark, p, rows=1)
            assert back.count() == 1

    def test_open_stop_slice_guarded(self, spark, tmp_path, monkeypatch):
        """rows=slice(n, None) materializes on the driver: it must hit the
        same row cap every other single-file pull uses (VERDICT r4)."""
        import geopandas_spark.sources.feather as feather

        df = _df(spark, ["POINT (1 2)", "POINT (8 9)", "POINT (3 3)"],
                 v=[1, 2, 3])
        p = str(tmp_path / "cap.csv")
        to_file(df, p)
        # under the cap: works and skips `start` rows
        assert read_file(spark, p, rows=slice(1, None)).count() == 2
        monkeypatch.setattr(feather, "SINGLE_FILE_MAX_ROWS", 2)
        with pytest.raises(ValueError, match="rows=slice"):
            read_file(spark, p, rows=slice(1, None))
        # bounded slices stay un-guarded (driver pull capped at `stop`)
        assert read_file(spark, p, rows=slice(1, 3)).count() == 2


class TestZipAndGeoFrame:
    def test_zipped_shapefile(self, spark, tmp_path):
        import zipfile

        df = _df(spark, ["POINT (1 2)", "POINT (8 9)"], v=[1, 2])
        shp = str(tmp_path / "pts.shp")
        to_file(df, shp)
        zpath = str(tmp_path / "pts.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for ext in (".shp", ".shx", ".dbf", ".cpg"):
                zf.write(str(tmp_path / f"pts{ext}"), f"pts{ext}")
        back = read_file(spark, zpath)
        assert back.count() == 2
        assert _wkts(back, order="v") == ["POINT (1 2)", "POINT (8 9)"]

    def test_geoframe_read_to_file(self, spark, tmp_path):
        from geopandas_spark.frame import GeoFrame, read_file as gf_read

        df = _df(spark, ["POINT (1 2)", "POINT (3 4)"], v=[1, 2])
        gf = GeoFrame(df)
        p = str(tmp_path / "gf.gpkg")
        gf.to_file(p, layer="pts")
        back = gf_read(spark, p)
        assert back.count() == 2
        assert set(back.columns) == {"geometry", "v"}

    def test_shapefile_date_bool_fields(self, spark, tmp_path):
        df = _df(spark, ["POINT (0 0)", "POINT (1 1)"],
                 d=[dt.date(2021, 6, 30), None],
                 flag=[True, None], v=[1, 2])
        p = str(tmp_path / "db.shp")
        to_file(df, p)
        back = read_file(spark, p).orderBy("v").toPandas()
        assert back["d"].iloc[0] == dt.date(2021, 6, 30)
        assert pd.isna(back["d"].iloc[1])
        assert back["flag"].iloc[0] is True or back["flag"].iloc[0] == True  # noqa: E712
        assert pd.isna(back["flag"].iloc[1]) or back["flag"].iloc[1] is None
