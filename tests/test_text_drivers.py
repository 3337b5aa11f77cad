"""Text OGR driver family: GML, GPX, MapInfo MIF/MID, BNA.

Reference extension map io/file.py:28-34; round-trip shape modeled on
the reference's io/tests/test_file*.py. Containers parse driver-side,
geometry codecs run distributed (sources/featuretable.py plumbing)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopandas_spark.functions.st import st_astext, st_geomfromtext
from geopandas_spark.sources.file import read_file, to_file
from geopandas_spark.sources.listing import list_layers


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


MIXED_WKTS = [
    "POINT (1 2)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTILINESTRING ((0 0, 1 0), (2 0, 3 0, 3 1))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
    "((5 5, 7 5, 7 7, 5 7, 5 5)))",
]


class TestGML:
    def test_roundtrip_mixed_attrs(self, spark, tmp_path):
        df = _df(spark, MIXED_WKTS, name=["a", "b", "c", "d", "e"],
                 v=[1, 2, 3, 4, 5], x=[0.5, None, 2.5, 3.5, 4.5])
        p = str(tmp_path / "m.gml")
        to_file(df, p)
        back = read_file(spark, p)
        assert _wkts(back, order="v") == MIXED_WKTS
        pdf = back.orderBy("v").toPandas()
        assert list(pdf["name"]) == ["a", "b", "c", "d", "e"]
        assert list(pdf["v"]) == [1, 2, 3, 4, 5]  # inferred long
        assert pdf["x"].iloc[0] == pytest.approx(0.5)
        assert pd.isna(pdf["x"].iloc[1])

    def test_z_roundtrip(self, spark, tmp_path):
        wkts = ["POINT Z (1 2 3)", "LINESTRING Z (0 0 1, 1 1 2)"]
        p = str(tmp_path / "z.gml")
        to_file(_df(spark, wkts, v=[1, 2]), p)
        assert _wkts(read_file(spark, p), order="v") == wkts

    def test_reads_gml2_syntax(self, spark, tmp_path):
        # GML 2 coordinates/outerBoundaryIs framing (not what we write)
        doc = """<?xml version="1.0"?>
<FeatureCollection xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember><f>
  <geometryProperty><gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
   <gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates>
  </gml:LinearRing></gml:outerBoundaryIs>
  <gml:innerBoundaryIs><gml:LinearRing>
   <gml:coordinates>1,1 2,1 2,2 1,2 1,1</gml:coordinates>
  </gml:LinearRing></gml:innerBoundaryIs></gml:Polygon></geometryProperty>
  <name>sq</name><pop>7</pop>
 </f></gml:featureMember>
 <gml:featureMember><f>
  <geometryProperty><gml:Point><gml:coordinates>5,6</gml:coordinates>
  </gml:Point></geometryProperty>
  <name>pt</name><pop>9</pop>
 </f></gml:featureMember>
</FeatureCollection>"""
        p = str(tmp_path / "g2.gml")
        with open(p, "w") as f:
            f.write(doc)
        back = read_file(spark, p)
        got = _wkts(back, order="pop")
        assert got == [
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
            "POINT (5 6)"]
        pdf = back.orderBy("pop").toPandas()
        assert list(pdf["name"]) == ["sq", "pt"]
        assert list(pdf["pop"]) == [7, 9]

    def test_missing_geometry_row(self, spark, tmp_path):
        df = _df(spark, ["POINT (0 1)", None], v=[1, 2])
        p = str(tmp_path / "n.gml")
        to_file(df, p)
        got = _wkts(read_file(spark, p), order="v")
        assert got == ["POINT (0 1)", None]


class TestGPX:
    def test_waypoints_roundtrip(self, spark, tmp_path):
        df = _df(spark, ["POINT (10 50)", "POINT Z (11 51 340.5)"],
                 name=["w1", "w2"])
        p = str(tmp_path / "w.gpx")
        to_file(df, p)
        back = read_file(spark, p)  # default layer = waypoints
        assert _wkts(back, order="name") == [
            "POINT (10 50)", "POINT Z (11 51 340.5)"]
        pdf = back.orderBy("name").toPandas()
        assert list(pdf["name"]) == ["w1", "w2"]
        assert pd.isna(pdf["ele"].iloc[0])
        assert pdf["ele"].iloc[1] == pytest.approx(340.5)

    def test_tracks_roundtrip_and_layers(self, spark, tmp_path):
        df = _df(spark, ["LINESTRING (0 0, 1 1)",
                         "MULTILINESTRING ((2 2, 3 3), (4 4, 5 5, 6 6))"],
                 name=["t1", "t2"])
        p = str(tmp_path / "t.gpx")
        to_file(df, p)
        back = read_file(spark, p, layer="tracks")
        assert _wkts(back, order="name") == [
            "MULTILINESTRING ((0 0, 1 1))",
            "MULTILINESTRING ((2 2, 3 3), (4 4, 5 5, 6 6))"]
        tp = read_file(spark, p, layer="track_points").toPandas()
        assert len(tp) == 7
        assert sorted(set(tp["track_fid"])) == [0, 1]
        assert sorted(tp["track_seg_point_id"][tp["track_seg_id"] == 1]) \
            == [0, 1, 2]
        assert [n for n, _ in list_layers(p)] == [
            "waypoints", "routes", "tracks", "route_points", "track_points"]

    def test_routes_layer(self, spark, tmp_path):
        doc = """<?xml version="1.0"?>
<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1">
 <rte><name>r1</name>
  <rtept lat="1.0" lon="2.0"><ele>5.0</ele></rtept>
  <rtept lat="3.0" lon="4.0"/>
 </rte>
</gpx>"""
        p = str(tmp_path / "r.gpx")
        with open(p, "w") as f:
            f.write(doc)
        back = read_file(spark, p, layer="routes")
        # one rtept carries <ele>, so the line is 3D with missing
        # elevations as 0 (OGR 2.5D behavior)
        assert _wkts(back) == ["LINESTRING Z (2 1 5, 4 3 0)"]
        rp = read_file(spark, p, layer="route_points").toPandas()
        assert list(rp["route_point_id"]) == [0, 1]
        assert rp["ele"].iloc[0] == pytest.approx(5.0)

    def test_bad_layer_and_bad_type(self, spark, tmp_path):
        p = str(tmp_path / "b.gpx")
        to_file(_df(spark, ["POINT (0 0)"]), p)
        with pytest.raises(ValueError, match="waypoints/routes/tracks"):
            read_file(spark, p, layer="nope")
        with pytest.raises(ValueError, match="GPX cannot store"):
            to_file(_df(spark, ["POLYGON ((0 0, 1 0, 1 1, 0 0))"]),
                    str(tmp_path / "p.gpx"))


class TestMapInfo:
    def test_roundtrip_mixed_attrs(self, spark, tmp_path):
        df = _df(spark, MIXED_WKTS + [None],
                 name=["a", "b", "c", "d", "e", None],
                 v=[1, 2, 3, 4, 5, 6],
                 x=[0.5, 1.5, 2.5, 3.5, 4.5, 5.5],
                 ok=[True, False, True, False, True, False])
        p = str(tmp_path / "m.mif")
        to_file(df, p)
        back = read_file(spark, p)
        assert _wkts(back, order="v") == MIXED_WKTS + [None]
        pdf = back.orderBy("v").toPandas()
        assert list(pdf["name"])[:5] == ["a", "b", "c", "d", "e"]
        assert list(pdf["v"]) == [1, 2, 3, 4, 5, 6]
        assert list(pdf["ok"]) == [True, False, True, False, True, False]
        assert pdf["x"].iloc[2] == pytest.approx(2.5)

    def test_read_mid_extension_and_rect(self, spark, tmp_path):
        mif = str(tmp_path / "r.mif")
        with open(mif, "w") as f:
            f.write('Version 300\nDelimiter ","\nColumns 1\n  tag Char(8)\n'
                    "Data\n"
                    "RECT 0 0 4 3\n"
                    "  PEN (1,2,0)\n"
                    "POINT 7 8\n"
                    "  SYMBOL (34,0,12)\n")
        with open(str(tmp_path / "r.mid"), "w") as f:
            f.write('"box"\n"pt"\n')
        back = read_file(spark, str(tmp_path / "r.mid"))  # .mid dispatches
        assert _wkts(back, order="tag") == [
            "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))", "POINT (7 8)"]

    def test_region_hole_assembly(self, spark, tmp_path):
        mif = str(tmp_path / "h.mif")
        # two rings, inner is a hole of the outer (no orientation hints)
        with open(mif, "w") as f:
            f.write("Version 300\nColumns 0\nData\n"
                    "REGION 2\n  5\n0 0\n10 0\n10 10\n0 10\n0 0\n"
                    "  5\n2 2\n4 2\n4 4\n2 4\n2 2\n")
        got = _wkts(read_file(spark, mif))
        assert got[0].startswith("POLYGON ((")
        assert ", (" in got[0]  # has an interior ring

    def test_arc_raises(self, spark, tmp_path):
        mif = str(tmp_path / "a.mif")
        with open(mif, "w") as f:
            f.write("Version 300\nColumns 0\nData\n"
                    "ARC 0 0 1 1 0 90\n")
        with pytest.raises(NotImplementedError, match="ARC"):
            read_file(spark, mif).collect()


class TestBNA:
    def test_roundtrip(self, spark, tmp_path):
        df = _df(spark, ["POINT (1 2)", "LINESTRING (0 0, 1 0, 1 1)",
                         "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"],
                 primary=["p", "l", "g"], secondary=["1", "2", "3"])
        p = str(tmp_path / "b.bna")
        to_file(df, p)
        back = read_file(spark, p)
        assert _wkts(back, order="primary") == [
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "LINESTRING (0 0, 1 0, 1 1)", "POINT (1 2)"]
        pdf = back.orderBy("primary").toPandas()
        assert list(pdf["secondary"]) == ["3", "2", "1"]

    def test_polygon_hole_retrace(self, spark, tmp_path):
        wkt = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
               "(2 2, 4 2, 4 4, 2 4, 2 2))")
        p = str(tmp_path / "h.bna")
        to_file(_df(spark, [wkt], primary=["x"]), p)
        got = _wkts(read_file(spark, p))
        assert got[0].startswith("POLYGON ((0 0, 10 0")
        assert ", (" in got[0]

    def test_ellipse_raises(self, spark, tmp_path):
        p = str(tmp_path / "e.bna")
        with open(p, "w") as f:
            f.write('"e","",2\n1,1\n0.5,0.25\n')
        with pytest.raises(NotImplementedError, match="ellipse"):
            read_file(spark, p)


class TestDXF:
    def test_roundtrip_points_lines(self, spark, tmp_path):
        wkts = ["POINT (1 2)", "LINESTRING (0 0, 1 1, 2 0)",
                "MULTILINESTRING ((0 0, 1 0), (2 0, 3 1))"]
        df = _df(spark, wkts, Layer=["a", "b", "c"])
        p = str(tmp_path / "d.dxf")
        to_file(df, p)
        back = read_file(spark, p)
        got = _wkts(back)
        assert "POINT (1 2)" in got
        assert "LINESTRING (0 0, 1 1, 2 0)" in got
        # MultiLineString splits into one LWPOLYLINE per part (OGR model)
        assert "LINESTRING (0 0, 1 0)" in got and len(got) == 4
        pdf = back.toPandas()
        assert set(pdf["Layer"]) == {"a", "b", "c"}
        assert pdf["EntityHandle"].notna().all()

    def test_closed_ring_and_polygon_write(self, spark, tmp_path):
        # polygon writes one closed LWPOLYLINE per ring; the reader
        # returns closed rings as LineStrings (OGR's DXF model: POLYGON
        # only ever comes from HATCH)
        p = str(tmp_path / "r.dxf")
        to_file(_df(spark, ["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"]), p)
        assert _wkts(read_file(spark, p)) == [
            "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"]

    def test_bulge_raises_or_skips(self, spark, tmp_path):
        # bulge (group 42) = circular arc: flattening silently would be
        # wrong geometry, so it raises like ARC (skip drops the entity)
        doc = ("0\nSECTION\n2\nENTITIES\n"
               "0\nLWPOLYLINE\n8\n0\n90\n2\n70\n0\n"
               "10\n0.0\n20\n0.0\n42\n1.0\n10\n1.0\n20\n0.0\n"
               "0\nPOINT\n8\n0\n10\n5.0\n20\n6.0\n"
               "0\nENDSEC\n0\nEOF\n")
        p = str(tmp_path / "b.dxf")
        with open(p, "w") as f:
            f.write(doc)
        with pytest.raises(NotImplementedError, match="bulge"):
            read_file(spark, p)
        assert _wkts(read_file(spark, p, on_unsupported="skip")) \
            == ["POINT (5 6)"]

    def test_unterminated_polyline_flushes(self, spark, tmp_path):
        # POLYLINE missing its SEQEND (exporter quirk / truncation)
        # must not silently vanish
        doc = ("0\nSECTION\n2\nENTITIES\n"
               "0\nPOLYLINE\n8\n0\n70\n0\n"
               "0\nVERTEX\n10\n0.0\n20\n0.0\n"
               "0\nVERTEX\n10\n1.0\n20\n2.0\n")
        p = str(tmp_path / "u.dxf")
        with open(p, "w") as f:
            f.write(doc)
        assert _wkts(read_file(spark, p)) == ["LINESTRING (0 0, 1 2)"]

    def test_polyline_vertex_seqend_and_skip(self, spark, tmp_path):
        doc = ("0\nSECTION\n2\nENTITIES\n"
               "0\nPOLYLINE\n8\nroads\n70\n0\n"
               "0\nVERTEX\n10\n0.0\n20\n0.0\n"
               "0\nVERTEX\n10\n1.0\n20\n2.0\n"
               "0\nSEQEND\n"
               "0\nTEXT\n8\nlabels\n10\n5.0\n20\n5.0\n1\nhello\n"
               "0\nENDSEC\n0\nEOF\n")
        p = str(tmp_path / "p.dxf")
        with open(p, "w") as f:
            f.write(doc)
        with pytest.raises(NotImplementedError, match="TEXT"):
            read_file(spark, p)
        back = read_file(spark, p, on_unsupported="skip")
        assert _wkts(back) == ["LINESTRING (0 0, 1 2)"]
        assert back.toPandas()["Layer"].iloc[0] == "roads"


class TestDispatchCommon:
    def test_bbox_columns_rows_on_gml(self, spark, tmp_path):
        df = _df(spark, [f"POINT ({i} {i})" for i in range(10)],
                 v=list(range(10)), w=[str(i) for i in range(10)])
        p = str(tmp_path / "d.gml")
        to_file(df, p)
        got = read_file(spark, p, bbox=(2.5, 2.5, 6.5, 6.5), columns=["v"])
        assert got.columns == ["geometry", "v"]
        assert sorted(r["v"] for r in got.collect()) == [3, 4, 5, 6]
        assert read_file(spark, p, rows=4).count() == 4


class TestReviewFixes:
    def test_gml_srs_dimension_on_geometry_element(self):
        """srsDimension on the parent geometry element (common real-world
        placement) must make posList parse 3-D."""
        import xml.etree.ElementTree as ET

        from geopandas_spark.sources.gml import gml_geometry_to_geojson

        el = ET.fromstring(
            '<LineString xmlns="http://www.opengis.net/gml" '
            'srsDimension="3"><posList>1 2 3 4 5 6</posList></LineString>')
        gj = gml_geometry_to_geojson(el)
        assert gj["coordinates"] == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]

    def test_gml_curve_arc_segment_raises(self):
        import xml.etree.ElementTree as ET

        from geopandas_spark.sources.gml import gml_geometry_to_geojson

        el = ET.fromstring(
            '<Curve xmlns="http://www.opengis.net/gml"><segments>'
            '<LineStringSegment><posList>0 0 1 1</posList>'
            '</LineStringSegment>'
            '<Arc><posList>1 1 2 0 3 1</posList></Arc>'
            '</segments></Curve>')
        with pytest.raises(NotImplementedError, match="Arc"):
            gml_geometry_to_geojson(el)

    def test_gml_write_rejects_invalid_column_names(self, spark, tmp_path):
        df = spark.createDataFrame(
            pd.DataFrame({"bad name": [1]})).withColumn(
            "geometry", st_geomfromtext(F.lit("POINT (0 0)")))
        with pytest.raises(ValueError, match="XML names"):
            to_file(df, str(tmp_path / "bad.gml"))

    def test_dxf_3dface_uniform_z(self, spark, tmp_path):
        """3DFACE with some z=0 corners: every vertex gets a z (no NaN
        fill from mixed 2D/3D positions)."""
        from geopandas_spark.sources.dxf import _entity_geojson

        codes = [(10, "0"), (20, "0"), (30, "0"),
                 (11, "1"), (21, "0"), (31, "5"),
                 (12, "1"), (22, "1"), (32, "5"),
                 (13, "0"), (23, "1"), (33, "0")]
        gj = _entity_geojson("3DFACE", codes)
        assert all(len(p) == 3 for p in gj["coordinates"])
        assert gj["coordinates"][0] == [0.0, 0.0, 0.0]

    def test_mif_decimal_column_is_float(self, spark, tmp_path):
        from decimal import Decimal

        from geopandas_spark.sources.mapinfo import write_mif

        df = spark.createDataFrame(
            [(Decimal("1.25"),)], "d decimal(10,2)").withColumn(
            "geometry", st_geomfromtext(F.lit("POINT (0 0)")))
        p = str(tmp_path / "dec.mif")
        write_mif(df, p)
        hdr = open(p).read()
        assert "Float" in hdr and "Char(254)" not in hdr
        back = read_file(spark, p)
        assert [t for n, t in back.dtypes if n == "d"][0] in (
            "double", "float")

    def test_fgb_nullable_int_column(self, spark, tmp_path):
        """Nullable int columns arrive as float64 via toPandas; the
        writer must still pack them as integers."""
        df = spark.createDataFrame(
            [(1, "a"), (None, "b"), (3, "c")], "k bigint, s string"
        ).withColumn("geometry", st_geomfromtext(F.lit("POINT (1 2)")))
        p = str(tmp_path / "nullint.fgb")
        to_file(df, p)
        back = read_file(spark, p).orderBy("s").collect()
        assert [r["k"] for r in back] == [1, None, 3]
