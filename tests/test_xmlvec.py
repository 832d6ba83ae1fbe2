"""GPX / KML driver tests (ogr/ogrsf_frmts/gpx, ogr/ogrsf_frmts/kml)."""

import os

from pyspark.sql import functions as F

from gdal_spark import xmlvec

GPX_DOC = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="t">
  <wpt lat="48.2" lon="16.37"><ele>151.0</ele><name>Wien &amp; Umgebung</name>
    <cmt>line
break</cmt><sym>Flag</sym></wpt>
  <wpt lat="-33.9" lon="151.2"><name>Sydney</name></wpt>
  <trk><name>ride</name><desc>two segs</desc>
    <trkseg>
      <trkpt lat="1.0" lon="2.0"><ele>5.0</ele></trkpt>
      <trkpt lat="1.5" lon="2.5"/>
    </trkseg>
    <trkseg><trkpt lat="3.0" lon="4.0"/></trkseg>
  </trk>
</gpx>
"""


def _write_gpx_fixture(tmp_path):
    p = tmp_path / "fix"
    p.mkdir()
    (p / "a.gpx").write_text(GPX_DOC)
    return str(p)


def test_gpx_waypoints(spark, tmp_path):
    d = _write_gpx_fixture(tmp_path)
    wpts = xmlvec.read_gpx(spark, d, layer="waypoints").orderBy("fid")
    rows = wpts.collect()
    assert len(rows) == 2
    assert rows[0].lat == 48.2 and rows[0].lon == 16.37
    assert rows[0].name == "Wien & Umgebung"  # entity unescaped
    assert rows[0].cmt == "line\nbreak" and rows[0].sym == "Flag"
    assert rows[0].ele == 151.0
    assert rows[1].name == "Sydney" and rows[1].ele is None


def test_gpx_tracks_and_points(spark, tmp_path):
    d = _write_gpx_fixture(tmp_path)
    trk = xmlvec.read_gpx(spark, d, layer="tracks").first()
    assert trk.name == "ride"
    assert trk.wkt == ("MULTILINESTRING ((2.0000000 1.0000000, "
                       "2.5000000 1.5000000), (4.0000000 3.0000000))")
    pts = xmlvec.read_gpx(spark, d, layer="track_points") \
        .orderBy("track_seg_id", "track_seg_point_id").collect()
    assert [(p.track_seg_id, p.track_seg_point_id) for p in pts] == \
        [(0, 0), (0, 1), (1, 0)]
    assert pts[0].ele == 5.0 and pts[2].lat == 3.0


def test_gpx_write_roundtrip_parallel(spark, tmp_path):
    df = spark.range(0, 200).select(
        (F.col("id") % 171 - 85).cast("double").alias("lat"),
        (F.col("id") % 360 - 180).cast("double").alias("lon"),
        F.col("id").cast("string").alias("name"),
        F.concat(F.lit("d&<>\n"), F.col("id").cast("string")).alias("desc"),
    ).repartition(6)
    path = str(tmp_path / "out_gpx")
    xmlvec.write_gpx(df, path)
    parts = [f for f in os.listdir(path) if f.endswith(".gpx")]
    assert len(parts) > 1  # genuinely parallel: one doc per partition
    back = xmlvec.read_gpx(spark, path, layer="waypoints")
    assert back.count() == 200
    r = back.filter(F.col("name") == "7").first()
    assert r.lat == 7 - 85 + 0.0 and r.lon == 7 - 180.0
    assert r.desc == "d&<>\n7"  # XML escaping lossless


def test_kml_roundtrip(spark, tmp_path):
    rows = [
        ("a", "first", "POINT (10 20)"),
        ("b", "poly", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        ("c", None, "LINESTRING (0 0, 1 1, 2 0)"),
    ]
    df = spark.createDataFrame(rows, "name string, description string, "
                                     "wkt string").repartition(2)
    path = str(tmp_path / "out_kml")
    xmlvec.write_kml(df, path)
    back = xmlvec.read_kml(spark, path).orderBy("name").collect()
    assert [r.name for r in back] == ["a", "b", "c"]
    assert back[0].wkt == "POINT (10.0000000 20.0000000)"
    assert back[1].wkt.startswith("POLYGON ((0.0000000 0.0000000")
    assert back[2].wkt == ("LINESTRING (0.0000000 0.0000000, "
                           "1.0000000 1.0000000, 2.0000000 0.0000000)")


def test_kml_single_file(spark, tmp_path):
    df = spark.createDataFrame([("x", "d", "POINT (1 2)")],
                               "name string, description string, wkt string")
    path = str(tmp_path / "one.kml")
    xmlvec.write_kml(df, path, single_file=True)
    text = open(path).read()
    assert "<Placemark>" in text and "1.0000000,2.0000000" in text
    assert xmlvec.read_kml(spark, path).count() == 1


# ------------------------------------------------------------------ GML
def test_gml_write_read_roundtrip(spark, tmp_path):  # noqa: F811
    from gdal_spark.xmlvec import read_gml, write_gml

    rows = []
    for i in range(60):
        if i % 3 == 0:
            w = f"POINT ({i} {i % 7})"
        elif i % 3 == 1:
            w = f"LINESTRING ({i} 0, {i} 5, {i + 1} 9)"
        else:
            w = (f"POLYGON (({i} 0, {i + 2} 0, {i + 2} 2, {i} 0),"
                 f" ({i + 0.5} 0.25, {i + 1} 0.25, {i + 1} 0.75,"
                 f" {i + 0.5} 0.25))")
        rows.append((i, f"name{i}", w))
    df = spark.createDataFrame(rows, "oid long, name string,"
                                     " geom_wkt string")
    d = str(tmp_path / "parts")
    write_gml(df, d, layer="roads")
    out = read_gml(spark, d).toPandas()
    assert len(out) == 60
    assert set(out["layer"]) == {"roads"}
    got = {int(p["oid"]): r for (_, r), p in
           zip(out.iterrows(), out["props"])}
    from gdal_spark.geometry import parse_wkt
    import numpy as np
    for i, name, w in rows:
        r = out[out["props"].apply(lambda p: p.get("oid") == str(i))]
        assert len(r) == 1
        rr = r.iloc[0]
        assert rr["props"]["name"] == name
        g0, g1 = parse_wkt(w), parse_wkt(rr["geom_wkt"])
        assert g0.kind == g1.kind

        def flat(g):
            o = []
            if g.kind in ("polygon", "multipolygon"):
                for poly in g.parts:
                    for xs, ys in poly:
                        o += list(xs) + list(ys)
            else:
                for xs, ys in g.parts:
                    o += list(xs) + list(ys)
            return np.asarray(o)
        f0, f1 = flat(g0), flat(g1)
        if g0.kind == "polygon":
            # writer closes rings; reader keeps them closed
            assert len(f1) >= len(f0)
        else:
            np.testing.assert_allclose(f1, f0, atol=1e-9)


def test_gml_gml2_coordinates_and_multi(spark, tmp_path):  # noqa: F811
    from gdal_spark.xmlvec import read_gml

    doc = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <cities fid="F1">
   <name>alpha</name>
   <pop>120</pop>
   <geom><gml:Point><gml:coordinates>3.5,-2.25</gml:coordinates>
   </gml:Point></geom>
  </cities>
 </gml:featureMember>
 <gml:featureMember>
  <zones>
   <geom><gml:MultiPolygon>
    <gml:polygonMember><gml:Polygon><gml:outerBoundaryIs>
     <gml:LinearRing><gml:coordinates>0,0 2,0 2,2 0,0</gml:coordinates>
     </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
    </gml:polygonMember>
   </gml:MultiPolygon></geom>
  </zones>
 </gml:featureMember>
</gml:FeatureCollection>"""
    p = tmp_path / "old.gml"
    p.write_text(doc)
    out = read_gml(spark, str(p)).toPandas().sort_values("fid")
    assert list(out["layer"]) == ["cities", "zones"]
    assert out.iloc[0]["geom_wkt"] == "POINT (3.5 -2.25)"
    assert out.iloc[0]["props"] == {"name": "alpha", "pop": "120"}
    assert out.iloc[1]["geom_wkt"] == \
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 0)))"
