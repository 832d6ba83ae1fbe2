"""GeoJSON / GeoJSONSeq source."""

import json

from gdal_spark.geojson import (geojson_geometry_to_geom, read_geojson,
                                read_geojson_seq)


def test_geometry_conversion():
    from gdal_spark import geometry as GM

    g = geojson_geometry_to_geom(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]}
    )
    assert GM.to_wkt(g, 0) == "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"
    g2 = geojson_geometry_to_geom(
        {"type": "MultiLineString",
         "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]}
    )
    assert g2.kind == "multilinestring" and len(g2.parts) == 2


def test_read_seq_and_collection(spark, tmp_path):
    feats = [
        {"type": "Feature", "id": 7,
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]},
         "properties": {"name": "a", "n": 3}},
        {"type": "Feature",
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 0], [1, 0]]},
         "properties": {"name": "b", "nested": {"x": 1}}},
    ]
    seq = tmp_path / "f.geojsonl"
    seq.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
    out = {r["fid"]: r for r in read_geojson_seq(spark, str(seq)).collect()}
    assert out[7]["geom_wkt"] == "POINT(1.5000000 2.5000000)"
    assert out[7]["properties"]["n"] == "3"
    # feature without id gets its line number
    assert out[1]["geom_wkt"].startswith("LINESTRING(")
    assert out[1]["properties"]["nested"] == '{"x": 1}'

    coll = tmp_path / "f.geojson"
    coll.write_text(json.dumps(
        {"type": "FeatureCollection", "features": feats}))
    got = read_geojson(spark, str(coll)).collect()
    assert len(got) == 2


def test_write_read_roundtrip(spark, tmp_path):
    import pandas as pd

    from gdal_spark.geojson import geojson_feature_lines

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2],
                "wkt": ["POINT(1.5 2.5)",
                        "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"],
                "name": ["a", "b"],
            }
        )
    )
    lines = geojson_feature_lines(df, "wkt", "fid", ["name"])
    path = str(tmp_path / "out")
    lines.write.mode("overwrite").text(path)
    back = {r["fid"]: r for r in read_geojson_seq(spark, path).collect()}
    assert back[1]["geom_wkt"] == "POINT(1.5000000 2.5000000)"
    assert back[2]["geom_wkt"].startswith("POLYGON((")
    assert back[1]["properties"]["name"] == "a"
