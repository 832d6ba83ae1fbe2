"""gdalinfo/ogrinfo report tests (apps/gdalinfo_lib.cpp GDALInfo,
apps/ogrinfo.cpp ReportOnLayer)."""

import numpy as np

from gdal_spark import info, synth
from gdal_spark.synth import tile_pixels_np


def test_gdalinfo_shape_and_stats(spark):
    tiles = synth.tiles_src_df(spark, 2, 2)
    [r] = info.gdalinfo(tiles).collect()
    assert (r.size_x, r.size_y) == (512, 512)
    assert r.dtype == "uint8" and r.crs == "EPSG:3857" and r.tiles == 4
    # origin = top-left tile's geotransform origin
    assert abs(r.origin_x - (-20037508.342789244)) < 1e-6
    assert r.pixel_size_y < 0
    full = np.vstack([
        np.hstack([tile_pixels_np(tx, ty) for tx in range(2)])
        for ty in range(2)]).astype(np.float64)
    assert r["count"] == full.size
    assert r["min"] == full.min() and r["max"] == full.max()
    assert abs(r.mean - full.mean()) < 1e-9
    assert abs(r.stddev - full.std()) < 1e-9


def test_gdalinfo_no_stats(spark):
    tiles = synth.tiles_src_df(spark, 1, 1)
    [r] = info.gdalinfo(tiles, stats=False).collect()
    assert (r.size_x, r.size_y) == (256, 256)
    assert "mean" not in r.asDict()


def test_ogrinfo_extent_and_types(spark):
    df = spark.createDataFrame(
        [(1, "POINT (1 2)"), (2, "POINT (-3 10)"),
         (3, "POLYGON ((0 0, 4 0, 4 4, 0 0))")],
        "fid long, geom_wkt string")
    [r] = info.ogrinfo(df).collect()
    assert r.feature_count == 3
    assert (r.xmin, r.ymin, r.xmax, r.ymax) == (-3.0, 0.0, 4.0, 10.0)
    assert r.geometry_type == "POINT,POLYGON"


def test_ogrinfo_no_geometry(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")

    [r] = info.ogrinfo(df).collect()
    assert r.feature_count == 2 and r.geometry_type == "NONE"


def test_ogrinfo_fields(spark):
    df = spark.createDataFrame(
        [(1, "POINT (0 0)", "x", 2.5, 7)],
        "fid long, geom_wkt string, name string, score double, n int")
    rows = {r.name: r.type for r in info.ogrinfo_fields(df).collect()}
    assert rows == {"name": "String", "score": "Real", "n": "Integer"}


def test_ogrinfo_scientific_notation(spark):
    df = spark.createDataFrame(
        [(1, "POINT (1e2 -2.5e-1)")], "fid long, geom_wkt string")
    [r] = info.ogrinfo(df).collect()
    assert r.xmax == 100.0 and r.ymin == -0.25


def test_ogr_tindex(spark):  # noqa: F811
    rows = []
    for src in range(6):
        for li in range(2):
            for k in range(5):
                x = src * 100 + li * 10 + k
                y = src * 2 + k % 3
                rows.append((f"f{src}.shp", li,
                             f"POINT ({x} {y})"))
    df = spark.createDataFrame(
        rows, "location string, li int, geom_wkt string")
    from gdal_spark.info import ogr_tindex
    out = ogr_tindex(df, layer_idx_col="li").toPandas()
    assert len(out) == 12
    r = out[out["LOCATION"] == "f2.shp,1"].iloc[0]
    assert r["xmin"] == 210.0 and r["xmax"] == 214.0
    assert r["ymin"] == 4.0 and r["ymax"] == 6.0
    assert r["feature_count"] == 5
    assert r["geom_wkt"].startswith("POLYGON ((210")


def test_identify(spark, tmp_path):  # noqa: F811
    import sqlite3
    import struct as _s
    files = {}
    (tmp_path / "a.tif").write_bytes(b"II*\x00" + b"\x00" * 16)
    files[str(tmp_path / "a.tif")] = "GTiff"
    (tmp_path / "b.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    files[str(tmp_path / "b.png")] = "PNG"
    (tmp_path / "c.nc").write_bytes(b"CDF\x01" + b"\x00" * 32)
    files[str(tmp_path / "c.nc")] = "netCDF"
    (tmp_path / "d.shp").write_bytes(_s.pack(">i", 9994) + b"\x00" * 96)
    files[str(tmp_path / "d.shp")] = "ESRI Shapefile"
    con = sqlite3.connect(str(tmp_path / "e.gpkg"))
    con.execute("CREATE TABLE t (a)")
    con.commit()
    con.close()
    files[str(tmp_path / "e.gpkg")] = "GPKG"
    (tmp_path / "f.dxf").write_text("  0\nSECTION\n  2\nENTITIES\n")
    files[str(tmp_path / "f.dxf")] = "DXF"
    (tmp_path / "g.json").write_text('{"type": "FeatureCollection"}')
    files[str(tmp_path / "g.json")] = "GeoJSON"
    (tmp_path / "h.asc").write_text("ncols 4\nnrows 2\n")
    files[str(tmp_path / "h.asc")] = "AAIGrid"
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01\x02\x03")
    files[str(tmp_path / "junk.bin")] = None

    from gdal_spark.info import identify
    out = identify(spark, list(files)).toPandas()
    got = dict(zip(out["path"], out["driver"]))
    for p, want in files.items():
        assert got[p] == want or (want is None and got[p] is None), (
            p, got[p], want)


def test_gdal_create(spark):  # noqa: F811
    import numpy as np
    from gdal_spark.raster import band_stats, gdal_create
    t = gdal_create(spark, 300, 260, bands=2, burn=[7, 9],
                    dtype="uint8", geotransform=[100.0, 0.5, 0, 200.0,
                                                 0, -0.5])
    rows = t.collect()
    # 2x2 tile grid x 2 bands
    assert len(rows) == 8
    edge = [r for r in rows if r["tile_x"] == 1 and r["tile_y"] == 1
            and r["band"] == 2][0]
    assert (edge["width"], edge["height"]) == (44, 4)
    a = np.frombuffer(edge["data"], dtype=np.uint8)
    assert a.size == 44 * 4 and (a == 9).all()
    assert edge["geotransform"][0] == 100.0 + 256 * 0.5
    st = {(r["band"]): r for r in band_stats(t,
                                             exclude_nodata=False).collect()}
    assert st[1]["min"] == 7.0 and st[1]["max"] == 7.0
    assert st[1]["count"] == 300 * 260
    assert st[2]["mean"] == 9.0
