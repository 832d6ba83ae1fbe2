"""MBTiles driver tests (frmts/mbtiles/mbtilesdataset.cpp)."""

import sqlite3

import numpy as np
from pyspark.sql import functions as F

from gdal_spark import mbtiles, synth, tiling


def test_roundtrip_single_band(spark, tmp_path):
    src = synth.tiles_src_df(spark, 2, 2)
    path = str(tmp_path / "t.mbtiles")
    n = mbtiles.write_mbtiles(src, path, name="byte_like")
    assert n == 4
    back = mbtiles.read_mbtiles(spark, path, raster_id="byte_like")
    want = {(r.tile_x, r.tile_y): r.checksum
            for r in tiling.checksum_table(src).collect()}
    got = {(r.tile_x, r.tile_y): r.checksum
           for r in tiling.checksum_table(back).collect()}
    assert got == want


def test_tms_row_flip_in_file(spark, tmp_path):
    """tile_row stored in the file must be TMS: 2^z - 1 - tile_y
    (mbtilesdataset.cpp:2903 write flip)."""
    src = synth.tiles_src_df(spark, 2, 2)  # zoom 12, ty in {0, 1}
    path = str(tmp_path / "f.mbtiles")
    mbtiles.write_mbtiles(src, path)
    con = sqlite3.connect(path)
    rows = sorted(con.execute(
        "SELECT tile_column, tile_row FROM tiles"))
    con.close()
    nrow = 1 << 12
    assert rows == sorted([(tx, nrow - 1 - ty)
                           for tx in (0, 1) for ty in (0, 1)])


def test_multiband_rgb_roundtrip(spark, tmp_path):
    """3 bands stack into one RGB PNG blob per tile and split back."""
    b1 = synth.tiles_src_df(spark, 1, 1)
    b2 = synth.tiles_src_df(spark, 1, 1, seed=9).withColumn(
        "band", F.lit(2).cast("int"))
    b3 = synth.tiles_src_df(spark, 1, 1, seed=13).withColumn(
        "band", F.lit(3).cast("int"))
    src = b1.unionByName(b2).unionByName(b3)
    path = str(tmp_path / "rgb.mbtiles")
    assert mbtiles.write_mbtiles(src, path) == 1  # one blob, 3 bands
    back = mbtiles.read_mbtiles(spark, path)
    assert back.count() == 3
    want = {r.band: r.checksum
            for r in tiling.checksum_table(src).collect()}
    got = {r.band: r.checksum
           for r in tiling.checksum_table(back).collect()}
    assert got == want


def test_metadata_and_geotransform(spark, tmp_path):
    src = synth.tiles_src_df(spark, 1, 1)
    path = str(tmp_path / "m.mbtiles")
    mbtiles.write_mbtiles(src, path, name="demo")
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    con.close()
    assert meta["format"] == "png" and meta["name"] == "demo"
    assert meta["minzoom"] == "12" and meta["maxzoom"] == "12"
    r = mbtiles.read_mbtiles(spark, path).first()
    res = mbtiles.resolution(12)
    gt = list(r.geotransform)
    # global web-mercator frame: x origin -pi*R, top-down from +pi*R
    np.testing.assert_allclose(gt[0], mbtiles.ORIGIN + r.tile_x * 256 * res)
    np.testing.assert_allclose(gt[1], res)
    np.testing.assert_allclose(
        gt[3], -mbtiles.ORIGIN - r.tile_y * 256 * res)


def test_zoom_filter(spark, tmp_path):
    z12 = synth.tiles_src_df(spark, 1, 1)
    z11 = synth.tiles_src_df(spark, 1, 1, zoom=11)
    path = str(tmp_path / "z.mbtiles")
    mbtiles.write_mbtiles(z12.unionByName(z11), path)
    assert mbtiles.read_mbtiles(spark, path).count() == 2
    only12 = mbtiles.read_mbtiles(spark, path, zoom=12)
    assert [r.zoom for r in only12.collect()] == [12]
