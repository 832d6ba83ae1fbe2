"""Golden tests for the second wave of raster operators: DEM
aspect/TRI/TPI/roughness (focal, halo exchange), weighted-Brovey
pansharpen, and gdaltindex footprints — oracle = plain numpy over the
assembled mosaic."""

import numpy as np
import pandas as pd

from gdal_spark import raster as R
from gdal_spark import synth

NTX, NTY = 2, 2


def _mosaic(seed=42):
    m = np.zeros((NTY * 256, NTX * 256), dtype=np.float64)
    for tx in range(NTX):
        for ty in range(NTY):
            m[ty * 256 : (ty + 1) * 256, tx * 256 : (tx + 1) * 256] = (
                synth.tile_pixels_np(tx, ty, seed=seed)
            )
    return m


def _nb(pad):
    return np.stack(
        [pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:],
         pad[1:-1, :-2], pad[1:-1, 2:],
         pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]]
    )


def _assemble(rows, dtype=np.float64):
    m = np.zeros((NTY * 256, NTX * 256), dtype=np.float64)
    for r in rows:
        arr = np.frombuffer(r["data"], dtype=dtype).reshape(256, 256)
        m[r["tile_y"] * 256 : (r["tile_y"] + 1) * 256,
          r["tile_x"] * 256 : (r["tile_x"] + 1) * 256] = arr
    return m


def test_tri_riley_with_halo(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    got = _assemble(R.tri(tiles, res=1.0).collect())
    pad = np.pad(_mosaic(), 1, mode="edge")
    d = _nb(pad) - pad[1:-1, 1:-1][None]
    exp = np.sqrt((d * d).sum(axis=0))
    assert np.allclose(got, exp)


def test_tpi_and_roughness(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    pad = np.pad(_mosaic(), 1, mode="edge")
    nb = _nb(pad)
    c = pad[1:-1, 1:-1]
    got_tpi = _assemble(R.tpi(tiles, res=1.0).collect())
    assert np.allclose(got_tpi, c - nb.mean(axis=0))
    got_rough = _assemble(R.roughness(tiles, res=1.0).collect())
    exp = np.maximum(nb.max(axis=0), c) - np.minimum(nb.min(axis=0), c)
    assert np.allclose(got_rough, exp)


def test_aspect_compass_range(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    got = _assemble(R.aspect(tiles, res=1.0).collect())
    valid = got[got != -9999.0]
    assert ((valid >= 0.0) & (valid < 360.0)).all()
    # oracle on the interior
    pad = np.pad(_mosaic(), 1, mode="edge")
    nw, n, ne = pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:]
    w_, e = pad[1:-1, :-2], pad[1:-1, 2:]
    sw, s, se = pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]
    dzdx = ((ne + 2 * e + se) - (nw + 2 * w_ + sw)) / 8.0
    dzdy = ((sw + 2 * s + se) - (nw + 2 * n + ne)) / 8.0
    az = np.degrees(np.arctan2(dzdy, -dzdx))
    compass = np.where(az > 90.0, 450.0 - az, 90.0 - az)
    compass = np.where(compass == 360.0, 0.0, compass)
    exp = np.where((dzdx == 0) & (dzdy == 0), -9999.0, compass)
    assert np.allclose(got, exp)


def test_pansharpen_brovey(spark):
    from pyspark.sql import functions as F

    ms = synth.tiles_src_df(spark, 1, 1, raster_id="ms")  # band 1
    # fake a second band: squared pixels via pixel_calc
    ms2 = R.pixel_calc(ms, "square", out_dtype="float64").withColumn(
        "band", F.lit(2)
    )
    ms_all = ms.unionByName(ms2)
    pan = synth.tiles_src_df(spark, 1, 1, raster_id="pan", seed=7)
    out = R.pansharpen(pan, ms_all, weights=[0.5, 0.5]).collect()
    assert len(out) == 2
    b1_tile = synth.tile_pixels_np(0, 0).astype(np.float64)
    b2_tile = b1_tile**2
    pan_tile = synth.tile_pixels_np(0, 0, seed=7).astype(np.float64)
    pseudo = 0.5 * b1_tile + 0.5 * b2_tile
    ratio = pan_tile / pseudo
    for r in out:
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(256, 256)
        exp = (b1_tile if r["band"] == 1 else b2_tile) * ratio
        assert np.allclose(arr, exp)


def test_tile_index(spark):
    tiles = synth.tiles_src_df(spark, 3, 2, zoom=12)
    idx = R.tile_index(tiles).collect()
    assert len(idx) == 1
    row = idx[0]
    gt0 = tiles.filter((tiles.tile_x == 0) & (tiles.tile_y == 0)).first()["geotransform"]
    res = gt0[1]
    assert abs((row["xmax"] - row["xmin"]) - 3 * 256 * res) < 1e-6
    assert abs((row["ymax"] - row["ymin"]) - 2 * 256 * res) < 1e-6
    assert row["geom_wkt"].startswith("POLYGON((")
