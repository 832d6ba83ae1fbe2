"""Raster analytics golden tests: stats, histogram, locate, pixel calc,
focal hillshade/slope with halo exchange (oracle = plain numpy over the
assembled mosaic — the single-node reference computation)."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import Row

from gdal_spark import raster as R
from gdal_spark import synth, tiling

NTX, NTY = 3, 2


def _mosaic(seed=42):
    m = np.zeros((NTY * 256, NTX * 256), dtype=np.float64)
    for tx in range(NTX):
        for ty in range(NTY):
            m[ty * 256 : (ty + 1) * 256, tx * 256 : (tx + 1) * 256] = (
                synth.tile_pixels_np(tx, ty, seed=seed)
            )
    return m


def test_band_stats(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    got = R.band_stats(tiles).first()
    m = _mosaic()
    assert got["count"] == m.size
    assert got["min"] == m.min() and got["max"] == m.max()
    assert abs(got["mean"] - m.mean()) < 1e-9
    assert abs(got["stddev"] - m.std()) < 1e-9


def test_histogram(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    got = R.histogram(tiles, 0.0, 256.0, buckets=256).first()["counts"]
    exp, _ = np.histogram(_mosaic().ravel(), bins=np.linspace(0.0, 256.0, 257))
    assert got == exp.tolist()
    assert sum(got) == _mosaic().size


def test_locate(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY, zoom=12)
    gt = tiles.filter((tiles.tile_x == 0) & (tiles.tile_y == 0)).select("geotransform").first()[0]
    x0, res, y0 = gt[0], gt[1], gt[3]
    m = _mosaic()
    pts = []
    for q, (gpx, gpy) in enumerate([(5, 7), (300, 200), (700, 400), (767, 511)]):
        pts.append(Row(q_id=q, x=x0 + (gpx + 0.5) * res, y=y0 - (gpy + 0.5) * res,
                       exp=float(m[gpy, gpx])))
    pdf = spark.createDataFrame(pts)
    got = R.locate(tiles, pdf.drop("exp"), (x0, y0), res).toPandas().set_index("q_id")
    for p in pts:
        assert got.loc[p.q_id, "value"] == p.exp


def test_pixel_calc(spark):
    tiles = synth.tiles_src_df(spark, 2, 1)
    out = R.pixel_calc(tiles, "square", out_dtype="float64")
    got = out.filter(out.tile_x == 1).first()
    arr = np.frombuffer(got["data"], dtype=np.float64).reshape(256, 256)
    exp = synth.tile_pixels_np(1, 0).astype(np.float64) ** 2
    assert np.array_equal(arr, exp)


def _pad_oracle(m):
    return np.pad(m, 1, mode="edge")


def test_slope_focal_with_halo(spark):
    """Interior tile borders must use NEIGHBOR pixels (halo exchange),
    not edge replication — oracle computes over the full mosaic."""
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    res = 10.0
    got = R.slope(tiles, res=res).toPandas()
    m = _mosaic()
    pad = _pad_oracle(m)
    nw, n, ne = pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:]
    w_, e = pad[1:-1, :-2], pad[1:-1, 2:]
    sw, s, se = pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]
    dzdx = ((ne + 2 * e + se) - (nw + 2 * w_ + sw)) / (8.0 * res)
    dzdy = ((sw + 2 * s + se) - (nw + 2 * n + ne)) / (8.0 * res)
    exp_full = np.degrees(np.arctan(np.sqrt(dzdx**2 + dzdy**2)))
    for r in got.itertuples(index=False):
        arr = np.frombuffer(r.data, dtype=np.float64).reshape(256, 256)
        sub = exp_full[r.tile_y * 256 : (r.tile_y + 1) * 256,
                       r.tile_x * 256 : (r.tile_x + 1) * 256]
        assert np.allclose(arr, sub, atol=1e-12), (r.tile_x, r.tile_y)


def test_hillshade_golden_checksum(spark):
    tiles = synth.tiles_src_df(spark, 2, 2)
    hs = R.hillshade(tiles, res=10.0)
    cks = tiling.checksum_table(hs).toPandas()
    assert len(cks) == 4
    # deterministic digests: recompute locally
    m = np.zeros((512, 512))
    for tx in range(2):
        for ty in range(2):
            m[ty * 256 : (ty + 1) * 256, tx * 256 : (tx + 1) * 256] = (
                synth.tile_pixels_np(tx, ty)
            )
    pad = _pad_oracle(m)
    nw, n, ne = pad[:-2, :-2], pad[:-2, 1:-1], pad[:-2, 2:]
    w_, e = pad[1:-1, :-2], pad[1:-1, 2:]
    sw, s, se = pad[2:, :-2], pad[2:, 1:-1], pad[2:, 2:]
    dzdx = ((ne + 2 * e + se) - (nw + 2 * w_ + sw)) / 80.0
    dzdy = ((sw + 2 * s + se) - (nw + 2 * n + ne)) / 80.0
    slope_ = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    aspect = np.arctan2(dzdy, -dzdx)
    az = math.radians(360.0 - 315.0 + 90.0)
    alt = math.radians(45.0)
    shade = np.sin(alt) * np.cos(slope_) + np.cos(alt) * np.sin(slope_) * np.cos(az - aspect)
    exp_img = np.clip(np.floor(1.0 + 254.0 * np.maximum(shade, 0.0) + 0.5), 0, 255).astype(np.uint8)
    from gdal_spark import geomlite as G

    for r in cks.itertuples(index=False):
        sub = exp_img[r.tile_y * 256 : (r.tile_y + 1) * 256,
                      r.tile_x * 256 : (r.tile_x + 1) * 256]
        assert r.checksum == G.gdal_checksum(sub), (r.tile_x, r.tile_y)


def test_pixel_calc_vrt_singles(spark):
    """VRT real-branch funcs (pixelfunctions.cpp) on negated input."""
    signed = R.pixel_calc(synth.tiles_src_df(spark, 2, 1), "negate")
    s = -synth.tile_pixels_np(1, 0).astype(np.float64)
    exp = {
        "mod": np.abs(s),
        "phase": np.where(s < 0, np.pi, 0.0),
        "intensity": s * s,
        "dB": 20.0 * np.log10(np.maximum(np.abs(s), 1e-30)),
        "dB2amp": np.power(10.0, s / 20.0),
        "imag": np.zeros_like(s),
    }
    for fname, e in exp.items():
        out = R.pixel_calc(signed, fname)
        got = out.filter(out.tile_x == 1).first()
        arr = np.frombuffer(got["data"], dtype=np.float64).reshape(256, 256)
        assert np.allclose(arr, e), fname


def test_pixel_calc_multi_and_complex(spark):
    from pyspark.sql import functions as F

    b1 = synth.tiles_src_df(spark, 2, 1)
    b2 = synth.tiles_src_df(spark, 2, 1, seed=7).withColumn("band", F.lit(2))
    tiles = b1.unionByName(b2)
    g1 = synth.tile_pixels_np(0, 0).astype(np.float64)
    g2 = synth.tile_pixels_np(0, 0, seed=7).astype(np.float64)

    def grab(df, band=1, tx=0):
        r = df.filter((df.tile_x == tx) & (df.band == band)).first()
        return np.frombuffer(r["data"], dtype=np.float64).reshape(256, 256)

    assert np.array_equal(grab(R.pixel_calc_multi(tiles, "sum")), g1 + g2)
    assert np.array_equal(grab(R.pixel_calc_multi(tiles, "diff")), g1 - g2)
    assert np.array_equal(grab(R.pixel_calc_multi(tiles, "mul")), g1 * g2)
    # complex pair: bands (1,2) = (re, im)
    assert np.allclose(grab(R.pixel_calc_complex(tiles, "mod")),
                       np.hypot(g1, g2))
    assert np.allclose(grab(R.pixel_calc_complex(tiles, "phase")),
                       np.arctan2(g2, g1))
    conj = R.pixel_calc_complex(tiles, "conj")
    assert np.array_equal(grab(conj, band=1), g1)
    assert np.array_equal(grab(conj, band=2), -g2)
