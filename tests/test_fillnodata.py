"""fill_nodata golden test: distributed halo-block version vs the
shared windowed-IDW kernel run single-node over the full mosaic."""

import numpy as np
from pyspark.sql import Row

from gdal_spark import raster as R
from gdal_spark.raster import idw_fill_window
from gdal_spark.synth import TILE_SCHEMA

NODATA = -1.0


def _tiles_df(spark, mosaic, tile):
    H, W = mosaic.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            sub = mosaic[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            rows.append(
                Row(
                    raster_id="r", band=1, zoom=0, tile_x=tx, tile_y=ty,
                    width=tile, height=tile, dtype="float64", nodata=NODATA,
                    crs="", geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                    data=bytearray(sub.astype(np.float64).tobytes()),
                )
            )
    return spark.createDataFrame(rows, schema=TILE_SCHEMA)


def test_fill_nodata_matches_single_node(spark):
    rng = np.random.RandomState(3)
    m = rng.randint(1, 200, size=(64, 64)).astype(np.float64)
    # holes: one crossing the tile border, one interior, one isolated px
    m[28:36, 28:36] = NODATA
    m[5:9, 50:55] = NODATA
    m[60, 3] = NODATA
    h = 6
    out = R.fill_nodata(_tiles_df(spark, m, 32), search=h).collect()
    got = np.zeros((64, 64))
    for r in out:
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(32, 32)
        got[r["tile_y"] * 32 : (r["tile_y"] + 1) * 32,
            r["tile_x"] * 32 : (r["tile_x"] + 1) * 32] = arr
    pad = np.full((64 + 2 * h, 64 + 2 * h), np.nan)
    pad[h : h + 64, h : h + 64] = m
    exp = idw_fill_window(pad, h, NODATA)
    assert np.allclose(got, exp, equal_nan=True)
    # holes actually filled (all within search of valid data)
    assert (got != NODATA).all()


def test_fill_nodata_out_of_range_keeps_nodata(spark):
    m = np.full((32, 32), NODATA)
    m[0, 0] = 7.0
    out = R.fill_nodata(_tiles_df(spark, m, 32), search=4).collect()
    arr = np.frombuffer(out[0]["data"], dtype=np.float64).reshape(32, 32)
    assert arr[0, 1] != NODATA  # within range of the lone valid pixel
    assert arr[31, 31] == NODATA  # far beyond search radius


def test_fill_smoothing_matches_global(spark):
    """-si smoothing across tile borders equals the global single-node
    computation (halo widens by one ring per iteration)."""
    import numpy as np

    from gdal_spark import synth
    from gdal_spark.raster import fill_nodata, fill_smooth_window
    from gdal_spark.tiling import _decode

    tiles = synth.checker_tiles_df(spark, 2, 2, tile_px=64)

    def punch(batches):
        for pdf in batches:
            pdf = pdf.copy()
            new = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.data, np.uint8).reshape(64, 64)
                arr = arr.astype(np.float64) * 100.0
                # hole touching the tile's bottom edge so the fill AND
                # the smoothing both cross tile borders
                arr[52:64, 40:60] = -1.0
                new.append(arr.tobytes())
            pdf["data"] = new
            pdf["dtype"] = "float64"
            pdf["nodata"] = -1.0
            yield pdf

    punched = tiles.mapInPandas(punch, schema=tiles.schema)
    rows = fill_nodata(punched, search=6, smoothing=2).collect()
    got = np.zeros((128, 128))
    for r in rows:
        a = _decode(r.data, r.dtype, 64, 64)
        got[r.tile_y * 64:(r.tile_y + 1) * 64,
            r.tile_x * 64:(r.tile_x + 1) * 64] = a

    gp = synth.checker_np(128).astype(np.float64) * 100.0
    for ty in range(2):
        for tx in range(2):
            gp[ty * 64 + 52:ty * 64 + 64, tx * 64 + 40:tx * 64 + 60] = -1.0
    hx = 6 + 2
    pad = np.full((128 + 2 * hx, 128 + 2 * hx), np.nan)
    pad[hx:-hx, hx:-hx] = gp
    ref = fill_smooth_window(pad, 6, 2, -1.0, 2.0)
    assert np.allclose(got, ref, equal_nan=True)
    # and smoothing actually changed the filled region vs plain fill
    pad2 = np.full((128 + 12, 128 + 12), np.nan)
    pad2[6:-6, 6:-6] = gp
    plain = fill_smooth_window(pad2, 6, 0, -1.0, 2.0)
    assert not np.allclose(ref, plain)
