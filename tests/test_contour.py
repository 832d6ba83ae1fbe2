"""Contour (marching squares) golden tests: ramp with known iso-lines,
and distributed totals vs single-node evaluation over the full mosaic
(cross-tile border cells must be counted exactly once)."""

import numpy as np
import pandas as pd
from pyspark.sql import Row

from gdal_spark import synth
from gdal_spark.contour import cell_segments, contour_totals
from gdal_spark.synth import TILE_SCHEMA


def _tiles_df(spark, mosaic: np.ndarray, tile: int):
    H, W = mosaic.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            sub = mosaic[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            rows.append(
                Row(
                    raster_id="r", band=1, zoom=0, tile_x=tx, tile_y=ty,
                    width=tile, height=tile, dtype="float64", nodata=-1.0,
                    crs="", geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                    data=bytearray(sub.astype(np.float64).tobytes()),
                )
            )
    return spark.createDataFrame(rows, schema=TILE_SCHEMA)


def _single_node_totals(mosaic: np.ndarray, levels):
    A = mosaic[:-1, :-1].ravel()
    B = mosaic[:-1, 1:].ravel()
    C = mosaic[1:, 1:].ravel()
    D = mosaic[1:, :-1].ravel()
    out = {}
    for lv in levels:
        cnt, ln = cell_segments(A, B, C, D, lv)
        out[lv] = (int(cnt.sum()), float(ln.sum()))
    return out


def test_contour_vertical_ramp(spark):
    m = np.tile(np.arange(64, dtype=np.float64), (64, 1))
    got = contour_totals(_tiles_df(spark, m, 32), [10.5, 40.5]).toPandas()
    for _, r in got.iterrows():
        assert r["n_segments"] == 63
        assert abs(r["length"] - 63.0) < 1e-9


def test_contour_matches_single_node(spark):
    m = np.zeros((64, 64))
    for tx in range(2):
        for ty in range(2):
            m[ty * 32 : (ty + 1) * 32, tx * 32 : (tx + 1) * 32] = (
                synth.tile_pixels_np(tx, ty, 32, 32).astype(np.float64)
            )
    levels = [64.0, 128.5, 200.0]
    got = (
        contour_totals(_tiles_df(spark, m, 32), levels)
        .toPandas()
        .set_index("level")
        .sort_index()
    )
    exp = _single_node_totals(m, levels)
    for lv in levels:
        assert got.loc[lv, "n_segments"] == exp[lv][0]
        assert abs(got.loc[lv, "length"] - exp[lv][1]) < 1e-6


def test_node_key_no_cross_level_collision(spark):
    # ADVICE r2: the old bit-packed key collided (level0, x=1024) with
    # (level1, x=0); the hash key must keep them distinct.
    from gdal_spark.contour import _node_key
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        _node_key(F.lit(0), F.lit(1024.0), F.lit(7.0)).alias("a"),
        _node_key(F.lit(1), F.lit(0.0), F.lit(7.0)).alias("b"),
        _node_key(F.lit(0), F.lit(1024.0), F.lit(7.0)).alias("a2"),
    )
    r = df.collect()[0]
    assert r["a"] != r["b"]
    assert r["a"] == r["a2"]


def test_contour_polygons_dome(spark):
    from gdal_spark.contour import contour_polygons
    from gdal_spark.synth import dome_tiles_df

    tiles = dome_tiles_df(spark, 2, 2, tile_px=256)  # 512px dome
    out = contour_polygons(tiles, [64.0, 128.0, 192.0]).toPandas()
    out = out.sort_values("band_idx").reset_index(drop=True)
    assert list(out.band_idx) == [0, 1, 2, 3]
    # open ends are NULL like gdal_contour -p
    assert pd.isna(out.elev_min[0]) and pd.isna(out.elev_max[3])
    assert out.elev_min[1] == 64.0 and out.elev_max[1] == 128.0
    # bands partition the raster exactly
    assert out.npix.sum() == 512 * 512
    # annulus bands carry a hole ring, the top disk does not
    assert out.wkt[2].count("(") > out.wkt[3].count("(")
    assert all(w.startswith("POLYGON(") for w in out.wkt)


def test_contour_levels_interval_offset(spark):
    """-i/-off level generation (level_generator.h:128-183): levels =
    k*interval + offset covering [band_min, band_max]."""
    import numpy as np

    import localref

    from gdal_spark import synth
    from gdal_spark.contour import contour_levels

    tiles = synth.tiles_src_df(spark, 2, 2)
    g = localref.global_mosaic(2, 2).astype(np.float64)
    lv = contour_levels(tiles, interval=32.0, offset=10.0)
    assert lv, "some levels generated"
    assert all((v - 10.0) % 32.0 == 0 for v in lv)
    assert lv[0] >= g.min() and lv[-1] <= g.max()
    assert lv[0] - 32.0 < g.min() and lv[-1] + 32.0 > g.max()


def test_contour_levels_exp_base(spark):
    """-e level generation (ExponentialLevelRangeIterator): powers of
    the base inside the band range."""
    import numpy as np

    import localref

    from gdal_spark import synth
    from gdal_spark.contour import contour_levels

    tiles = synth.tiles_src_df(spark, 2, 2)
    g = localref.global_mosaic(2, 2).astype(np.float64)
    lv = contour_levels(tiles, exp_base=2.0)
    assert lv
    for v in lv:
        k = np.log2(v)
        assert abs(k - round(k)) < 1e-12
        assert g.min() <= v <= g.max()
