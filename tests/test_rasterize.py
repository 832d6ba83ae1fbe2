"""Rasterize (vector -> raster burn) golden test: pixel-center
first-match burn vs the closed-form rect-zone assignment, plus the
per-tile value-count partial."""

import numpy as np

from gdal_spark import derived as DRV
from gdal_spark import raster as RST
from gdal_spark.index import zone_index


def _expected_grid(ntx, nty, tile_px, g=8):
    k, m = 2654435761, 4294967296
    w, h = ntx * tile_px, nty * tile_px
    rx, ry = 360.0 / w, 170.0 / h
    gx = np.arange(w)
    gy = np.arange(h)
    lon = -180.0 + (gx + 0.5) * rx
    lat = 85.0 - (gy + 0.5) * ry
    LON, LAT = np.meshgrid(lon, lat)
    zi = np.floor((LON + 180.0) / (360.0 / g)).astype(np.int64)
    zj = np.floor((LAT + 85.0) / (170.0 / g)).astype(np.int64)
    zid = zi * g + zj
    hole = (zid * k % m) % 10 == 0
    return np.where(hole, -1, zid)


def test_rasterize_matches_closed_form(spark):
    ntx = nty = 2
    tile_px = 64
    zidx = zone_index(spark, DRV.rect_zone_grid(8))
    burned = RST.rasterize_zones(spark, zidx, ntx, nty, tile_px=tile_px)
    rows = burned.collect()
    exp = _expected_grid(ntx, nty, tile_px)
    assert len(rows) == ntx * nty
    for r in rows:
        arr = np.frombuffer(r["data"], dtype=np.int32).reshape(tile_px, tile_px)
        sub = exp[
            r["tile_y"] * tile_px : (r["tile_y"] + 1) * tile_px,
            r["tile_x"] * tile_px : (r["tile_x"] + 1) * tile_px,
        ]
        assert np.array_equal(arr, sub)


def test_value_counts(spark):
    ntx = nty = 2
    tile_px = 64
    zidx = zone_index(spark, DRV.rect_zone_grid(8))
    burned = RST.rasterize_zones(spark, zidx, ntx, nty, tile_px=tile_px)
    vc = RST.value_counts(burned).toPandas()
    exp = _expected_grid(ntx, nty, tile_px)
    got_total = vc.groupby(["tile_x", "tile_y"])["npix"].sum()
    assert (got_total == tile_px * tile_px).all()
    # spot-check one tile against numpy
    sub = exp[0:tile_px, 0:tile_px]
    vals, cnts = np.unique(sub, return_counts=True)
    t00 = vc[(vc.tile_x == 0) & (vc.tile_y == 0)].sort_values("value")
    assert t00["value"].tolist() == vals.tolist()
    assert t00["npix"].tolist() == cnts.tolist()
