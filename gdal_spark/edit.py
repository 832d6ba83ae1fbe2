"""gdal_edit / gdalmove — in-place georeferencing metadata edits
(osgeo_utils/gdal_edit.py, osgeo_utils/gdalmove.py).

The reference rewrites one dataset-level geotransform; in the tile
table every tile carries the dataset geotransform already composed
with its own pixel offset, so an edit is a pure column rewrite: the
dataset transform is first RECOVERED from each tile's own entry
(g0_ds = g0_tile - px*g1 - py*g2, exact since the composition is
affine), the edit applied, and the per-tile composition re-derived.
Everything is whole-stage-codegen column arithmetic — no UDF, no
shuffle, no pixel data touched (the data column passes through
untouched, and Parquet column projection means an edit-only pipeline
never even reads the pixels).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _recover_dataset_gt(px: Column, py: Column) -> list[Column]:
    g = [F.col("geotransform")[i] for i in range(6)]
    return [
        g[0] - px * g[1] - py * g[2],
        g[1],
        g[2],
        g[3] - px * g[4] - py * g[5],
        g[4],
        g[5],
    ]


def _compose(gt: list[Column], px: Column, py: Column) -> Column:
    return F.array(
        gt[0] + px * gt[1] + py * gt[2],
        gt[1],
        gt[2],
        gt[3] + px * gt[4] + py * gt[5],
        gt[4],
        gt[5],
    )


def gdal_edit(
    tiles: DataFrame,
    raster_w: int,
    raster_h: int,
    a_ullr: tuple[float, float, float, float] | None = None,
    a_ulurll: tuple[float, float, float, float, float, float] | None = None,
    tr: tuple[float, float] | None = None,
    unset_gt: bool = False,
    nodata: float | None = None,
    unset_nodata: bool = False,
    a_srs: str | None = None,
) -> DataFrame:
    """gdal_edit.py semantics (osgeo_utils/gdal_edit.py:300-345 for the
    geotransform forms, :350-360 nodata, srs :311): -a_ullr / -a_ulurll
    / -tr / -unsetgt are exclusive, like the reference enforces."""
    if sum(x is not None for x in (a_ullr, a_ulurll, tr)) + unset_gt > 1:
        raise ValueError("-a_ullr, -a_ulurll, -tr and -unsetgt are exclusive")
    if unset_nodata and nodata is not None:
        raise ValueError("-unsetnodata and -a_nodata are exclusive")

    px = (F.col("tile_x") * F.col("width")).cast("double")
    py = (F.col("tile_y") * F.col("height")).cast("double")
    out = tiles
    if a_ullr is not None:
        ulx, uly, lrx, lry = a_ullr
        gt = [F.lit(ulx), F.lit((lrx - ulx) / raster_w), F.lit(0.0),
              F.lit(uly), F.lit(0.0), F.lit((lry - uly) / raster_h)]
        out = out.withColumn("geotransform", _compose(gt, px, py))
    elif a_ulurll is not None:
        ulx, uly, urx, ury, llx, lly = a_ulurll
        gt = [F.lit(ulx), F.lit((urx - ulx) / raster_w),
              F.lit((llx - ulx) / raster_h),
              F.lit(uly), F.lit((ury - uly) / raster_w),
              F.lit((lly - uly) / raster_h)]
        out = out.withColumn("geotransform", _compose(gt, px, py))
    elif tr is not None:
        xres, yres = tr
        ds = _recover_dataset_gt(px, py)
        ds[1] = F.lit(float(xres))
        ds[5] = F.lit(float(yres))
        out = out.withColumn("geotransform", _compose(ds, px, py))
    elif unset_gt:
        # the reference's non-GTiff default identity (gdal_edit.py:345)
        gt = [F.lit(0.0), F.lit(1.0), F.lit(0.0),
              F.lit(0.0), F.lit(0.0), F.lit(1.0)]
        out = out.withColumn("geotransform", _compose(gt, px, py))
    if nodata is not None:
        out = out.withColumn("nodata", F.lit(float(nodata)))
    elif unset_nodata:
        out = out.withColumn("nodata", F.lit(None).cast("double"))
    if a_srs is not None:
        out = out.withColumn("crs", F.lit(a_srs))
    return out


def _merc_inv(x: float, y: float, radius: float = 6378137.0):
    lon = x / radius * 180.0 / math.pi
    lat = (2.0 * math.atan(math.exp(y / radius)) - math.pi / 2.0) \
        * 180.0 / math.pi
    return lon, lat


def gdalmove(tiles: DataFrame, raster_w: int, raster_h: int,
             corner_transform=None) -> DataFrame:
    """gdalmove.py: re-derive the dataset geotransform by transforming
    the UL/LL/UR corners and fitting the reference's exact 3-point
    form (osgeo_utils/gdalmove.py:104-121), then recompose per tile.
    `corner_transform(x, y) -> (x', y')` defaults to inverse Web
    Mercator (EPSG:3857 -> EPSG:4326), the move the synthetic tile
    pyramids need. Only the three corner points cross the driver —
    pixel data and per-tile rows never leave the executors."""
    first = tiles.select("geotransform", "tile_x", "tile_y",
                         "width", "height").orderBy("tile_x", "tile_y").first()
    g = list(first["geotransform"])
    px0 = first["tile_x"] * first["width"]
    py0 = first["tile_y"] * first["height"]
    ds_gt = [g[0] - px0 * g[1] - py0 * g[2], g[1], g[2],
             g[3] - px0 * g[4] - py0 * g[5], g[4], g[5]]
    tf = corner_transform or _merc_inv

    def apply_gt(gt, i, j):
        return (gt[0] + i * gt[1] + j * gt[2], gt[3] + i * gt[4] + j * gt[5])

    ul = tf(*apply_gt(ds_gt, 0, 0))
    ll = tf(*apply_gt(ds_gt, 0, raster_h))
    ur = tf(*apply_gt(ds_gt, raster_w, 0))
    new_gt = [
        ul[0], (ur[0] - ul[0]) / raster_w, (ll[0] - ul[0]) / raster_h,
        ul[1], (ur[1] - ul[1]) / raster_w, (ll[1] - ul[1]) / raster_h,
    ]
    px = (F.col("tile_x") * F.col("width")).cast("double")
    py = (F.col("tile_y") * F.col("height")).cast("double")
    gt_cols = [F.lit(float(v)) for v in new_gt]
    return tiles.withColumn("geotransform", _compose(gt_cols, px, py))
