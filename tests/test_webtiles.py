"""Web tile sources: URL-template plan as column math, WMS BBOX
construction, injectable-fetcher scan vs the synth oracle.

Reference: frmts/wms/minidriver_tms.cpp, minidriver_wms.cpp.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import synth, tiling, webtiles
from gdal_spark.png import encode_png


def _fake_fetcher(url: str) -> bytes:
    # xyz://{z}/{x}/{y} -> deterministic synth tile
    z, x, y = (int(p) for p in url.split("://")[1].split("/"))
    return encode_png(synth.tile_pixels_np(x, y))


def test_xyz_plan_urls(spark):
    plan = webtiles.xyz_tile_plan(
        spark, "https://tiles.example/${z}/${x}/${y}.png", 3,
        (2, 4), (1, 3)).toPandas().sort_values(
            ["tile_y", "tile_x"]).reset_index(drop=True)
    assert len(plan) == 4
    assert plan["url"].iloc[0] == "https://tiles.example/3/2/1.png"
    assert plan["url"].iloc[3] == "https://tiles.example/3/3/2.png"
    # plan is pure column math: no exchanges beyond the range source
    df = webtiles.xyz_tile_plan(spark, "t/{z}/{x}/{y}", 3, (0, 8), (0, 8))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p


def test_wms_bbox(spark):
    plan = webtiles.wms_tile_plan(
        spark, "https://wms.example/ows", "lay", 1, (0, 2), (0, 2)
    ).toPandas()
    u = plan[(plan.tile_x == 0) & (plan.tile_y == 0)]["url"].iloc[0]
    assert "SERVICE=WMS" in u and "LAYERS=lay" in u
    bbox = u.split("BBOX=")[1].split(",")
    assert float(bbox[0]) == webtiles.ORIGIN
    assert float(bbox[1]) == 0.0
    assert float(bbox[2]) == 0.0
    assert float(bbox[3]) == -webtiles.ORIGIN


def test_scan_checksums_match_synth(spark):
    plan = webtiles.xyz_tile_plan(spark, "xyz://{z}/{x}/{y}", 12,
                                  (0, 2), (0, 2))
    tiles = webtiles.read_web_tiles(plan, raster_id="byte_like",
                                    fetcher=_fake_fetcher)
    got = tiling.checksum_table(tiles).toPandas().sort_values(
        ["tile_x", "tile_y"]).reset_index(drop=True)
    import localref
    from gdal_spark import geomlite as G
    exp = {(tx, ty): G.gdal_checksum(synth.tile_pixels_np(tx, ty))
           for tx in range(2) for ty in range(2)}
    assert len(got) == 4
    for r in got.itertuples(index=False):
        assert exp[(r.tile_x, r.tile_y)] == r.checksum


def test_decode_sniffing():
    from gdal_spark.jpeg import encode_jpeg
    img = synth.tile_pixels_np(0, 0)[:32, :32]
    assert webtiles.decode_blob(encode_png(img)).shape[:2] == (32, 32)
    assert webtiles.decode_blob(encode_jpeg(img, 90)).shape[:2] == (32, 32)
    with pytest.raises(NotImplementedError):
        webtiles.decode_blob(b"GIF89a" + b"\x00" * 40)
