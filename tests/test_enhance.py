"""Golden tests for gdalenhance -equalize and gdal_lut
(apps/gdalenhance.cpp:493-660; osgeo_utils/samples/gdal_lut.py) —
oracle = localref's sequential numpy mirrors over the assembled
mosaic, so the distributed histogram -> LUT -> map-only apply path is
checked end to end including tile boundaries."""

import numpy as np

import localref
from gdal_spark import enhance, synth

NTX, NTY = 3, 2


def _assemble(rows):
    m = np.zeros((NTY * 256, NTX * 256), dtype=np.uint8)
    for r in rows:
        arr = np.frombuffer(r["data"], dtype=np.uint8).reshape(256, 256)
        m[r["tile_y"] * 256 : (r["tile_y"] + 1) * 256,
          r["tile_x"] * 256 : (r["tile_x"] + 1) * 256] = arr
    return m


def test_enhance_equalize_matches_sequential(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    got = _assemble(enhance.enhance_equalize(tiles).collect())
    want = localref.enhance_equalize_np(localref.global_mosaic(NTX, NTY))
    assert np.array_equal(got, want)


def test_equalize_flattens_histogram(spark):
    """The point of equalization: the output CDF is ~linear — every
    output-value quartile holds ~25% of pixels (within one LUT step)."""
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    out = _assemble(enhance.enhance_equalize(tiles).collect())
    n = out.size
    cdf = np.cumsum(np.bincount(out.ravel(), minlength=256)) / n
    # CDF at value v should be close to (v+1)/256 for occupied values
    dev = np.max(np.abs(cdf - (np.arange(256) + 1) / 256.0))
    assert dev < 0.05


def test_apply_lut_passthrough_beyond_table(spark):
    tiles = synth.tiles_src_df(spark, NTX, NTY)
    lut = localref.gamma_lut(100)  # short table: values >= 100 unaltered
    got = _assemble(enhance.apply_lut(tiles, lut).collect())
    src = localref.global_mosaic(NTX, NTY).astype(np.int64)
    table = np.asarray(lut, dtype=np.int64)
    want = np.where(src < 100, table[np.minimum(src, 99)], src)
    want = np.clip(want, 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)
    # beyond-table pixels really did pass through
    assert np.array_equal(got[src >= 100], src[src >= 100].astype(np.uint8))


def test_val_repl_preserves_dtype(spark):
    """val_repl.py keeps the band type (float32 in, float32 out) and
    touches only matching pixels."""
    import numpy as np
    from pyspark.sql import Row

    from gdal_spark.enhance import val_repl
    from gdal_spark.synth import TILE_SCHEMA

    arr = np.array([[1.5, 2.0], [2.0, 3.25]], dtype=np.float32)
    df = spark.createDataFrame(
        [Row(raster_id="f", band=1, zoom=0, tile_x=0, tile_y=0,
             width=2, height=2, dtype="float32", nodata=-1.0, crs="",
             geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
             data=bytearray(arr.tobytes()))],
        schema=TILE_SCHEMA,
    )
    r = val_repl(df, 2.0, -9.0).collect()[0]
    assert r["dtype"] == "float32"
    out = np.frombuffer(bytes(r["data"]), dtype=np.float32).reshape(2, 2)
    assert out.tolist() == [[1.5, -9.0], [-9.0, 3.25]]


def test_classify_later_class_wins_on_overlap(spark):
    """classify.py applies classes sequentially: overlapping ranges
    resolve to the LAST matching class (numpy.choose overwrite order)."""
    import numpy as np
    from pyspark.sql import Row

    from gdal_spark.enhance import classify
    from gdal_spark.synth import TILE_SCHEMA

    arr = np.array([[5, 15], [25, 99]], dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(raster_id="b", band=1, zoom=0, tile_x=0, tile_y=0,
             width=2, height=2, dtype="uint8", nodata=-1.0, crs="",
             geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
             data=bytearray(arr.tobytes()))],
        schema=TILE_SCHEMA,
    )
    r = classify(df, [(1, 0, 20), (2, 15, 30)]).collect()[0]
    out = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(2, 2)
    # 15 is in both ranges -> class 2 (later wins); 99 unclassified -> 0
    assert out.tolist() == [[1, 2], [2, 0]]
