import numpy as np
from pyspark.sql import Row

from gdal_spark.fftops import fft2d, magphase, real_cast
from gdal_spark.synth import TILE_SCHEMA


def _tiles(spark, img: np.ndarray, tile: int):
    H, W = img.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            sub = img[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            rows.append(
                Row(raster_id="src", band=1, zoom=0, tile_x=tx, tile_y=ty,
                    width=tile, height=tile, dtype=str(img.dtype),
                    nodata=-1.0, crs="",
                    geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                    data=bytearray(sub.tobytes()))
            )
    return spark.createDataFrame(rows, schema=TILE_SCHEMA)


def _assemble(rows, tile, H, W, dtype):
    out = np.zeros((H, W), dtype=dtype)
    for r in rows:
        arr = np.frombuffer(bytes(r["data"]), dtype=dtype).reshape(tile, tile)
        out[r["tile_y"] * tile:(r["tile_y"] + 1) * tile,
            r["tile_x"] * tile:(r["tile_x"] + 1) * tile] = arr
    return out


def test_fft2d_matches_numpy_nonsquare(spark):
    """Distributed transpose-method FFT == np.fft.fft2 bit-for-bit on
    a non-square 3x2-tile grid (strip order and re-split indexing)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
    out = fft2d(_tiles(spark, img, 8)).collect()
    got = _assemble(out, 8, 16, 24, np.complex128)
    assert np.array_equal(got, np.fft.fft2(img.astype(np.complex128)))


def test_fft_roundtrip_recovers_source(spark):
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    back = real_cast(fft2d(fft2d(_tiles(spark, img, 8)), inverse=True))
    got = _assemble(back.collect(), 8, 16, 16, np.uint8)
    assert np.array_equal(got, img)


def test_magphase(spark):
    z = (np.arange(64, dtype=np.float64).reshape(8, 8)
         + 1j * np.ones((8, 8))).astype(np.complex128)
    rows = []
    rows.append(
        Row(raster_id="c", band=1, zoom=0, tile_x=0, tile_y=0,
            width=8, height=8, dtype="complex128", nodata=-1.0, crs="",
            geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
            data=bytearray(z.tobytes()))
    )
    df = spark.createDataFrame(rows, schema=TILE_SCHEMA)
    out = {r["raster_id"]: r for r in magphase(df).collect()}
    mag = np.frombuffer(bytes(out["c_mag"]["data"]), dtype=np.float64).reshape(8, 8)
    ph = np.frombuffer(bytes(out["c_phase"]["data"]), dtype=np.float64).reshape(8, 8)
    assert np.allclose(mag, np.abs(z))
    assert np.allclose(ph, np.angle(z))
