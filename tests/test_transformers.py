"""TPS (alg/gdal_tps.cpp) and RPC (alg/gdal_rpc.cpp) transformers."""

import numpy as np
import pytest

from gdal_spark.rpc import RPCTransformer
from gdal_spark.tps import fit_tps

GCPS = [
    (0.0, 0.0, -180.0, 85.0), (100.0, 0.0, -144.0, 84.0),
    (0.0, 100.0, -179.0, 68.0), (100.0, 100.0, -143.0, 67.5),
    (50.0, 20.0, -162.2, 81.7), (20.0, 80.0, -172.5, 71.2),
    (80.0, 50.0, -151.0, 76.0),
]

RPC = dict(
    line_num=[0.002, 0.012, -1.004, 0.001, 0.0007, 0.0, 0.0, 0.0003,
              0.0011, 0.0] + [0.0] * 10,
    line_den=[1.0, 0.0002, -0.0005, 0.0, 0.0001] + [0.0] * 15,
    samp_num=[-0.001, 1.002, 0.009, 0.0005, -0.0006, 0.0, 0.0, 0.0009,
              -0.0004, 0.0] + [0.0] * 10,
    samp_den=[1.0, -0.0003, 0.0004, 0.0, 0.0002] + [0.0] * 15,
    long_off=-160.0, long_scale=20.0, lat_off=75.0, lat_scale=10.0,
    height_off=0.0, height_scale=100.0,
    line_off=2048.0, line_scale=2048.0, samp_off=2048.0, samp_scale=2048.0,
)


def test_tps_interpolates_gcps_exactly():
    t = fit_tps(GCPS)
    g = np.asarray(GCPS)
    gx, gy = t.forward_np(g[:, 0], g[:, 1])
    # thin-plate splines INTERPOLATE (unlike the lstsq polynomial fit)
    assert np.allclose(gx, g[:, 2], atol=1e-8)
    assert np.allclose(gy, g[:, 3], atol=1e-8)


def test_tps_affine_reproduction():
    # control points on an exact affine map: the spline must reproduce
    # it everywhere (affine terms are in the null space of the bending
    # energy)
    pts = [(x, y, 2.0 * x - 0.5 * y + 3.0, 0.25 * x + 1.5 * y - 7.0)
           for x, y in [(0, 0), (10, 0), (0, 10), (10, 10), (3, 7)]]
    t = fit_tps(pts)
    px = np.array([2.3, 8.1, 5.5])
    py = np.array([1.1, 9.9, 4.2])
    gx, gy = t.forward_np(px, py)
    assert np.allclose(gx, 2.0 * px - 0.5 * py + 3.0, atol=1e-8)
    assert np.allclose(gy, 0.25 * px + 1.5 * py - 7.0, atol=1e-8)


def test_tps_columns_match_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    t = fit_tps(GCPS)
    pdf = pd.DataFrame({"px": [5.0, 37.5, 99.0], "py": [5.0, 62.5, 1.0]})
    df = spark.createDataFrame(pdf)
    gx, gy = t.forward_cols(F.col("px"), F.col("py"))
    got = df.select(gx.alias("gx"), gy.alias("gy")).toPandas()
    ex, ey = t.forward_np(pdf["px"].to_numpy(), pdf["py"].to_numpy())
    assert np.allclose(got["gx"], ex, atol=1e-9)
    assert np.allclose(got["gy"], ey, atol=1e-9)


def test_rpc_forward_reference_point():
    t = RPCTransformer(**RPC)
    # at the reference point all normalized terms vanish except the
    # constants
    px, ln = t.forward_np(-160.0, 75.0)
    assert px == pytest.approx(2048.0 + 2048.0 * (-0.001), rel=1e-12)
    assert ln == pytest.approx(2048.0 + 2048.0 * 0.002, rel=1e-12)


def test_rpc_inverse_roundtrip():
    t = RPCTransformer(**RPC)
    rng = np.random.RandomState(3)
    lon = -160.0 + rng.uniform(-15, 15, 200)
    lat = 75.0 + rng.uniform(-8, 8, 200)
    px, ln = t.forward_np(lon, lat)
    lon2, lat2 = t.inverse_np(px, ln)
    # threshold is 0.1 px; one pixel here is ~1e-2 deg
    assert np.max(np.abs(lon2 - lon)) < 2e-3
    assert np.max(np.abs(lat2 - lat)) < 2e-3
    # and the reprojection error itself is below the pixel threshold
    px2, ln2 = t.forward_np(lon2, lat2)
    assert np.max(np.abs(px2 - px)) < 0.1
    assert np.max(np.abs(ln2 - ln)) < 0.1


def test_rpc_inverse_udf(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    t = RPCTransformer(**RPC)
    lon = np.array([-165.0, -158.5, -150.2])
    lat = np.array([71.0, 75.5, 80.1])
    px, ln = t.forward_np(lon, lat)
    df = spark.createDataFrame(pd.DataFrame({"pixel": px, "line": ln}))
    out = df.select(
        t.inverse_udf()(F.col("pixel"), F.col("line")).alias("g")
    ).select("g.lon", "g.lat").toPandas()
    assert np.allclose(out["lon"], lon, atol=2e-3)
    assert np.allclose(out["lat"], lat, atol=2e-3)
