"""GTX vertical-datum grid tests (gdal_spark/gtx.py).

Reference behavior: gdal/frmts/raw/gtxdataset.cpp (header layout,
south-up rows, float32/float64 size sniff, -88.8888 nodata);
applied the way PROJ +vgridshift does for point heights.
"""

import numpy as np
import pytest

from gdal_spark import gtx


def test_header_and_dtype_roundtrip(tmp_path):
    vals = np.arange(12, dtype=np.float64).reshape(3, 4) * 0.25
    p32 = str(tmp_path / "a.gtx")
    gtx.write_gtx(p32, vals, ll_lat=-10.0, ll_lon=120.0,
                  dlat=1.0, dlon=2.0)
    g = gtx.read_gtx(p32)
    assert (g["nrows"], g["ncols"]) == (3, 4)
    assert g["ll_lat"] == -10.0 and g["ll_lon"] == 120.0
    np.testing.assert_array_equal(g["values"], vals)  # exact in f32
    p64 = str(tmp_path / "b.gtx")
    gtx.write_gtx(p64, vals + 1e-12, ll_lat=-10.0, ll_lon=120.0,
                  dlat=1.0, dlon=2.0, dtype="float64")
    g64 = gtx.read_gtx(p64)
    np.testing.assert_array_equal(g64["values"], vals + 1e-12)


def test_truncated_errors():
    raw = gtx.toy_gtx_bytes()
    with pytest.raises(ValueError, match="size"):
        gtx.read_gtx(raw[:-7])


def test_np_bilinear_known_point():
    g = gtx.read_gtx(gtx.toy_gtx_bytes(nodata_hole=False))
    # at an exact node: N = node value
    und, out = gtx.geoid_shift_np([210.0 + 7 * 2.5], [-30.0 + 4 * 2.5],
                                  [100.0], g)
    want = g["values"][4, 7]
    assert abs(und[0] - want) < 1e-12
    assert abs(out[0] - (100.0 - want)) < 1e-12
    # dateline frame: lon -150 == 210 in the grid frame
    und2, _ = gtx.geoid_shift_np([-150.0 + 7 * 2.5], [-30.0 + 4 * 2.5],
                                 [0.0], g)
    assert abs(und2[0] - want) < 1e-12


def test_np_outside_and_nodata_passthrough():
    g = gtx.read_gtx(gtx.toy_gtx_bytes())
    und, out = gtx.geoid_shift_np([10.0], [80.0], [7.0], g)
    assert np.isnan(und[0]) and out[0] == 7.0
    # a point whose cell touches the nodata node passes through
    lat = g["ll_lat"] + 10 * g["dlat"] + 0.3
    lon = g["ll_lon"] + 13 * g["dlon"] + 0.3
    und2, out2 = gtx.geoid_shift_np([lon], [lat], [5.0], g)
    assert np.isnan(und2[0]) and out2[0] == 5.0


def test_spark_matches_numpy(spark):
    g = gtx.read_gtx(gtx.toy_gtx_bytes())
    rng = np.random.default_rng(2)
    lons = rng.uniform(-160, -60, 400)        # grid frame 210..310
    lats = rng.uniform(-35, 35, 400)          # some outside
    hs = rng.uniform(-50, 500, 400)
    df = spark.createDataFrame(
        [(i, float(lons[i]), float(lats[i]), float(hs[i]))
         for i in range(400)], "id long, lon double, lat double, h double")
    out = gtx.apply_geoid(df, spark, g).orderBy("id").collect()
    und, shifted = gtx.geoid_shift_np(lons, lats, hs, g)
    got_u = np.array([np.nan if r.undulation is None else r.undulation
                      for r in out])
    got_h = np.array([r.h_shifted for r in out])
    np.testing.assert_allclose(got_u[~np.isnan(und)], und[~np.isnan(und)],
                               rtol=0, atol=1e-12)
    assert np.isnan(got_u).tolist() == np.isnan(und).tolist()
    np.testing.assert_allclose(got_h, shifted, rtol=0, atol=1e-12)
    # inverse direction closes the loop where defined
    back = gtx.apply_geoid(
        gtx.apply_geoid(df, spark, g).drop("undulation"),
        spark, g, h_col="h_shifted", direction="to_ellipsoidal",
    ).orderBy("id").collect()
    got_rt = np.array([r.h_shifted for r in back])
    np.testing.assert_allclose(got_rt, hs, rtol=0, atol=1e-9)


def test_plan_broadcast_only(spark):
    g = gtx.read_gtx(gtx.toy_gtx_bytes())
    df = spark.range(100).selectExpr(
        "id", "CAST(215.0 + id * 0.5 AS DOUBLE) AS lon",
        "CAST(-25.0 + id * 0.4 AS DOUBLE) AS lat",
        "CAST(id AS DOUBLE) AS h")
    plan = gtx.apply_geoid(df, spark, g)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
    assert plan.count("BroadcastHashJoin") == 4
