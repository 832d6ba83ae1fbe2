"""NZMG (EPSG:27200) tests — complex-polynomial projection
(gdal_spark/nzmg.py; reference reaches it via PROJ +proj=nzmg,
ogr/ogrct.cpp)."""

import math

import duckdb
import numpy as np

from gdal_spark import nzmg


def test_constants_self_consistent():
    # the published series are mutual inverses at the origin
    assert abs(nzmg.C[0].real - 1 / nzmg.B[0].real) < 2e-9
    assert abs(nzmg.D[0] - 1 / nzmg.A[0]) < 2e-9
    # A1 = d(isometric lat)/d(phi) at -41 deg on International 1924
    f = 1 / 297.0
    e2 = f * (2 - f)
    phi = math.radians(-41.0)
    dpsi = (1 - e2) / ((1 - e2 * math.sin(phi) ** 2) * math.cos(phi))
    per_unit = dpsi * math.radians(1.0) / nzmg.SEC5_PER_DEG
    assert abs(per_unit - nzmg.A[0]) < 5e-6


def test_np_origin_and_roundtrip():
    e, n = nzmg.nzmg_forward_np([173.0], [-41.0])
    assert abs(e[0] - nzmg.E0) < 1e-6 and abs(n[0] - nzmg.N0) < 1e-6
    rng = np.random.default_rng(3)
    lons = rng.uniform(166, 179, 2000)
    lats = rng.uniform(-47.5, -34, 2000)
    E, N = nzmg.nzmg_forward_np(lons, lats)
    lon2, lat2 = nzmg.nzmg_inverse_np(E, N)
    assert np.abs(lon2 - lons).max() < 1e-9
    assert np.abs(lat2 - lats).max() < 1e-9


def test_column_path_matches_numpy(spark):
    rng = np.random.default_rng(11)
    lons = rng.uniform(166, 179, 500)
    lats = rng.uniform(-47.5, -34, 500)
    df = spark.createDataFrame(
        [(i, float(lons[i]), float(lats[i])) for i in range(500)],
        "id long, lon double, lat double")
    out = nzmg.from_nzmg(nzmg.to_nzmg(df)).orderBy("id").collect()
    E, N = nzmg.nzmg_forward_np(lons, lats)
    got_e = np.array([r.nzmg_e for r in out])
    got_n = np.array([r.nzmg_n for r in out])
    np.testing.assert_allclose(got_e, E, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got_n, N, rtol=0, atol=1e-6)
    got_lon = np.array([r.nzmg_lon for r in out])
    got_lat = np.array([r.nzmg_lat for r in out])
    np.testing.assert_allclose(got_lon, lons, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got_lat, lats, rtol=0, atol=1e-9)


def test_sql_templates_match_numpy():
    """The identical stage templates evaluated by DuckDB."""
    rng = np.random.default_rng(5)
    lons = rng.uniform(166, 179, 300)
    lats = rng.uniform(-47.5, -34, 300)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, CAST({float(lons[i])!r} AS DOUBLE),"
                         f" CAST({float(lats[i])!r} AS DOUBLE))"
                         for i in range(300)) +
                ") t(doc_id, lon, lat)")
    q = nzmg.roundtrip_sql("SELECT doc_id, lon, lat FROM pts")
    res = con.execute(q + " ORDER BY doc_id").fetchnumpy()
    E, N = nzmg.nzmg_forward_np(lons, lats)
    np.testing.assert_allclose(res["x"], np.round(E, 3), atol=2e-3)
    np.testing.assert_allclose(res["y"], np.round(N, 3), atol=2e-3)
    np.testing.assert_allclose(res["lon_rt"], np.round(lons, 6),
                               atol=2e-6)
    np.testing.assert_allclose(res["lat_rt"], np.round(lats, 6),
                               atol=2e-6)


def test_plan_single_map_stage(spark):
    df = spark.range(100).selectExpr(
        "id", "170.0 + id * 0.01 AS lon", "-45.0 + id * 0.02 AS lat")
    out = nzmg.from_nzmg(nzmg.to_nzmg(df))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
