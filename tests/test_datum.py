"""Datum pipeline goldens: cart round-trip exactness, Helmert shift
magnitudes against published OSGB36/ED50 behavior, NTv2-style grid
shift node-exactness, and three-backend (Column / SQL / numpy)
agreement.  Reference path being matched: ogr/ogrct.cpp:1822 ->
PROJ +cart / +helmert / +hgridshift."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark import datum
from gdal_spark.datum import (DATUM_ELLIPSOIDS, GRID, apply_grid_shift,
                              datum_shift_np, datum_shift_sql, geocentric_cols,
                              geodetic_cols, grid_shift_np, grid_shift_sql,
                              shift_grid, _shift_node, _NpBackend)


def test_cart_roundtrip_exact():
    lons = np.array([-0.1, 12.5, -77.03, 151.2])
    lats = np.array([51.5, 41.9, 38.9, -33.87])
    hs = np.array([0.0, 120.0, -30.0, 58.0])
    a, f = DATUM_ELLIPSOIDS["WGS84"]
    x, y, z = datum.geodetic_to_geocentric(_NpBackend, lons, lats, hs, a, f)
    lon2, lat2, h2 = datum.geocentric_to_geodetic(_NpBackend, x, y, z, a, f)
    assert np.allclose(lon2, lons, atol=1e-11)
    assert np.allclose(lat2, lats, atol=1e-9)   # Bowring single-shot
    assert np.allclose(h2, hs, atol=1e-4)


def test_helmert_osgb36_magnitude_and_roundtrip():
    # London: OSGB36 graticule sits ~120 m from WGS84 (published)
    lon, lat, h = datum_shift_np(np.array([-0.1]), np.array([51.5]),
                                 np.array([0.0]), "WGS84", "OSGB36")
    dm = math.hypot((lon[0] + 0.1) * 111320 * math.cos(math.radians(51.5)),
                    (lat[0] - 51.5) * 110540)
    assert 80.0 < dm < 180.0
    # reverse (negated parameters) closes to cm level
    lon2, lat2, _ = datum_shift_np(lon, lat, h, "OSGB36", "WGS84")
    assert abs(lon2[0] + 0.1) < 1e-6 and abs(lat2[0] - 51.5) < 1e-6


def test_helmert_ed50_translation_only():
    # pure-translation set: geocentric delta must equal (87, 98, 121)
    a, f = DATUM_ELLIPSOIDS["WGS84"]
    x, y, z = datum.geodetic_to_geocentric(
        _NpBackend, np.array([10.0]), np.array([50.0]), np.array([0.0]), a, f)
    xp, yp, zp = datum.helmert_position_vector(
        _NpBackend, x, y, z, datum.HELMERT_PRESETS[("WGS84", "ED50")])
    assert (xp - x)[0] == pytest.approx(87.0)
    assert (yp - y)[0] == pytest.approx(98.0)
    assert (zp - z)[0] == pytest.approx(121.0)


def test_grid_shift_node_exact_and_region():
    # at an exact node the bilinear weights collapse to the node value
    i, j = 10, 20
    lat = GRID["lat0"] + i * GRID["dlat"]
    lon = GRID["lon0"] + j * GRID["dlon"]
    lon2, lat2 = grid_shift_np(np.array([lon]), np.array([lat]))
    dlat, dlon = _shift_node(_NpBackend, float(i), float(j))
    assert lat2[0] == pytest.approx(lat + dlat / 3600.0, abs=1e-12)
    assert lon2[0] == pytest.approx(lon - dlon / 3600.0, abs=1e-12)
    # NAD27-like magnitude bound: < 2.5 arcsec everywhere
    assert abs(lat2[0] - lat) * 3600 < 2.5


def test_spark_matches_numpy_backends(spark):
    pdf = pd.DataFrame({
        "lon": [-120.3, -100.0, -80.55, -95.125],
        "lat": [35.7, 40.25, 30.01, 45.4],
        "h": [0.0, 10.0, -5.0, 250.0],
    })
    df = spark.createDataFrame(pdf)
    # helmert pipeline: Column vs numpy
    lon_c, lat_c, h_c = datum.datum_shift_cols(
        F.col("lon"), F.col("lat"), F.col("h"), "WGS84", "OSGB36")
    got = df.select(lon_c.alias("lo"), lat_c.alias("la"),
                    h_c.alias("hh")).toPandas()
    lo, la, hh = datum_shift_np(pdf.lon.values, pdf.lat.values, pdf.h.values,
                                "WGS84", "OSGB36")
    assert np.allclose(got.lo.values, lo, atol=1e-11)
    assert np.allclose(got.la.values, la, atol=1e-11)
    assert np.allclose(got.hh.values, hh, atol=1e-6)
    # grid shift: broadcast-join path vs numpy closed form
    shifted = apply_grid_shift(df, shift_grid(spark)).orderBy("lon").toPandas()
    nlon, nlat = grid_shift_np(pdf.lon.values, pdf.lat.values)
    order = np.argsort(pdf.lon.values)
    assert np.allclose(shifted.lon_shifted.values, nlon[order], atol=1e-12)
    assert np.allclose(shifted.lat_shifted.values, nlat[order], atol=1e-12)


def test_sql_backend_matches_numpy():
    import duckdb
    con = duckdb.connect()
    lon_s, lat_s, h_s = datum_shift_sql("lon", "lat", "0.0",
                                        "WGS84", "OSGB36")
    glon, glat = grid_shift_sql("lon", "lat")
    q = (f"SELECT {lon_s} AS lo, {lat_s} AS la, {glon} AS gl, {glat} AS ga "
         f"FROM (SELECT -100.0 AS lon, 40.25 AS lat)")
    row = con.execute(q).fetchone()
    lo, la, _ = datum_shift_np(np.array([-100.0]), np.array([40.25]),
                               np.array([0.0]), "WGS84", "OSGB36")
    nlon, nlat = grid_shift_np(np.array([-100.0]), np.array([40.25]))
    assert row[0] == pytest.approx(lo[0], abs=1e-11)
    assert row[1] == pytest.approx(la[0], abs=1e-11)
    assert row[2] == pytest.approx(nlon[0], abs=1e-12)
    assert row[3] == pytest.approx(nlat[0], abs=1e-12)


def test_grid_shift_plan_is_broadcast_only(spark):
    df = spark.range(100).select(
        (F.col("id") % 40 - 120.0).alias("lon"),
        (F.col("id") % 20 + 30.0).alias("lat"))
    plan = apply_grid_shift(
        df, shift_grid(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
