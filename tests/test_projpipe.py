"""Compound pipeline goldens: the OSGB36 worked example from the
Ordnance Survey guide (annex C), WGS84<->BNG round trips, visible
datum-shift magnitude, and NAD27->NAD83-UTM backend agreement."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark import datum, projpipe
from gdal_spark.crs import _tm_forward
from gdal_spark.datum import _NpBackend
from gdal_spark.projpipe import (_BNG_A, _BNG_F, _BNG_FE, _BNG_FN_EFF,
                                 _BNG_K0, _BNG_LON0, bng_forward_np,
                                 bng_inverse, nad27_utm_cols, nad27_utm_np)

# OS "A guide to coordinate systems in GB" worked example:
# OSGB36 52d39'27.2531"N 1d43'4.5177"E -> E 651409.903 N 313177.270
_OS_LAT = 52.0 + 39.0 / 60 + 27.2531 / 3600
_OS_LON = 1.0 + 43.0 / 60 + 4.5177 / 3600


def test_osgb_worked_example_projection_step():
    e, n = _tm_forward(_NpBackend, np.array([_OS_LON]), np.array([_OS_LAT]),
                       _BNG_LON0, _BNG_A, _BNG_F, k0=_BNG_K0,
                       false_e=_BNG_FE, false_n=_BNG_FN_EFF)
    assert e[0] == pytest.approx(651409.903, abs=0.01)
    assert n[0] == pytest.approx(313177.270, abs=0.01)


def test_bng_roundtrip_and_datum_magnitude():
    lons = np.array([-0.1276, -3.1883, -1.2577])   # London, Cardiff, Oxford
    lats = np.array([51.5072, 51.4816, 51.7520])
    e, n = bng_forward_np(lons, lats)
    lon2, lat2 = bng_inverse(_NpBackend, e, n)
    assert np.allclose(lon2, lons, atol=2e-7)
    assert np.allclose(lat2, lats, atol=2e-7)
    # the full pipeline must differ from projection-only by the
    # OSGB36<->WGS84 datum shift (~70-180 m in GB)
    e0, n0 = _tm_forward(_NpBackend, lons, lats, _BNG_LON0, _BNG_A, _BNG_F,
                         k0=_BNG_K0, false_e=_BNG_FE, false_n=_BNG_FN_EFF)
    d = np.hypot(e - e0, n - n0)
    assert np.all(d > 50.0) and np.all(d < 250.0)


def test_bng_spark_matches_numpy(spark):
    # staged DataFrame path (to_bng/from_bng) — the fused Column
    # composition is codegen-hostile, see projpipe.bng_forward_cols
    pdf = pd.DataFrame({"lon": [-0.1276, -5.0, 1.2],
                        "lat": [51.5072, 50.2, 52.9]})
    df = spark.createDataFrame(pdf)
    out = projpipe.from_bng(projpipe.to_bng(df)).orderBy("lon").toPandas()
    ne, nn = bng_forward_np(pdf.lon.values, pdf.lat.values)
    order = np.argsort(pdf.lon.values)
    assert np.allclose(out.easting.values, ne[order], atol=1e-6)
    assert np.allclose(out.northing.values, nn[order], atol=1e-6)
    assert np.allclose(out.lon_wgs84.values, pdf.lon.values[order],
                       atol=2e-7)
    assert np.allclose(out.lat_wgs84.values, pdf.lat.values[order],
                       atol=2e-7)


def test_nad27_utm_spark_matches_numpy(spark):
    pdf = pd.DataFrame({"lon": [-99.5, -97.25, -101.0],
                        "lat": [30.0, 41.5, 46.25]})
    df = spark.createDataFrame(pdf)
    out = nad27_utm_cols(df, datum.shift_grid(spark), zone=14) \
        .orderBy("lat").toPandas()
    glon, glat, e, n = nad27_utm_np(pdf.lon.values, pdf.lat.values, 14)
    order = np.argsort(pdf.lat.values)
    assert np.allclose(out.lon_nad83.values, glon[order], atol=1e-12)
    assert np.allclose(out.easting.values, e[order], atol=1e-6)
    assert np.allclose(out.northing.values, n[order], atol=1e-6)


def test_sql_backends_match_numpy():
    import duckdb
    con = duckdb.connect()
    be, bn = projpipe.bng_forward_sql("lon", "lat")
    gl, ga, ue, un = projpipe.nad27_utm_sql("nlon", "nlat", 14)
    row = con.execute(
        f"SELECT {be}, {bn}, {ue}, {un} FROM (SELECT -0.1276 AS lon, "
        f"51.5072 AS lat, -99.5 AS nlon, 30.0 AS nlat)").fetchone()
    ne, nn = bng_forward_np(np.array([-0.1276]), np.array([51.5072]))
    _, _, e, n = nad27_utm_np(np.array([-99.5]), np.array([30.0]), 14)
    assert row[0] == pytest.approx(ne[0], abs=1e-6)
    assert row[1] == pytest.approx(nn[0], abs=1e-6)
    assert row[2] == pytest.approx(e[0], abs=1e-6)
    assert row[3] == pytest.approx(n[0], abs=1e-6)
