"""PROJ.4 import (gdal_spark/proj4.py; reference
ogr/ogr_srs_proj4.cpp importFromProj4): closure against the engine's
own exportToProj4 (srsinfo.py) — re-importing every registered code's
proj4 string must reproduce the original projection at sample
points."""

import numpy as np
import pytest

from gdal_spark import crs, proj4
from gdal_spark import srsinfo as SR


def _sample_lonlat(kind, params):
    lons, lats = proj4.sample_lonlat(kind, params)
    return np.asarray(lons), np.asarray(lats)


def _proj4_of():
    return SR.proj4_strings()


@pytest.mark.parametrize("code", sorted(
    c for c in crs.CONIC_PRESETS))
def test_reimport_matches_original(code):
    """importFromProj4(exportToProj4(code)) == code, value-level."""
    s = _proj4_of()[code]
    synth = proj4.register_proj4(s)
    kind, _, params = crs.CONIC_PRESETS[code]
    kind2, _, _ = crs.CONIC_PRESETS[synth]
    assert kind2 == kind
    lons, lats = _sample_lonlat(kind, params)
    x0, y0 = crs.transform_points_np(code, lons, lats)
    x1, y1 = crs.transform_points_np(synth, lons, lats)
    np.testing.assert_array_equal(x1, x0)
    np.testing.assert_array_equal(y1, y0)


def test_reimport_utm_and_webmerc():
    p4 = _proj4_of()
    c = proj4.register_proj4(p4[32733])
    kind, ellps, params = crs.CONIC_PRESETS[c]
    assert kind == "tmerc" and params["fn"] == 10000000.0
    lons = np.array([14.5, 15.5])
    lats = np.array([-33.0, -35.0])
    x0, y0 = crs.grid_transform_np(3857, 32733)[0](
        *crs.webmerc_forward_np(lons, lats))
    x1, y1 = crs.transform_points_np(c, lons, lats)
    np.testing.assert_allclose(x1, x0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-6)

    m = proj4.register_proj4(p4[3857])
    kindm, ellm, _ = crs.CONIC_PRESETS[m]
    assert kindm == "merc" and crs.ELLIPSOIDS[ellm][1] == 0.0  # sphere
    xs, ys = crs.transform_points_np(m, lons, lats)
    xw, yw = crs.webmerc_forward_np(lons, lats)
    np.testing.assert_allclose(xs, xw, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ys, yw, rtol=0, atol=1e-6)


def test_custom_string_registers_and_column_path(spark):
    """A user proj4 string (not in any preset) resolves through the
    full Column dispatch."""
    from pyspark.sql import functions as F

    c = proj4.register_proj4(
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96"
        " +x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs")  # CONUS LCC
    df = spark.range(5).selectExpr(
        "CAST(-100 + id AS DOUBLE) AS lon", "CAST(35 + id AS DOUBLE) AS lat")
    x, y = crs.conic_forward(c, F.col("lon"), F.col("lat"))
    lo, la = crs.conic_inverse(c, F.col("x"), F.col("y"))
    out = df.select("lon", "lat", x.alias("x"), y.alias("y")) \
        .select("*", lo.alias("l"), la.alias("p")).collect()
    for r in out:
        assert abs(r.l - r.lon) < 1e-9 and abs(r.p - r.lat) < 1e-8


def test_unsupported_and_malformed_raise():
    with pytest.raises(ValueError, match="unsupported"):
        proj4.register_proj4("+proj=igh +ellps=WGS84")
    with pytest.raises(ValueError, match="no \\+proj"):
        proj4.register_proj4("+ellps=WGS84")
    with pytest.raises(ValueError, match="polar"):
        proj4.register_proj4("+proj=stere +lat_0=52 +ellps=WGS84")


def test_synthetic_code_through_executor_udf(spark):
    """The st_transform numpy path runs INSIDE executors, where a
    synthetic registration doesn't exist in the module dict — the
    closure must carry the resolved parameters (crs.np_transform_fn),
    not the code."""
    from pyspark.sql import functions as F

    from gdal_spark.functions import geometry as SG

    c = proj4.register_proj4(
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96"
        " +x_0=0 +y_0=0 +datum=NAD83 +units=m +no_defs")  # 5070 twin
    df = spark.createDataFrame(
        [(1, "LINESTRING(-100 40, -95 42, -90 44)")], ["id", "wkt"])
    out = df.select(SG.st_transform("wkt", c, prec=6).alias("t")) \
        .collect()[0]["t"]
    ref = df.select(SG.st_transform("wkt", 5070, prec=6).alias("t")) \
        .collect()[0]["t"]
    assert out == ref
