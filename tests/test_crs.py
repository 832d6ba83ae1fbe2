"""UTM Transverse Mercator goldens: Snyder PP 1395 worked example
(p. 269, Clarke 1866) plus WGS84 anchor points."""

import math

import pandas as pd
import pytest

from gdal_spark.crs import ELLIPSOIDS, _tm_forward, to_utm, utm_params


class _Num:
    lit = staticmethod(float)
    sin = staticmethod(math.sin)
    cos = staticmethod(math.cos)
    tan = staticmethod(math.tan)
    sqrt = staticmethod(math.sqrt)
    radians = staticmethod(math.radians)


def test_snyder_worked_example():
    a, f = ELLIPSOIDS["clrk66"]
    e, n = _tm_forward(_Num, -73.5, 40.5, -75.0, a, f)
    assert e == pytest.approx(627106.5, abs=0.5)
    assert n == pytest.approx(4484124.4, abs=0.5)


def test_central_meridian_identities():
    a, f = ELLIPSOIDS["WGS84"]
    e, n = _tm_forward(_Num, -117.0, 0.0, -117.0, a, f)
    assert e == pytest.approx(500000.0) and n == pytest.approx(0.0)
    # meridian arc to 45N, scaled by k0 (WGS84 M(45deg) = 4984944.378)
    e2, n2 = _tm_forward(_Num, -117.0, 45.0, -117.0, a, f)
    assert e2 == pytest.approx(500000.0)
    assert n2 == pytest.approx(0.9996 * 4984944.378, abs=0.5)


def test_epsg_mapping_and_column_api(spark):
    assert utm_params(32611) == ("WGS84", 11, False)
    assert utm_params(32733) == ("WGS84", 33, True)
    assert utm_params(26711) == ("clrk66", 11, False)
    df = spark.createDataFrame(pd.DataFrame({"lon": [-117.0], "lat": [33.0]}))
    row = to_utm(df, 32611).collect()[0]
    a, f = ELLIPSOIDS["WGS84"]
    e, n = _tm_forward(_Num, -117.0, 33.0, -117.0, a, f)
    assert row["easting"] == pytest.approx(e)
    assert row["northing"] == pytest.approx(n)
    # southern hemisphere false northing
    row_s = to_utm(
        spark.createDataFrame(pd.DataFrame({"lon": [15.0], "lat": [-33.0]})), 32733
    ).collect()[0]
    assert row_s["northing"] > 6000000


def test_inverse_roundtrip():
    a, f = ELLIPSOIDS["WGS84"]
    from gdal_spark.crs import _tm_inverse
    import numpy as np

    rng = [(-120.0, 33.0), (-114.5, 60.0), (-117.0, 0.5), (-119.9, -45.0)]
    for lon, lat in rng:
        e, n = _tm_forward(_Num, lon, lat, -117.0, a, f)
        lon2, lat2 = _tm_inverse(_Num, e, n, -117.0, a, f)
        assert lon2 == pytest.approx(lon, abs=1e-8)  # ~1 mm
        assert lat2 == pytest.approx(lat, abs=1e-8)


def test_from_utm_column(spark):
    import pandas as pd

    from gdal_spark.crs import from_utm

    df = spark.createDataFrame(pd.DataFrame({"lon": [-117.3], "lat": [33.7]}))
    rt = from_utm(
        to_utm(df, 32611).drop("lon", "lat"), 32611
    ).collect()[0]
    assert rt["lon"] == pytest.approx(-117.3, abs=1e-8)
    assert rt["lat"] == pytest.approx(33.7, abs=1e-8)
