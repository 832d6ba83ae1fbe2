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


def test_conic_known_points(spark):
    """Forward values against independently known EPSG sample points
    (PROJ/epsg.io): Lambert-93 Paris, Conus Albers origin, Antarctic
    Polar Stereographic on the standard parallel."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    df = spark.createDataFrame(pd.DataFrame({"lon": [2.3522], "lat": [48.8566]}))
    x, y = crs.conic_forward(2154, F.col("lon"), F.col("lat"))
    got = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(got["x"] - 652469.02) < 1.0
    assert abs(got["y"] - 6862035.26) < 1.0

    df = spark.createDataFrame(pd.DataFrame({"lon": [-96.0], "lat": [23.0]}))
    x, y = crs.conic_forward(5070, F.col("lon"), F.col("lat"))
    got = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(got["x"]) < 1e-6 and abs(got["y"]) < 1e-6

    df = spark.createDataFrame(pd.DataFrame({"lon": [0.0], "lat": [-71.0]}))
    x, y = crs.conic_forward(3031, F.col("lon"), F.col("lat"))
    got = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(got["x"]) < 1e-6
    assert abs(got["y"] - 2082760.0) < 5.0


def test_conic_roundtrip(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    cases = {
        3347: ([-120.0, -95.5, -80.0], [45.0, 60.0, 68.0]),
        5070: ([-120.0, -96.0, -70.0], [30.0, 40.0, 48.0]),
        3031: ([-150.0, 0.0, 120.0], [-65.0, -75.0, -89.0]),
    }
    for epsg, (lons, lats) in cases.items():
        df = spark.createDataFrame(pd.DataFrame({"lon": lons, "lat": lats}))
        x, y = crs.conic_forward(epsg, F.col("lon"), F.col("lat"))
        d = df.select("lon", "lat", x.alias("x"), y.alias("y"))
        lon2, lat2 = crs.conic_inverse(epsg, F.col("x"), F.col("y"))
        got = d.select(
            (F.abs(lon2 - F.col("lon"))).alias("dl"),
            (F.abs(lat2 - F.col("lat"))).alias("dp"),
        ).toPandas()
        assert got["dl"].max() < 1e-7, epsg
        assert got["dp"].max() < 1e-7, epsg


def test_mercator_3395_known_point_and_roundtrip(spark):
    """EPSG:3395 World Mercator (ellipsoidal, method 9804) at
    (10 E, 53 N): x = a*rad(10), y = 6948849.385 (Snyder 7-7)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    df = spark.createDataFrame(pd.DataFrame({"lon": [10.0], "lat": [53.0]}))
    x, y = crs.conic_forward(3395, F.col("lon"), F.col("lat"))
    got = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(got["x"] - 1113194.9079) < 0.01
    assert abs(got["y"] - 6948849.3848) < 0.01

    lon2, lat2 = crs.conic_inverse(3395, F.lit(got["x"]), F.lit(got["y"]))
    rt = df.select(lon2.alias("lon"), lat2.alias("lat")).collect()[0]
    assert abs(rt["lon"] - 10.0) < 1e-9
    assert abs(rt["lat"] - 53.0) < 1e-7


def test_oblique_stereographic_28992_epsg_example(spark):
    """EPSG Guidance Note 7-2 worked example for Amersfoort / RD New:
    (53 N, 6 E) -> E 196105.283, N 557057.739 (method 9809)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    df = spark.createDataFrame(pd.DataFrame({"lon": [6.0], "lat": [53.0]}))
    x, y = crs.conic_forward(28992, F.col("lon"), F.col("lat"))
    got = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(got["x"] - 196105.283) < 0.002
    assert abs(got["y"] - 557057.739) < 0.002

    lon2, lat2 = crs.conic_inverse(28992, F.lit(got["x"]), F.lit(got["y"]))
    rt = df.select(lon2.alias("lon"), lat2.alias("lat")).collect()[0]
    assert abs(rt["lon"] - 6.0) < 1e-8
    assert abs(rt["lat"] - 53.0) < 1e-7


def test_krovak_5514_epsg_example(spark):
    """EPSG Guidance Note 7-2 worked example for S-JTSK / Krovak
    (method 9819): (50d12'32.442"N, 16d50'59.179"E) -> southing
    1050538.63, westing 568991.00; EPSG:5514 East North negates both."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    lat = 50 + 12 / 60 + 32.442 / 3600
    lon = 16 + 50 / 60 + 59.179 / 3600
    df = spark.createDataFrame(pd.DataFrame({"lon": [lon], "lat": [lat]}))
    x, y = crs.conic_forward(5514, F.col("lon"), F.col("lat"))
    got = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(got["x"] - (-568991.00)) < 0.02
    assert abs(got["y"] - (-1050538.64)) < 0.02

    lon2, lat2 = crs.conic_inverse(5514, F.lit(got["x"]), F.lit(got["y"]))
    rt = df.select(lon2.alias("lon"), lat2.alias("lat")).collect()[0]
    assert abs(rt["lon"] - lon) < 1e-8
    assert abs(rt["lat"] - lat) < 1e-8


def test_eqdc_and_aeqd_roundtrip_and_sql_parity(spark):
    """Equidistant Conic (102031) and polar AEQD (102016): Spark
    forward+inverse round-trips to the input, and the SQL backend
    (DuckDB) reproduces the projected meters to sub-mm."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    pts = pd.DataFrame({
        "lon": [-15.0, 10.0, 30.0, 45.0],
        "lat": [-60.0, 50.0, 75.0, 10.0],
    })
    df = spark.createDataFrame(pts)
    con = duckdb.connect()
    con.register("_pts", pts)
    for code in (102031, 102016):
        x, y = crs.conic_forward(code, F.col("lon"), F.col("lat"))
        proj = df.select("lon", "lat", x.alias("x"), y.alias("y"))
        lon2, lat2 = crs.conic_inverse(code, F.col("x"), F.col("y"))
        rt = proj.select(
            (F.abs(lon2 - F.col("lon"))).alias("dl"),
            (F.abs(lat2 - F.col("lat"))).alias("dp"),
        ).collect()
        assert all(r["dl"] < 1e-8 and r["dp"] < 1e-7 for r in rt), code

        xs, ys = crs.conic_forward_sql(code, "lon", "lat")
        sql_rows = con.execute(
            f"SELECT {xs} AS x, {ys} AS y FROM _pts ORDER BY lon"
        ).fetchall()
        spark_rows = [
            (r["x"], r["y"]) for r in proj.orderBy("lon").collect()
        ]
        for (sx, sy), (dx, dy) in zip(spark_rows, sql_rows):
            assert abs(sx - dx) < 1e-4 and abs(sy - dy) < 1e-4, code


def test_sinu_eqc_moll_roundtrip_and_known_values(spark):
    """Sinusoidal (Snyder ch. 30), Equidistant Cylindrical (EPSG
    method 1028) and Mollweide (Snyder ch. 31): forward+inverse
    round-trips plus anchor values — eqc x(90E, equator) = a*pi/2,
    Mollweide y(0E, 50N) = 5873471.95 (PROJ) and x(90E, 0N) =
    sqrt(2)*a."""
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark import crs

    a = crs.ELLIPSOIDS["WGS84"][0]
    pts = pd.DataFrame({
        "lon": [90.0, 0.0, -120.0, 37.5],
        "lat": [0.0, 50.0, -75.0, 82.0],
    })
    df = spark.createDataFrame(pts)
    for code in (54008, 4087, 54009):
        x, y = crs.conic_forward(code, F.col("lon"), F.col("lat"))
        proj = df.select("lon", "lat", x.alias("x"), y.alias("y"))
        lon2, lat2 = crs.conic_inverse(code, F.col("x"), F.col("y"))
        rt = proj.select(
            (F.abs(lon2 - F.col("lon"))).alias("dl"),
            (F.abs(lat2 - F.col("lat"))).alias("dp"),
        ).collect()
        assert all(r["dl"] < 1e-7 and r["dp"] < 1e-7 for r in rt), code

    x, y = crs.conic_forward(4087, F.lit(90.0), F.lit(0.0))
    got = df.limit(1).select(x.alias("x")).collect()[0]
    assert abs(got["x"] - a * math.pi / 2) < 1e-6

    x, y = crs.conic_forward(54009, F.lit(0.0), F.lit(50.0))
    gy = df.limit(1).select(y.alias("y")).collect()[0]
    assert abs(gy["y"] - 5873471.95) < 0.5
    x, y = crs.conic_forward(54009, F.lit(90.0), F.lit(0.0))
    gx = df.limit(1).select(x.alias("x")).collect()[0]
    assert abs(gx["x"] - math.sqrt(2.0) * a) < 0.5


def test_laea_cea_eqearth_roundtrip_and_known_values(spark):
    """Equal-area families: LAEA ellipsoidal (EPSG method 9820 —
    guidance note 7-2 worked example for EPSG:3035-style params),
    Cylindrical Equal Area (9835 / EPSG:6933) and Equal Earth (1078 /
    EPSG:8857): forward+inverse round-trips, the EPSG worked example,
    the false origin anchor, and the equal-area Jacobian property."""
    import numpy as np
    from pyspark.sql import functions as F

    from gdal_spark import crs

    # EPSG GN 7-2 example for 9820 (ETRS89/LAEA): 50N 5E
    x, y = crs.transform_points_np(3035, np.array([5.0]), np.array([50.0]))
    assert abs(x[0] - 3962799.45) < 0.02
    assert abs(y[0] - 2999718.85) < 0.02
    # projection centre maps to the false origin
    x, y = crs.transform_points_np(3035, np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6

    pts = pd.DataFrame({
        "lon": [5.0, 10.0, -15.0, 40.0],
        "lat": [50.0, 52.0, 38.0, 65.0],
    })
    df = spark.createDataFrame(pts)
    from pyspark.sql import functions as F
    for code in (3035, 6933, 8857):
        x, y = crs.conic_forward(code, F.col("lon"), F.col("lat"))
        proj = df.select("lon", "lat", x.alias("x"), y.alias("y"))
        lon2, lat2 = crs.conic_inverse(code, F.col("x"), F.col("y"))
        rt = proj.select(
            (F.abs(lon2 - F.col("lon"))).alias("dl"),
            (F.abs(lat2 - F.col("lat"))).alias("dp"),
        ).collect()
        assert all(r["dl"] < 1e-7 and r["dp"] < 1e-7 for r in rt), code

    # equal-area property: |det J| == a^2 (1-e2) cos(phi)/(1-e2 sin^2 phi)^2
    for code, f in ((3035, 1 / 298.257222101), (6933, 1 / 298.257223563),
                    (8857, 1 / 298.257223563)):
        a = 6378137.0
        e2 = 2 * f - f * f
        lo = np.linspace(-15.0, 39.0, 25)
        la = np.linspace(36.0, 69.0, 25)
        h = 1e-6
        x0, y0 = crs.transform_points_np(code, lo, la)
        x1, y1 = crs.transform_points_np(code, lo + h, la)
        x2, y2 = crs.transform_points_np(code, lo, la + h)
        J = ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / np.radians(h) ** 2
        phi = np.radians(la)
        want = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
        assert np.max(np.abs(J / want - 1)) < 1e-5, code


def test_hom_variant_b_epsg_example_and_lv95(spark):
    """Hotine Oblique Mercator variant B (EPSG method 9815): the GN
    7-2 Timbalai 1948 / RSO Borneo worked example (679245.73,
    596562.78), the LV95 centre anchor, round-trips, and conformality
    (Jacobian is a scaled rotation in isometric coordinates)."""
    import numpy as np
    from pyspark.sql import functions as F

    from gdal_spark import crs

    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    x, y = crs.transform_points_np(29873, np.array([lon]), np.array([lat]))
    assert abs(x[0] - 679245.73) < 0.02 and abs(y[0] - 596562.78) < 0.02

    x, y = crs.transform_points_np(
        2056, np.array([7.439583333333333]), np.array([46.952405555555554]))
    assert abs(x[0] - 2600000.0) < 1e-6 and abs(y[0] - 1200000.0) < 1e-6

    # Column-backend roundtrip (Spark side of the dual backend)
    pts = pd.DataFrame({"lon": [7.44, 6.1, 10.4, 8.73],
                        "lat": [46.95, 46.2, 47.6, 46.0]})
    df = spark.createDataFrame(pts)
    from pyspark.sql import functions as F
    xx, yy = crs.conic_forward(2056, F.col("lon"), F.col("lat"))
    proj = df.select("lon", "lat", xx.alias("x"), yy.alias("y"))
    lon2, lat2 = crs.conic_inverse(2056, F.col("x"), F.col("y"))
    rt = proj.select(F.max(F.abs(lon2 - F.col("lon"))).alias("dl"),
                     F.max(F.abs(lat2 - F.col("lat"))).alias("dp")).collect()[0]
    assert rt["dl"] < 1e-9 and rt["dp"] < 1e-9

    # conformality over the Swiss window
    lo = np.linspace(6.0, 10.5, 20)
    la = np.linspace(45.8, 47.8, 20)
    h = 1e-7
    e2 = 2 * (1 / 299.1528128) - (1 / 299.1528128) ** 2
    x0, y0 = crs.transform_points_np(2056, lo, la)
    x1, y1 = crs.transform_points_np(2056, lo + h, la)
    x2, y2 = crs.transform_points_np(2056, lo, la + h)
    phi = np.radians(la)
    dq = (1 - e2) / ((1 - e2 * np.sin(phi) ** 2) * np.cos(phi)) * np.radians(h)
    dl = np.radians(h)
    n1 = np.hypot((x1 - x0) / dl, (y1 - y0) / dl)
    n2 = np.hypot((x2 - x0) / dq, (y2 - y0) / dq)
    dot = ((x1 - x0) * (x2 - x0) + (y1 - y0) * (y2 - y0)) / (n1 * n2 * dl * dq)
    assert np.max(np.abs(n1 / n2 - 1)) < 1e-5
    assert np.max(np.abs(dot)) < 1e-5
