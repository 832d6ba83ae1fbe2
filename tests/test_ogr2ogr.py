"""ogr2ogr composition (apps/ogr2ogr_lib.cpp as a declarative
pipeline) + whole-geometry st_transform."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark import crs
from gdal_spark.functions import geometry as SG
from gdal_spark.ogr2ogr import ogr2ogr_layer


def test_st_transform_matches_column_backend(spark):
    """Per-vertex numpy reprojection must agree with the Column
    backend on the same points."""
    df = spark.createDataFrame(
        [(1, "LINESTRING(-100 50, -95 55, -90 60)")], ["id", "wkt"]
    )
    out = df.select(SG.st_transform("wkt", 3347, prec=6).alias("t")).collect()[0]["t"]
    pts = [tuple(map(float, p.split())) for p in
           out[out.index("(") + 1 : out.rindex(")")].split(",")]
    ref = df.select(
        *[crs.conic_forward(3347, F.lit(lo), F.lit(la))[k].alias(f"v{i}{k}")
          for i, (lo, la) in enumerate([(-100.0, 50.0), (-95.0, 55.0), (-90.0, 60.0)])
          for k in (0, 1)]
    ).collect()[0]
    for i, (x, y) in enumerate(pts):
        assert abs(x - ref[f"v{i}0"]) < 1e-5
        assert abs(y - ref[f"v{i}1"]) < 1e-5


def test_st_transform_polygon_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "POLYGON((-100 50, -95 50, -95 55, -100 55, -100 50))")],
        ["id", "wkt"],
    )
    fwd = df.select(SG.st_transform("wkt", 3347, prec=6).alias("t"))
    back = fwd.select(
        SG.st_transform("t", 3347, prec=6, inverse=True).alias("b")
    ).collect()[0]["b"]
    pts = [tuple(map(float, p.split())) for p in
           back[back.index("((") + 2 : back.rindex("))")].split(",")]
    exp = [(-100, 50), (-95, 50), (-95, 55), (-100, 55), (-100, 50)]
    for (x, y), (ex, ey) in zip(pts, exp):
        assert abs(x - ex) < 1e-4 and abs(y - ey) < 1e-4


def test_ogr2ogr_pipeline(spark):
    rows = [
        (1, "a", -100.0, 50.0, "POLYGON((-101 49, -99 49, -99 51, -101 51, -101 49))"),
        (2, "b", -100.0, 50.0,
         "GEOMETRYCOLLECTION EMPTY"),  # dropped by where
        (3, "c", 10.0, 50.0, "POLYGON((9 49, 11 49, 11 51, 9 51, 9 49))"),  # spat-filtered
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "lang", "lon", "lat", "geom_wkt"]
    )
    out = ogr2ogr_layer(
        df,
        spat=(-139.5, -90.0, -75.5, 90.0),
        where="doc_id = 1",
        select=["doc_id"],
        t_srs_epsg=3347,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 1 and "lang" not in r.asDict()
    assert r["geom_wkt"].startswith("POLYGON((")
    x0 = float(r["geom_wkt"].split("((")[1].split()[0])
    assert abs(x0) > 1e5  # projected meters, not degrees


def test_ogr2ogr_explode_and_nlt(spark):
    df = spark.createDataFrame(
        [(1, "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")],
        ["doc_id", "geom_wkt"],
    )
    out = ogr2ogr_layer(df, explode_collections=True, nlt="POLYGON").collect()
    assert len(out) == 2
    assert all(r["geom_wkt"].startswith("POLYGON(") for r in out)


def test_ogr2ogr_clipsrc_and_sql(spark):
    df = spark.createDataFrame(
        [
            (1, "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"),   # straddles clip
            (2, "POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))"),  # outside
        ],
        ["doc_id", "geom_wkt"],
    )
    out = ogr2ogr_layer(
        df,
        sql="SELECT doc_id, geom_wkt FROM layer",
        clipsrc=(2.0, 2.0, 20.0, 3.0),
    ).collect()
    got = {r["doc_id"]: r["geom_wkt"] for r in out}
    assert 2 not in got  # fully outside -> dropped
    # clipped piece of 1 = rect (2,2)-(4,3), area 2
    from gdal_spark import geometry as GM

    assert abs(GM.parse_wkt(got[1]).area() - 2.0) < 1e-9


def test_dissolve_touching_squares(spark):  # noqa: F811
    from gdal_spark.ogr2ogr import dissolve
    from gdal_spark.functions import geometry as SG
    from pyspark.sql import functions as F
    rows = []
    # key 'a': squares x=0,1,2 touching in a row; key 'b': x=5 and x=7
    # disjoint
    for k, xs in (("a", [0, 1, 2]), ("b", [5, 7])):
        for x in xs:
            rows.append((k, f"POLYGON (({x} 0, {x + 1} 0, {x + 1} 1,"
                            f" {x} 1, {x} 0))"))
    df = spark.createDataFrame(rows, "k string, geom_wkt string")
    out = dissolve(df, ["k"]).toPandas().set_index("k")
    import pandas as pd
    a = out.loc["a"]
    assert a["n_parts"] == 3
    ga = a["geom_wkt"]
    area = spark.createDataFrame([(ga,)], "w string").select(
        SG.st_area(F.col("w")).alias("ar")).collect()[0]["ar"]
    assert abs(area - 3.0) < 1e-9
    b = out.loc["b"]
    assert b["n_parts"] == 2
    gb = b["geom_wkt"]
    areab = spark.createDataFrame([(gb,)], "w string").select(
        SG.st_area(F.col("w")).alias("ar")).collect()[0]["ar"]
    assert abs(areab - 2.0) < 1e-9
    assert gb.startswith("MULTIPOLYGON")


def test_st_transform_crs_and_s_srs(spark):
    """-s_srs/-t_srs: a Lambert-93 layer reprojected into LAEA Europe
    must match the numpy hub composition vertex by vertex; the
    ogr2ogr_layer s_srs_epsg path drives the same kernel."""
    lons = np.array([-1.0, 3.0, 6.5])
    lats = np.array([43.5, 46.5, 49.0])
    x93, y93 = crs.transform_points_np(2154, lons, lats)
    wkt = "LINESTRING(" + ", ".join(
        f"{x93[i]!r} {y93[i]!r}" for i in range(3)) + ")"
    df = spark.createDataFrame([(1, wkt)], ["id", "geom_wkt"])

    out = df.select(
        SG.st_transform_crs("geom_wkt", 2154, 3035, prec=6).alias("t")
    ).collect()[0]["t"]
    pts = [tuple(map(float, p.split())) for p in
           out[out.index("(") + 1: out.rindex(")")].split(",")]
    xt, yt = crs.grid_transform_np(2154, 3035)[0](x93, y93)
    for i, (x, y) in enumerate(pts):
        assert abs(x - xt[i]) < 1e-5 and abs(y - yt[i]) < 1e-5

    piped = ogr2ogr_layer(df, s_srs_epsg=2154, t_srs_epsg=3035,
                          t_srs_prec=6).collect()[0]["geom_wkt"]
    assert piped == out


def test_t_srs_accepts_proj4_string(spark):
    """ogr2ogr -t_srs takes a PROJ.4 parameter string (the reference
    accepts any SRS definition there); result must equal the
    EPSG-coded path."""
    df = spark.createDataFrame(
        [(1, "LINESTRING(-100 50, -95 55)")], ["id", "geom_wkt"])
    by_code = ogr2ogr_layer(df, t_srs_epsg=3347,
                            t_srs_prec=6).collect()[0]["geom_wkt"]
    by_str = ogr2ogr_layer(
        df, t_srs_prec=6,
        t_srs_epsg="+proj=lcc +lat_1=49 +lat_2=77 +lat_0=63.390675"
                   " +lon_0=-91.86666666666666 +x_0=6200000"
                   " +y_0=3000000 +datum=NAD83 +units=m +no_defs",
    ).collect()[0]["geom_wkt"]
    assert by_str == by_code
