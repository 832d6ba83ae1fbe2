"""OGRGeometry::segmentize (ogr/ogrlinestring.cpp:2474) and the
densify sample (osgeo_utils/samples/densify.py UNIFORM mode)."""

import numpy as np
import pytest

from gdal_spark import geometry as GM


def test_even_insertion_count_and_spacing():
    g = GM.segmentize(GM.parse_wkt("LINESTRING (10 0, 0 0)"), 3.0)
    xs, ys = g.parts[0]
    # d=10, m=3: floor(sqrt(100/9) - 0.01) = 3 intermediates
    assert np.allclose(xs, [10.0, 7.5, 5.0, 2.5, 0.0])
    assert np.allclose(ys, 0.0)


def test_direction_canonicalization():
    # same line both directions -> same vertex set (ogrlinestring.cpp
    # :2485 "same line followed in both directions")
    a = GM.segmentize(GM.parse_wkt("LINESTRING (0 0, 10 1)"), 3.0)
    b = GM.segmentize(GM.parse_wkt("LINESTRING (10 1, 0 0)"), 3.0)
    ax, ay = a.parts[0]
    bx, by = b.parts[0]
    assert np.array_equal(ax, bx[::-1]) and np.array_equal(ay, by[::-1])


def test_trigger_epsilon():
    # segment exactly at max_length must NOT split (the 1e-5*m^2 slack)
    g = GM.segmentize(GM.parse_wkt("LINESTRING (3 0, 0 0)"), 3.0)
    assert len(g.parts[0][0]) == 2


def test_z_carried_not_interpolated():
    g = GM.segmentize(GM.parse_wkt("LINESTRING Z (10 0 7, 0 0 3)"), 3.0)
    assert list(g.zs) == [7.0, 7.0, 7.0, 7.0, 3.0]


def test_polygon_closing_segment():
    g = GM.segmentize(GM.parse_wkt("POLYGON ((0 0, 8 0, 8 8, 0 0))"), 5.0)
    xs, ys = g.parts[0][0]
    # the closing (8,8)->(0,0) diagonal gains 2 points
    assert len(xs) == 7
    assert 5.333333 == pytest.approx(xs[-2], abs=1e-5)


def test_invalid_max_length():
    with pytest.raises(ValueError, match="strictly positive"):
        GM.segmentize(GM.parse_wkt("LINESTRING (0 0, 1 0)"), 0.0)


def test_udfs(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.functions.geometry import (st_segmentize,
                                               st_segmentize_points)

    df = spark.createDataFrame(
        pd.DataFrame({"w": ["LINESTRING (10 0, 0 0)"]}))
    wkt = df.select(st_segmentize(F.col("w"), 3.0).alias("s")).collect()
    assert "7.5000000" in wkt[0].s
    pts = df.select(
        st_segmentize_points(F.col("w"), 3.0).alias("p")).collect()
    assert [p["x"] for p in pts[0].p] == [10.0, 7.5, 5.0, 2.5, 0.0]
