"""Linear referencing kernels (OGRSimpleCurve Value/Project/getSubLine,
ogr/ogrlinestring.cpp:1949,2022,2076) and their column surface."""

import numpy as np
import pytest

from gdal_spark import geometry as GM


def L(coords):
    return GM.Geom(
        "linestring",
        [(np.array([c[0] for c in coords], float),
          np.array([c[1] for c in coords], float))],
    )


LSHAPE = L([(0, 0), (4, 0), (4, 3)])  # length 7


def test_line_value():
    assert GM.line_value(LSHAPE, -1) == (0.0, 0.0)       # < 0 -> start
    assert GM.line_value(LSHAPE, 0) == (0.0, 0.0)
    assert GM.line_value(LSHAPE, 2) == (2.0, 0.0)
    assert GM.line_value(LSHAPE, 4) == (4.0, 0.0)        # at the corner
    assert GM.line_value(LSHAPE, 5.5) == (4.0, 1.5)
    assert GM.line_value(LSHAPE, 99) == (4.0, 3.0)       # past end -> end


def test_line_value_skips_zero_segments():
    g = L([(0, 0), (0, 0), (4, 0)])
    assert GM.line_value(g, 1) == (1.0, 0.0)


def test_line_project():
    assert GM.line_project(LSHAPE, 2.0, 1.0) == pytest.approx(2.0)
    assert GM.line_project(LSHAPE, 5.0, 1.5) == pytest.approx(5.5)
    # before the start clamps to measure 0
    assert GM.line_project(LSHAPE, -3.0, 0.0) == pytest.approx(0.0)
    # equidistant to both segments -> earliest segment wins (GEOS tie rule)
    assert GM.line_project(LSHAPE, 3.0, 1.0) == pytest.approx(3.0)


def test_line_sub_interior():
    g = GM.line_sub(LSHAPE, 1.0, 6.0)
    xs, ys = g.parts[0]
    assert list(zip(xs, ys)) == [(1.0, 0.0), (4.0, 0.0), (4.0, 2.0)]


def test_line_sub_single_segment():
    g = GM.line_sub(LSHAPE, 1.0, 2.0)
    xs, ys = g.parts[0]
    assert list(zip(xs, ys)) == [(1.0, 0.0), (2.0, 0.0)]


def test_line_sub_clamps_and_rejects():
    # clamped to [0, len]; from=0 keeps the reference's duplicated
    # first vertex quirk (ogrlinestring.cpp:2076 if-branch + add loop)
    g = GM.line_sub(LSHAPE, -5.0, 99.0)
    xs, ys = g.parts[0]
    assert (xs[0], ys[0]) == (0.0, 0.0) and (xs[1], ys[1]) == (0.0, 0.0)
    assert (xs[-1], ys[-1]) == (4.0, 3.0)
    assert GM.line_sub(LSHAPE, 6.0, 2.0) is None         # from > to
    assert GM.line_sub(LSHAPE, 7.0, 8.0) is None         # from >= len


def test_line_sub_ratio():
    g = GM.line_sub(LSHAPE, 1.0 / 7.0, 6.0 / 7.0, as_ratio=True)
    xs, ys = g.parts[0]
    assert list(zip(xs, ys)) == [(1.0, 0.0), (4.0, 0.0), (4.0, 2.0)]


def test_column_surface(spark):
    from pyspark.sql import functions as F

    from gdal_spark.functions import geometry as SG

    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 4 0, 4 3)")], ["fid", "wkt"]
    )
    row = df.select(
        SG.st_line_interpolate("wkt", F.lit(5.5)).alias("ip"),
        SG.st_line_locate("wkt", F.lit(5.0), F.lit(1.5)).alias("m"),
        SG.st_line_substring("wkt", F.lit(1.0), F.lit(6.0)).alias("sub"),
        SG.st_line_substring("wkt", F.lit(9.0), F.lit(2.0)).alias("bad"),
    ).collect()[0]
    assert row["ip"] == "POINT(4.0000000 1.5000000)"
    assert row["m"] == pytest.approx(5.5)
    assert row["sub"] == (
        "LINESTRING(1.0000000 0.0000000, 4.0000000 0.0000000, "
        "4.0000000 2.0000000)"
    )
    assert row["bad"] is None
