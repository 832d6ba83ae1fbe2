import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from gdal_spark.graticule import _float_count, graticule_lines, graticule_segments


def test_float_count_quirk():
    """mkgraticule.float_range rounds a fractional step count UP."""
    assert _float_count(-90.0, 105.0, 30.0) == 7       # 6.5 -> 7
    assert _float_count(0.0, 10.0, 5.0) == 2           # exact stays
    assert _float_count(0.0, 11.0, 5.0) == 3


def test_graticule_segments_matches_reference_loops(spark):
    """Distributed segments == the reference's nested float_range
    loops (mkgraticule.py:95-120), including substep clamping."""
    def float_range(start, stop, step):
        steps = (stop - start) / step
        if steps != int(steps):
            steps += 1.0
        return [i * step + start for i in range(int(steps))]

    step, sub = 45.0, 15.0
    exp = set()
    for lat in float_range(-90, 90 + step / 2, step):
        for lon in float_range(-180, 180 - sub / 2, sub):
            exp.add(("lat", lon, lat, lon + sub, lat))
    for lon in float_range(-180, 180 + step / 2, step):
        for lat in float_range(-90, 90 - sub / 2, sub):
            exp.add(("lon", lon, lat, lon, lat + sub))
    got = {
        (r["kind"], r["x0"], r["y0"], r["x1"], r["y1"])
        for r in graticule_segments(spark, step, sub).collect()
    }
    assert got == exp


def test_graticule_lines_wkt(spark):
    """Connected mode emits one LINESTRING per full lat/lon line with
    vertices every substep across the whole range (+substep/2 end)."""
    rows = graticule_lines(spark, 90.0, 90.0).collect()
    by = {(r["kind"], r["at"]): r for r in rows}
    # lat lines at -90,0,90 x vertices -180..180 step 90 => 5 vertices
    assert by[("lat", 0.0)]["n_vertices"] == 5
    assert by[("lat", 0.0)]["wkt"] == (
        "LINESTRING (-180.0 0.0, -90.0 0.0, 0.0 0.0, 90.0 0.0, 180.0 0.0)"
    )
    assert by[("lon", -180.0)]["n_vertices"] == 3
    assert sorted({k for k, _ in by}) == ["lat", "lon"]


def test_junction_table_string_and_list(spark):
    from gdal_spark.layers import build_junction_table

    df = spark.createDataFrame(
        [Row(gml_id="a", href="#t1"), Row(gml_id="b", href="t2")]
    )
    got = {(r["f_id"], r["s_id"])
           for r in build_junction_table(df, "gml_id", "href",
                                         "f_id", "s_id").collect()}
    assert got == {("a", "t1"), ("b", "t2")}
    df2 = spark.createDataFrame(
        [Row(gml_id="c", hrefs=["#u1", "#u2"])]
    )
    got2 = {(r["f_id"], r["s_id"])
            for r in build_junction_table(df2, "gml_id", "hrefs",
                                          "f_id", "s_id").collect()}
    assert got2 == {("c", "u1"), ("c", "u2")}


def test_gcps_to_geotransform_recovers_affine(spark):
    from gdal_spark.gcp import gcps_to_geotransform_df

    gt = (10.0, 0.25, 0.01, -5.0, -0.02, -0.5)
    rng = np.random.RandomState(6)
    pts = rng.uniform(0, 1000, size=(200, 2))
    rows = [
        Row(px=float(px), py=float(py),
            gx=float(gt[0] + gt[1] * px + gt[2] * py),
            gy=float(gt[3] + gt[4] * px + gt[5] * py))
        for px, py in pts
    ]
    out = gcps_to_geotransform_df(spark.createDataFrame(rows))
    assert np.allclose(out["gt"], gt, atol=1e-9)
    wf = out["world_file"]
    assert np.allclose(
        wf,
        (gt[1], gt[4], gt[2], gt[5],
         gt[0] + 0.5 * gt[1] + 0.5 * gt[2],
         gt[3] + 0.5 * gt[4] + 0.5 * gt[5]),
        atol=1e-9,
    )
