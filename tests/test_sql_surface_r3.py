"""Round-3 SQL-surface additions: OGR SQL special fields, DDL fast
paths, the ExecuteSQL spatial-filter argument, the registered ST_*
SQL function suite, ogr_deflate/ogr_inflate, forceTo* conversions,
and EMPTY-geometry handling."""

import pandas as pd
import pytest

from gdal_spark import geometry as GM
from gdal_spark.ogr_sql_exec import execute_ogr_sql


# ------------------------------------------------------- pure-python layer
def test_force_multipoint_and_empty():
    g = GM.force_multipoint(GM.parse_wkt("POINT(5 6)"))
    assert g.kind == "multipoint"
    assert GM.to_wkt(g, 0) == "MULTIPOINT(5 6)"
    e = GM.parse_wkt("POLYGON EMPTY")
    assert e.area() == 0.0
    assert GM.to_wkt(e) == "POLYGON EMPTY"
    assert not GM.intersects(GM.parse_wkt("POLYGON((0 0,1 0,1 1,0 1))"), e)


def test_force_multilinestring_rings():
    g = GM.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4), (1 1, 2 1, 2 2, 1 2))")
    ml = GM.force_multilinestring(g)
    assert ml.kind == "multilinestring" and len(ml.parts) == 2
    # members are closed rings
    xs, ys = ml.parts[0]
    assert xs[0] == xs[-1] and ys[0] == ys[-1]


def test_force_linestring_chains():
    m = GM.parse_wkt("MULTILINESTRING((0 0, 1 1), (1 1, 2 0), (5 5, 6 6))")
    out = GM.force_linestring(m)
    assert out.kind == "multilinestring" and len(out.parts) == 2
    # reversed-orientation chains also merge
    m2 = GM.parse_wkt("MULTILINESTRING((0 0, 1 1), (2 0, 1 1))")
    assert GM.to_wkt(GM.force_linestring(m2), 0) == "LINESTRING(0 0, 1 1, 2 0)"


# ------------------------------------------------------------ textual SQL
@pytest.fixture()
def pt_layers(spark):
    rows = [(i, f"n{i}", f"POINT({i % 10} {i // 10})") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, name string, geom string")
    return {"pts": df}


def test_special_fields(spark, pt_layers):
    out = execute_ogr_sql(
        spark,
        "SELECT FID, id, OGR_GEOMETRY, OGR_GEOM_AREA, OGR_STYLE "
        "FROM pts WHERE FID < 3 ORDER BY FID",
        pt_layers,
    ).collect()
    assert [r["FID"] for r in out] == [0, 1, 2]
    assert out[0]["OGR_GEOMETRY"] == "POINT"
    assert out[0]["OGR_GEOM_AREA"] == 0.0
    assert out[0]["OGR_STYLE"] is None


def test_star_select_hides_special_fields(spark, pt_layers):
    out = execute_ogr_sql(
        spark, "SELECT * FROM pts WHERE FID < 3", pt_layers
    )
    assert out.columns == ["id", "name", "geom"]
    assert out.count() == 3


def test_ddl_sequence(spark, pt_layers):
    assert execute_ogr_sql(
        spark, "CREATE INDEX ON pts USING name", pt_layers) is None
    assert ("pts", "name") in pt_layers["__indexes__"]
    execute_ogr_sql(spark, "ALTER TABLE pts RENAME COLUMN name TO label",
                    pt_layers)
    execute_ogr_sql(spark, "ALTER TABLE pts ADD COLUMN score float",
                    pt_layers)
    assert dict(pt_layers["pts"].dtypes)["score"] == "double"
    execute_ogr_sql(spark, "ALTER TABLE pts DROP COLUMN score", pt_layers)
    execute_ogr_sql(spark, "DROP INDEX ON pts", pt_layers)
    assert not pt_layers["__indexes__"]
    execute_ogr_sql(spark, "DROP TABLE pts", pt_layers)
    assert "pts" not in pt_layers


def test_spatial_filter_rect_is_codegen_only(spark, pt_layers):
    out = execute_ogr_sql(
        spark,
        "SELECT id FROM pts",
        pt_layers,
        spatial_filter="POLYGON((0 0, 5 0, 5 1, 0 1, 0 0))",
    )
    # x in [0,5], y in [0,1] inclusive: ids 0-5, 10-15
    assert sorted(r["id"] for r in out.collect()) == [
        0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # rect path stays JVM-side


def test_spatial_filter_general_polygon(spark, pt_layers):
    # triangle filter -> bbox prefilter + exact UDF stage
    out = execute_ogr_sql(
        spark,
        "SELECT id FROM pts",
        pt_layers,
        spatial_filter="POLYGON((0 0, 4 0, 0 2, 0 0))",
    )
    ids = sorted(r["id"] for r in out.collect())
    assert 0 in ids and 3 in ids
    assert 9 not in ids


# ----------------------------------------------------- SQL function suite
def test_register_sql_functions_and_codec(spark):
    from gdal_spark.functions.sqlfuncs import register_sql_functions

    names = register_sql_functions(spark)
    assert "ST_Area" in names and "ogr_deflate" in names
    spark.createDataFrame(
        pd.DataFrame({"w": ["POLYGON((0 0, 3 0, 3 3, 0 3, 0 0))"],
                      "t": ["abcabcabc" * 30]})
    ).createOrReplaceTempView("t_sqlfuncs")
    row = spark.sql(
        "SELECT ST_Area(w) AS a, "
        "CAST(ogr_inflate(ogr_deflate(t)) AS STRING) = t AS rt, "
        "length(ogr_deflate(t)) < length(t) AS smaller "
        "FROM t_sqlfuncs"
    ).collect()[0]
    assert row["a"] == 9.0 and row["rt"] and row["smaller"]


# ------------------------------------------------- gdal2xyz / bm25 (r3b)
def test_to_xyz_values_and_decimation(spark):
    from gdal_spark import raster as RST
    from gdal_spark import synth

    tiles = synth.tiles_src_df(spark, 2, 1)
    out = RST.to_xyz(tiles, step=128).collect()
    # global grid 512x256 / 128 -> 4 x 2 rows
    assert len(out) == 8
    import numpy as np
    arr0 = synth.tile_pixels_np(0, 0)
    r = next(r for r in out if r.px == 128 and r.py == 128)
    assert r.value == float(arr0[128, 128])
    # cross-tile phase: px=384 lives in tile 1 at local x=128
    arr1 = synth.tile_pixels_np(1, 0)
    r2 = next(r for r in out if r.px == 384 and r.py == 0)
    assert r2.value == float(arr1[0, 128])


def test_to_xyz_skip_nodata(spark):
    from gdal_spark import raster as RST
    from gdal_spark import synth

    tiles = synth.tiles_src_df(spark, 1, 1)
    n_all = RST.to_xyz(tiles).count()
    # synth pixels never equal nodata=0, so counts match
    assert n_all == 256 * 256
    assert RST.to_xyz(tiles, skip_nodata=True).count() == n_all


def test_bm25_scores_basics(spark):
    import pandas as pd

    from gdal_spark.functions.text import bm25_scores

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "spark spark query engine",
                    "query planner only",
                    "nothing relevant here",
                ],
            }
        )
    )
    out = {r.doc_id: r.bm25 for r in
           bm25_scores(df, ["spark", "query"]).collect()}
    assert out[1] > out[2] > out[3] == 0.0
    # stats pass + scoring pass stay Python-free (JVM expressions only)
    plan = bm25_scores(df, ["spark"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan


def test_wkb_multi_roundtrip():
    for w in ["MULTIPOINT(1 2, 3 4)",
              "MULTILINESTRING((0 0, 1 1), (2 2, 3 3, 4 4))"]:
        g = GM.parse_wkt(w)
        g2 = GM.parse_wkb(GM.to_wkb(g))
        assert GM.to_wkt(g2, 0) == w.replace(", (", ", (")


def test_compare_rasters(spark):
    from gdal_spark import raster as RST
    from gdal_spark import synth, tiling

    tiles = synth.tiles_src_df(spark, 2, 1)
    same = RST.compare_rasters(tiles, tiles).collect()[0]
    assert (same.n_pixels, same.n_diff, same.max_diff) == (131072, 0, 0.0)
    shifted = tiling.translate(tiles, scale=(1.0, 2.0))
    diff = RST.compare_rasters(tiles, shifted).collect()[0]
    assert (diff.n_diff, diff.max_diff) == (131072, 2.0)
