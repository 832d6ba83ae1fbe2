"""NetCDF-3 classic driver tests: header codec, layout parity with an
independent numpy decode, the single-record-var no-padding special
case, CDF-2 offset switch, and the map-only scan plan."""

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.netcdf import (
    NC_DTYPES, open_netcdf, parse_header, plan_netcdf, read_netcdf,
    write_netcdf,
)
from tests.conftest import spark  # noqa: F401


def _grid_df(spark, ny, nx):
    return (
        spark.range(ny).select(F.col("id").alias("y"))
        .crossJoin(spark.range(nx).select(F.col("id").alias("x")))
        .select("y", "x",
                ((F.col("y") * 131 + F.col("x")) % 251 - 17)
                .cast("double").alias("value"))
    )


def test_header_roundtrip(tmp_path):
    arrays = [
        {"name": "grid", "dims": [("y", 24), ("x", 37)], "dtype": "int16",
         "atts": {"units": "m"}},
        {"name": "t", "dims": [("time", 0), ("p", 29)], "dtype": "float32",
         "atts": {"scale_factor": 0.25, "add_offset": 3.0}},
    ]
    plan = plan_netcdf("/dev/null", arrays, numrecs=11,
                       gatts={"title": "gdal_spark test"})
    hdr = parse_header(plan["header"])
    assert hdr["version"] == 1
    assert hdr["numrecs"] == 11
    assert hdr["dims"] == [("y", 24), ("x", 37), ("time", 0), ("p", 29)]
    assert hdr["gatts"]["title"] == "gdal_spark test"
    g, t = hdr["vars"]["grid"], hdr["vars"]["t"]
    assert g["begin"] == plan["begins"]["grid"] and not g["is_record"]
    assert t["begin"] == plan["begins"]["t"] and t["is_record"]
    assert t["atts"]["scale_factor"] == 0.25
    # single record var float32: recsize = 29*4 (already 4-aligned)
    assert hdr["recsize"] == 29 * 4


def test_single_short_record_var_unpadded():
    # spec special case: one record var of short, inner size 3 -> 6-byte
    # records, NO padding between records
    plan = plan_netcdf("/dev/null",
                       [{"name": "s", "dims": [("time", 0), ("k", 3)],
                         "dtype": "int16"}], numrecs=4)
    hdr = parse_header(plan["header"])
    assert hdr["recsize"] == 6
    assert plan["end"] == plan["begins"]["s"] + 4 * 6


def test_cdf2_switch():
    # a fixed var big enough to push offsets past 2^31 selects CDF-2
    plan = plan_netcdf("/dev/null",
                       [{"name": "big", "dims": [("n", 700_000_000)],
                         "dtype": "int32"},
                        {"name": "after", "dims": [("m", 4)],
                         "dtype": "int32"}])
    assert plan["version"] == 2
    hdr = parse_header(plan["header"])
    assert hdr["version"] == 2
    assert hdr["vars"]["after"]["begin"] == plan["begins"]["after"]
    assert plan["begins"]["after"] > 0x7FFFFFFF


def test_write_read_roundtrip(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "rt.nc")
    ny, nx, nt, npp = 24, 37, 11, 29
    grid = _grid_df(spark, ny, nx)
    packed = (
        spark.range(nt).select(F.col("id").alias("time"))
        .crossJoin(spark.range(npp).select(F.col("id").alias("p")))
        .select("time", "p", F.when(
            (F.col("time") * 53 + F.col("p") * 7) % 113 == 0, F.lit(-999.0)
        ).otherwise(((F.col("time") * 53 + F.col("p") * 7) % 113 - 9)
                    .cast("double")).alias("value"))
    )
    write_netcdf(path, [
        {"name": "grid", "dims": [("y", ny), ("x", nx)], "dtype": "int16",
         "df": grid},
        {"name": "t", "dims": [("time", 0), ("p", npp)], "dtype": "float32",
         "atts": {"scale_factor": 0.25, "add_offset": 3.0,
                  "_FillValue": -999.0}, "df": packed},
    ], numrecs=nt, strip_elems=128)  # tiny strips: exercise multi-strip

    # independent numpy decode straight from the parsed offsets
    hdr = open_netcdf(path)
    with open(path, "rb") as f:
        raw = f.read()
    g = hdr["vars"]["grid"]
    garr = np.frombuffer(
        raw, dtype=NC_DTYPES[g["nc_type"]],
        count=ny * nx, offset=g["begin"]).reshape(ny, nx)
    yy, xx = np.mgrid[0:ny, 0:nx]
    assert (garr == (yy * 131 + xx) % 251 - 17).all()
    t = hdr["vars"]["t"]
    recs = np.stack([
        np.frombuffer(raw, dtype=NC_DTYPES[t["nc_type"]], count=npp,
                      offset=t["begin"] + k * hdr["recsize"])
        for k in range(nt)])
    tt, pp = np.mgrid[0:nt, 0:npp]
    want = np.where((tt * 53 + pp * 7) % 113 == 0, -999.0,
                    (tt * 53 + pp * 7) % 113 - 9).astype(np.float32)
    assert (recs == want).all()

    # distributed read back, unpacked
    arr = read_netcdf(spark, path, "t", strip_elems=64)
    assert arr.shape == (nt, npp)
    pdf = arr.to_rows().toPandas().sort_values(["time", "p"])
    got = pdf["value"].to_numpy(dtype="float64").reshape(nt, npp)
    wantu = np.where(want == -999.0, np.nan,
                     want.astype("float64") * 0.25 + 3.0)
    assert np.allclose(got, wantu, equal_nan=True)

    garr2 = read_netcdf(spark, path, "grid")
    view = garr2.get_view("[::5, 3:37:7]")
    vv = view.to_rows().toPandas().sort_values(["y", "x"])
    sub = (yy * 131 + xx) % 251 - 17
    assert (vv["value"].to_numpy().reshape(5, 5)
            == sub[::5, 3:37:7]).all()


def test_read_plan_map_only(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "p.nc")
    write_netcdf(path, [
        {"name": "grid", "dims": [("y", 16), ("x", 16)], "dtype": "int32",
         "df": _grid_df(spark, 16, 16)}])
    plan = read_netcdf(spark, path, "grid").df \
        ._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "Window" not in plan


def test_magic_rejects_garbage():
    with pytest.raises(ValueError):
        parse_header(b"HDF5" + b"\x00" * 64)
    with pytest.raises(ValueError):
        parse_header(b"CDF\x05" + b"\x00" * 64)


def test_netcdf_as_raster_cf(spark, tmp_path):  # noqa: F811
    from pyspark.sql import functions as F

    from gdal_spark.netcdf import netcdf_as_raster

    path = str(tmp_path / "cf.nc")
    ny, nx = 20, 30
    # CF south-up: latitude ascending 10..10+(ny-1)*0.5
    lats = spark.range(ny).select(
        F.col("id").alias("lat_i"),
        (10.0 + F.col("id") * 0.5).alias("value"))
    lons = spark.range(nx).select(
        F.col("id").alias("lon_i"),
        (-40.0 + F.col("id") * 0.25).alias("value"))
    grid = (
        spark.range(ny).select(F.col("id").alias("lat"))
        .crossJoin(spark.range(nx).select(F.col("id").alias("lon")))
        .select("lat", "lon",
                (F.col("lat") * 100 + F.col("lon")).cast("double")
                .alias("value"))
    )
    write_netcdf(path, [
        {"name": "lat", "dims": [("lat", ny)], "dtype": "float64",
         "df": lats.select(F.col("lat_i").alias("lat"), "value")},
        {"name": "lon", "dims": [("lon", nx)], "dtype": "float64",
         "df": lons.select(F.col("lon_i").alias("lon"), "value")},
        {"name": "t2m", "dims": [("lat", ny), ("lon", nx)],
         "dtype": "float32", "df": grid},
    ])
    tiles = netcdf_as_raster(spark, path, "t2m", tile_px=32)
    rows = tiles.collect()
    assert len(rows) == 1
    r = rows[0]
    gt = r["geotransform"]
    # origin = top-left corner: lon[0]-dx/2, lat[-1]+dy/2; dy negative
    assert abs(gt[0] - (-40.0 - 0.125)) < 1e-9
    assert abs(gt[1] - 0.25) < 1e-9
    assert abs(gt[3] - (10.0 + 9.5 + 0.25)) < 1e-9
    assert abs(gt[5] - (-0.5)) < 1e-9
    assert r["crs"] == "EPSG:4326"
    a = np.frombuffer(r["data"], dtype=np.float32).reshape(32, 32)
    # row 0 = northernmost = lat index ny-1 -> value 1900+lon
    assert a[0, 0] == 1900.0 and a[0, 29] == 1929.0
    assert a[ny - 1, 0] == 0.0
