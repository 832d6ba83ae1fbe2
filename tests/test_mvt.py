"""MVT codec + MBTiles vector-tile driver: varint/zigzag codec,
geometry command roundtrip, tile cover + clip, distributed
encode->decode roundtrip, props dictionaries."""

import gzip
import math
import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.mvt import (
    _decode_geom, _encode_geom, _unzz, _varint, _zz, parse_mvt_blob,
    read_mvt_mbtiles, write_mvt_mbtiles,
)
from tests.conftest import spark  # noqa: F401

R = 6378137.0
ORIGIN = math.pi * R


def test_zigzag():
    for v in (0, 1, -1, 63, -64, 2**31 - 1, -(2**31)):
        assert _unzz(_zz(v)) == v
    assert _zz(0) == 0 and _zz(-1) == 1 and _zz(1) == 2 and _zz(-2) == 3


def test_geom_roundtrip_line():
    xs = np.array([10, 20, 20], dtype=np.int64)
    ys = np.array([10, 10, 30], dtype=np.int64)
    gt, enc = _encode_geom("line", [(xs, ys)])
    assert gt == 2
    vals = []
    pos = 0
    while pos < len(enc):
        b, sh = 0, 0
        while True:
            byte = enc[pos]
            pos += 1
            b |= (byte & 0x7F) << sh
            if not byte & 0x80:
                break
            sh += 7
        vals.append(b)
    parts = _decode_geom(2, vals)
    assert parts == [([10, 20, 20], [10, 10, 30])]


def test_geom_roundtrip_polygon_drops_closing_vertex():
    xs = np.array([0, 100, 100, 0, 0], dtype=np.int64)
    ys = np.array([0, 0, 100, 100, 0], dtype=np.int64)
    gt, enc = _encode_geom("poly", [(xs, ys)])
    assert gt == 3
    vals = []
    pos = 0
    while pos < len(enc):
        b, sh = 0, 0
        while True:
            byte = enc[pos]
            pos += 1
            b |= (byte & 0x7F) << sh
            if not byte & 0x80:
                break
            sh += 7
        vals.append(b)
    # MoveTo(1) + LineTo(3) + ClosePath
    assert vals[0] == (1 & 7) | (1 << 3)
    parts = _decode_geom(3, vals)
    assert parts[0][0][-1] == parts[0][0][0]  # re-closed on decode
    assert len(parts[0][0]) == 5


def _tile_lonlat(z, x, y, fx, fy):
    """lon/lat of the fractional position (fx, fy) inside tile
    (z, x, y) — fy measured from the tile top (y down)."""
    n = 1 << z
    size = 2 * ORIGIN / n
    mx = -ORIGIN + (x + fx) * size
    my = ORIGIN - (y + fy) * size
    lon = mx / ORIGIN * 180.0
    lat = math.degrees(2 * math.atan(math.exp(my / R)) - math.pi / 2)
    return lon, lat


def test_write_read_roundtrip(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "v.mbtiles")
    z = 4
    # one point per tile center for four tiles, one line crossing two
    # tiles, one square polygon inside a tile
    feats = []
    for i, (tx, ty) in enumerate([(3, 5), (4, 5), (3, 6), (12, 2)]):
        lon, lat = _tile_lonlat(z, tx, ty, 0.5, 0.5)
        feats.append(("pts", i, f"POINT ({lon:.12f} {lat:.12f})", {"n": str(i)}))
    ax, ay = _tile_lonlat(z, 6, 3, 0.25, 0.5)
    bx, by = _tile_lonlat(z, 7, 3, 0.75, 0.5)
    feats.append(("lines", 10, f"LINESTRING ({ax:.12f} {ay:.12f}, {bx:.12f} {by:.12f})", {}))
    p0 = _tile_lonlat(z, 9, 9, 0.25, 0.25)
    p1 = _tile_lonlat(z, 9, 9, 0.75, 0.25)
    p2 = _tile_lonlat(z, 9, 9, 0.75, 0.75)
    p3 = _tile_lonlat(z, 9, 9, 0.25, 0.75)
    ring = ", ".join(f"{x:.12f} {y:.12f}" for x, y in [p0, p1, p2, p3, p0])
    feats.append(("polys", 20, f"POLYGON (({ring}))", {"kind": "sq"}))

    df = spark.createDataFrame(
        feats, "layer string, fid long, wkt string,"
               " props map<string,string>")
    n = write_mvt_mbtiles(df, path, z)
    assert n >= 6  # 4 point tiles + 2 line tiles + 1 poly (overlaps ok)

    con = sqlite3.connect(path)
    fmt = dict(con.execute("SELECT name, value FROM metadata"))["format"]
    assert fmt == "pbf"
    blob = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=? AND"
        " tile_column=? AND tile_row=?", (z, 9, (1 << z) - 1 - 9)
    ).fetchone()[0]
    con.close()
    assert bytes(blob[:2]) == b"\x1f\x8b"
    parsed = parse_mvt_blob(bytes(blob))
    assert len(parsed) == 1
    name, fid, gtype, parts, props = parsed[0]
    assert (name, fid, gtype, props) == ("polys", 20, 3, {"kind": "sq"})
    xs, ys = parts[0]
    assert min(xs) == 1024 and max(xs) == 3072  # 0.25/0.75 * 4096
    assert min(ys) == 1024 and max(ys) == 3072

    out = read_mvt_mbtiles(spark, path).toPandas()
    pts = out[out["layer"] == "pts"]
    assert len(pts) == 4
    for r in pts.itertuples(index=False):
        assert r.xs == [2048] and r.ys == [2048]
    lines = out[out["layer"] == "lines"].sort_values("x")
    assert list(lines["x"]) == [6, 7]
    # the piece in tile 6 enters at x=1024 and exits at the buffered
    # clip edge 4096+80
    row6 = lines.iloc[0]
    assert row6["xs"][0] == 1024 and row6["xs"][-1] == 4096 + 80
    assert list(row6["ys"]) == [2048, 2048]


def test_point_in_buffer_appears_in_neighbor(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "b.mbtiles")
    z = 3
    # point 20/4096 tile units inside tile (2,2)'s right edge: inside
    # tile (3,2)'s 80-unit buffer
    lon, lat = _tile_lonlat(z, 2, 2, 1.0 - 20.0 / 4096, 0.5)
    df = spark.createDataFrame(
        [("p", 1, f"POINT ({lon:.12f} {lat:.12f})", {})],
        "layer string, fid long, wkt string, props map<string,string>")
    write_mvt_mbtiles(df, path, z)
    out = read_mvt_mbtiles(spark, path).toPandas().sort_values("x")
    assert list(out["x"]) == [2, 3]
    assert out.iloc[0]["xs"] == [4096 - 20]
    assert out.iloc[1]["xs"] == [-20]  # negative: buffer zone


def test_polygon_clipped_at_tile_edge(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "c.mbtiles")
    z = 2
    # square spanning the boundary between tiles (1,1) and (2,1)
    p0 = _tile_lonlat(z, 1, 1, 0.75, 0.25)
    p1 = _tile_lonlat(z, 2, 1, 0.25, 0.25)
    p2 = _tile_lonlat(z, 2, 1, 0.25, 0.75)
    p3 = _tile_lonlat(z, 1, 1, 0.75, 0.75)
    ring = ", ".join(f"{x:.12f} {y:.12f}" for x, y in [p0, p1, p2, p3, p0])
    df = spark.createDataFrame(
        [("q", 5, f"POLYGON (({ring}))", {})],
        "layer string, fid long, wkt string, props map<string,string>")
    write_mvt_mbtiles(df, path, z)
    out = read_mvt_mbtiles(spark, path).toPandas().sort_values("x")
    assert list(out["x"]) == [1, 2]
    left = out.iloc[0]
    # clipped at the buffered right edge 4096+80
    assert max(left["xs"]) == 4096 + 80 and min(left["xs"]) == 3072
    right = out.iloc[1]
    assert min(right["xs"]) == -80 and max(right["xs"]) == 1024


def test_empty_props_and_gzip_determinism(spark, tmp_path):  # noqa: F811
    p1, p2 = str(tmp_path / "d1.mbtiles"), str(tmp_path / "d2.mbtiles")
    df = spark.createDataFrame(
        [("l", 1, "POINT (0.1 0.1)", {"a": "1", "b": "2"})],
        "layer string, fid long, wkt string, props map<string,string>")
    write_mvt_mbtiles(df, p1, 1)
    write_mvt_mbtiles(df, p2, 1)
    b1 = sqlite3.connect(p1).execute(
        "SELECT tile_data FROM tiles").fetchone()[0]
    b2 = sqlite3.connect(p2).execute(
        "SELECT tile_data FROM tiles").fetchone()[0]
    assert bytes(b1) == bytes(b2)
    _, _, _, _, props = parse_mvt_blob(bytes(b1))[0]
    assert props == {"a": "1", "b": "2"}


def test_pyramid_zoom_range(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "pyr.mbtiles")
    lon, lat = _tile_lonlat(5, 10, 12, 0.5, 0.5)
    df = spark.createDataFrame(
        [("p", 1, f"POINT ({lon:.12f} {lat:.12f})", {})],
        "layer string, fid long, wkt string, props map<string,string>")
    n = write_mvt_mbtiles(df, path, 2, max_zoom=5)
    assert n == 4  # one tile per level 2..5
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert (meta["minzoom"], meta["maxzoom"]) == ("2", "5")
    zs = sorted(z for (z,) in con.execute(
        "SELECT DISTINCT zoom_level FROM tiles"))
    con.close()
    assert zs == [2, 3, 4, 5]
    out = read_mvt_mbtiles(spark, path).toPandas()
    assert len(out) == 4
    r5 = out[out["zoom"] == 5].iloc[0]
    assert (r5["x"], r5["y"]) == (10, 12)
    assert r5["xs"] == [2048]
    r2 = out[out["zoom"] == 2].iloc[0]
    assert (r2["x"], r2["y"]) == (1, 1)  # 10>>3, 12>>3
