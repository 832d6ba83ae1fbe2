"""FlatGeobuf driver: flatbuffer codec, packed-R-tree layout invariants,
distributed write->read roundtrip, index-strip splitting."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.fgb import (
    MAGIC, NODE_BYTES, _level_bounds, hilbert_u32, read_fgb,
    read_header, write_fgb,
)
from gdal_spark.geometry import parse_wkt
from tests.conftest import spark  # noqa: F401


def test_level_bounds_matches_reference_shape():
    # packedrtree.cpp generateLevelBounds: leaf first, root last (0,1)
    b, total = _level_bounds(1234, 16)
    assert b[-1] == (0, 1)
    assert b[0][1] - b[0][0] == 1234
    assert total == 1234 + 78 + 5 + 1
    b1, t1 = _level_bounds(16, 16)
    assert b1 == [(1, 17), (0, 1)] and t1 == 17


def test_hilbert_reference_values():
    # corners of the 16-bit grid
    v = hilbert_u32([0, 65535, 0, 65535], [0, 0, 65535, 65535])
    assert v[0] == 0
    assert v[1] == 0xFFFFFFFF


@pytest.fixture(scope="module")
def rt(spark, tmp_path_factory):  # noqa: F811
    path = str(tmp_path_factory.mktemp("fgb") / "layer.fgb")
    rows = []
    rng = np.random.default_rng(5)
    for i in range(500):
        x, y = float(rng.uniform(-100, 100)), float(rng.uniform(-50, 50))
        if i % 4 == 0:
            w = f"POINT ({x:.6f} {y:.6f})"
        elif i % 4 == 1:
            w = (f"LINESTRING ({x:.6f} {y:.6f}, {x + 1:.6f} {y + 2:.6f},"
                 f" {x + 3:.6f} {y:.6f})")
        elif i % 4 == 2:
            w = (f"POLYGON (({x:.6f} {y:.6f}, {x + 2:.6f} {y:.6f},"
                 f" {x + 2:.6f} {y + 2:.6f}, {x:.6f} {y:.6f}))")
        else:
            w = (f"MULTIPOLYGON ((({x:.6f} {y:.6f}, {x + 1:.6f} {y:.6f},"
                 f" {x + 1:.6f} {y + 1:.6f}, {x:.6f} {y:.6f})),"
                 f" (({x + 3:.6f} {y:.6f}, {x + 4:.6f} {y:.6f},"
                 f" {x + 4:.6f} {y + 1:.6f}, {x + 3:.6f} {y:.6f})))")
        rows.append((i, w, f"n{i}", float(i) * 0.5, i % 2 == 0))
    df = spark.createDataFrame(
        rows, "src_id long, wkt string, name string, val double,"
              " flag boolean")
    n = write_fgb(df, path, name="test_layer")
    return path, rows, n


def test_write_header_and_magic(rt):
    path, rows, n = rt
    assert n == 500
    with open(path, "rb") as f:
        assert f.read(7) == MAGIC[:7]
    hdr = read_header(path)
    assert hdr["count"] == 500
    assert hdr["name"] == "test_layer"
    assert [c[0] for c in hdr["cols"]] == ["src_id", "name", "val",
                                           "flag"]
    b, total = _level_bounds(500, hdr["node_size"])
    assert hdr["index_bytes"] == total * NODE_BYTES


def test_index_nodes_cover_features(rt):
    path, rows, n = rt
    hdr = read_header(path)
    leaf_lo, leaf_hi = hdr["level_bounds"][0]
    with open(path, "rb") as f:
        f.seek(hdr["index_offset"])
        raw = f.read(hdr["index_bytes"])
    nodes = np.frombuffer(raw, dtype=[("x0", "<f8"), ("y0", "<f8"),
                                      ("x1", "<f8"), ("y1", "<f8"),
                                      ("off", "<u8")])
    leaves = nodes[leaf_lo:leaf_hi]
    # leaf offsets strictly increasing from 0 (Hilbert-sorted stream)
    offs = leaves["off"].astype(np.int64)
    assert offs[0] == 0
    assert (np.diff(offs) > 0).all()
    # root bbox == dataset envelope
    root = nodes[0]
    assert root["x0"] == min(l["x0"] for l in leaves)
    assert root["y1"] == max(l["y1"] for l in leaves)
    # every parent covers its children
    bounds = hdr["level_bounds"]
    for lvl in range(1, len(bounds)):
        plo, phi = bounds[lvl]
        clo, chi = bounds[lvl - 1]
        for pi in range(plo, phi):
            first = int(nodes[pi]["off"])
            assert clo <= first < chi
            kids = nodes[first:min(first + hdr["node_size"], chi)]
            assert nodes[pi]["x0"] <= kids["x0"].min() + 1e-12
            assert nodes[pi]["x1"] >= kids["x1"].max() - 1e-12


def test_roundtrip_values(spark, rt):  # noqa: F811
    path, rows, n = rt
    out = read_fgb(spark, path).toPandas()
    assert len(out) == 500
    by_src = out.set_index("src_id")
    for i, w, name, val, flag in rows:
        r = by_src.loc[i]
        assert r["name"] == name and r["val"] == val
        assert bool(r["flag"]) == flag
        g0, g1 = parse_wkt(w), parse_wkt(r["wkt"])
        assert g0.kind == g1.kind

        def flat(g):
            out = []
            if g.kind in ("polygon", "multipolygon"):
                for poly in g.parts:
                    for xs, ys in poly:
                        out += list(xs) + list(ys)
            else:
                for xs, ys in g.parts:
                    out += list(xs) + list(ys)
            return np.asarray(out)
        np.testing.assert_allclose(flat(g1), flat(g0), atol=1e-9)


def test_strip_split_matches_whole(spark, rt):  # noqa: F811
    path, rows, n = rt
    small = read_fgb(spark, path, features_per_strip=37).toPandas()
    big = read_fgb(spark, path, features_per_strip=100000).toPandas()
    assert sorted(small["src_id"]) == sorted(big["src_id"])
    a = small.sort_values("fid").reset_index(drop=True)
    b = big.sort_values("fid").reset_index(drop=True)
    assert (a["wkt"] == b["wkt"]).all()


def test_hilbert_locality(spark, rt):  # noqa: F811
    # consecutive fids should be spatially close on average vs random
    path, rows, n = rt
    out = read_fgb(spark, path).toPandas().sort_values("fid")
    nums = out["wkt"].str.extract(r"\((-?[\d.]+) (-?[\d.]+)")
    xs = nums[0].astype(float).to_numpy()
    ys = nums[1].astype(float).to_numpy()
    d_seq = np.hypot(np.diff(xs), np.diff(ys)).mean()
    rng = np.random.default_rng(0)
    p = rng.permutation(len(xs))
    d_rand = np.hypot(np.diff(xs[p]), np.diff(ys[p])).mean()
    assert d_seq < 0.5 * d_rand


def test_empty_layer(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "e.fgb")
    df = spark.createDataFrame([], "wkt string, a long")
    assert write_fgb(df, path) == 0
    hdr = read_header(path)
    assert hdr["count"] == 0
    out = read_fgb(spark, path).toPandas()
    assert len(out) == 0


def test_read_plan_map_only(spark, rt):  # noqa: F811
    path, rows, n = rt
    plan = read_fgb(spark, path)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "hashpartitioning" not in plan and "Window" not in plan


def test_bbox_search(spark, rt):  # noqa: F811
    path, rows, n = rt
    from gdal_spark.fgb import _search_index, read_header
    bbox = (-20.0, -10.0, 20.0, 10.0)
    out = read_fgb(spark, path, bbox=bbox).toPandas()
    # oracle: recompute feature bboxes from the inputs
    want = set()
    for i, w, name, val, flag in rows:
        g = parse_wkt(w)
        xs, ys = [], []
        if g.kind in ("polygon", "multipolygon"):
            for poly in g.parts:
                for rx, ry in poly:
                    xs += list(rx)
                    ys += list(ry)
        else:
            for rx, ry in g.parts:
                xs += list(rx)
                ys += list(ry)
        if (min(xs) <= bbox[2] and max(xs) >= bbox[0]
                and min(ys) <= bbox[3] and max(ys) >= bbox[1]):
            want.add(i)
    assert set(out["src_id"]) == want
    assert 0 < len(want) < n  # the filter actually prunes
    # the planned strip set must be smaller than the full scan
    hdr = read_header(path)
    hits = _search_index(path, hdr, bbox)
    assert len(hits) == len(want)
