"""OSM PBF reader: block index plan, dense-node delta decode, tags,
ways, multi-block files, block-parallel equivalence."""

import numpy as np
import pytest

from gdal_spark.osm import read_osm_pbf, scan_blocks, write_osm_pbf
from tests.conftest import spark  # noqa: F401


def _mk_nodes(n):
    rng = np.random.default_rng(9)
    out = []
    for i in range(n):
        out.append({
            "id": 1000 + i * 3,
            "lat": float(rng.uniform(-85, 85)),
            "lon": float(rng.uniform(-180, 180)),
            "tags": ({"name": f"n{i}", "amenity": "cafe"}
                     if i % 5 == 0 else {}),
        })
    return out


def test_roundtrip_nodes_single_block(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "a.osm.pbf")
    nodes = _mk_nodes(200)
    write_osm_pbf(path, nodes)
    blocks = scan_blocks(path)
    assert [t for _, _, t in blocks] == ["OSMHeader", "OSMData"]
    out = read_osm_pbf(spark, path, "nodes").toPandas() \
        .sort_values("id").reset_index(drop=True)
    assert len(out) == 200
    for i, nd in enumerate(nodes):
        assert out.loc[i, "id"] == nd["id"]
        assert abs(out.loc[i, "lat"] - nd["lat"]) < 1e-9
        assert abs(out.loc[i, "lon"] - nd["lon"]) < 1e-9
        assert dict(out.loc[i, "tags"]) == nd["tags"]


def test_multi_block_parallel(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "b.osm.pbf")
    nodes = _mk_nodes(5000)
    write_osm_pbf(path, nodes, nodes_per_block=700)
    blocks = scan_blocks(path)
    assert sum(1 for _, _, t in blocks if t == "OSMData") == 8
    out = read_osm_pbf(spark, path, "nodes").toPandas()
    assert len(out) == 5000
    assert sorted(out["id"]) == sorted(n["id"] for n in nodes)


def test_ways_refs_delta(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "c.osm.pbf")
    nodes = _mk_nodes(10)
    ways = [
        {"id": 7, "refs": [1000, 1003, 1006, 1009],
         "tags": {"highway": "primary"}},
        {"id": 9, "refs": [1027, 1000], "tags": {}},
    ]
    write_osm_pbf(path, nodes, ways)
    out = read_osm_pbf(spark, path, "ways").toPandas() \
        .sort_values("id").reset_index(drop=True)
    assert len(out) == 2
    assert list(out.loc[0, "refs"]) == [1000, 1003, 1006, 1009]
    assert dict(out.loc[0, "tags"]) == {"highway": "primary"}
    assert list(out.loc[1, "refs"]) == [1027, 1000]


def test_granularity_100(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "g.osm.pbf")
    nodes = [{"id": 1, "lat": 52.5243700, "lon": 13.4105300,
              "tags": {}}]
    write_osm_pbf(path, nodes, granularity=100)
    out = read_osm_pbf(spark, path, "nodes").toPandas()
    # 100-nanodegree grid: error bounded by 1e-7 deg
    assert abs(out.loc[0, "lat"] - 52.52437) < 1e-7
    assert abs(out.loc[0, "lon"] - 13.41053) < 1e-7


def test_plan_map_only(spark, tmp_path):  # noqa: F811
    path = str(tmp_path / "p.osm.pbf")
    write_osm_pbf(path, _mk_nodes(50))
    plan = read_osm_pbf(spark, path)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning" not in plan and "Window" not in plan


def test_osm_lines_layer(spark, tmp_path):  # noqa: F811
    from gdal_spark.osm import osm_lines
    path = str(tmp_path / "l.osm.pbf")
    nodes = [{"id": i, "lat": float(i), "lon": float(2 * i), "tags": {}}
             for i in range(20)]
    ways = [
        {"id": 100, "refs": [0, 3, 5], "tags": {"highway": "a"}},
        {"id": 101, "refs": [7, 999], "tags": {}},  # 999 missing
        {"id": 102, "refs": [4, 999998], "tags": {}},  # 1 vertex: drop
    ]
    write_osm_pbf(path, nodes, ways)
    n = read_osm_pbf(spark, path, "nodes")
    w = read_osm_pbf(spark, path, "ways")
    out = osm_lines(n, w).toPandas().sort_values("id")
    assert list(out["id"]) == [100]
    assert out.iloc[0]["wkt"] == "LINESTRING (0.0 0.0, 6.0 3.0, 10.0 5.0)"
    assert out.iloc[0]["n_points"] == 3
    assert dict(out.iloc[0]["tags"]) == {"highway": "a"}
