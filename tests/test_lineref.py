"""ogrlineref distributed linear referencing vs the scalar kernels
(geometry.line_project / line_value / line_sub, themselves
reference-parity-tested) as the local oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.geometry import line_project, line_sub, line_value, parse_wkt
from gdal_spark.lineref import (
    create_parts, get_coordinates, get_position, get_subline,
    path_segments, project_points,
)
from tests.conftest import spark  # noqa: F401


def _rand_path(rng, n=12, scale=100.0):
    steps = rng.uniform(-1, 1, size=(n, 2)) * scale / n
    pts = np.cumsum(steps, axis=0) + rng.uniform(0, 10, size=2)
    return pts


def _wkt(pts):
    return "LINESTRING (" + ", ".join(
        f"{x:.10g} {y:.10g}" for x, y in pts) + ")"


@pytest.fixture(scope="module")
def paths(spark):  # noqa: F811
    rng = np.random.default_rng(42)
    rows = [(p, _wkt(_rand_path(rng))) for p in range(8)]
    return spark.createDataFrame(rows, "path_id long, wkt string"), rows


def test_path_segments(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 3 4, 3 10)")], "path_id long, wkt string")
    segs = path_segments(df).orderBy("seg_i").collect()
    assert len(segs) == 2
    assert segs[0]["seg_len"] == 5.0 and segs[0]["cum0"] == 0.0
    assert segs[1]["seg_len"] == 6.0 and segs[1]["cum0"] == 5.0
    assert segs[0]["path_len"] == 11.0


def test_project_points_vs_scalar(spark, paths):  # noqa: F811
    df, rows = paths
    rng = np.random.default_rng(7)
    pts = [(p, float(rng.uniform(-20, 120)), float(rng.uniform(-20, 120)))
           for p in range(8) for _ in range(6)]
    pdf = spark.createDataFrame(pts, "path_id long, x double, y double")
    got = project_points(path_segments(df), pdf).collect()
    geoms = {p: parse_wkt(w) for p, w in rows}
    assert len(got) == len(pts)
    for r in got:
        want = line_project(geoms[r["path_id"]], r["x"], r["y"])
        assert abs(r["along"] - want) < 1e-6


def _local_parts(wkt, repers):
    """Reference-logic local oracle for create_parts(step=None):
    projected repers sorted by m, leading/trailing end parts."""
    g = parse_wkt(wkt)
    pl = sum(np.hypot(np.diff(g.parts[0][0]), np.diff(g.parts[0][1])))
    pr = sorted((m, line_project(g, x, y)) for m, x, y in repers)
    ds = [d for _, d in pr]
    if ds[0] > ds[1]:  # reversed
        xs, ys = g.parts[0]
        g = parse_wkt(_wkt(list(zip(xs[::-1], ys[::-1]))))
        pr = sorted((m, line_project(g, x, y)) for m, x, y in repers)
        ds = [d for _, d in pr]
    out = []
    if ds[0] > 1e-8:
        out.append((pr[0][0] - ds[0], pr[0][0], 0.0, ds[0]))
    for (m1, d1), (m2, d2) in zip(pr, pr[1:]):
        if d2 - d1 > 1e-8:
            out.append((m1, m2, d1, d2))
    if pl - ds[-1] > 1e-8:
        out.append((pr[-1][0], pr[-1][0] + pl - ds[-1], ds[-1], pl))
    return g, out


def test_create_parts_vs_local(spark, paths):  # noqa: F811
    df, rows = paths
    rng = np.random.default_rng(11)
    reps = []
    for p, w in rows:
        g = parse_wkt(w)
        plen = float(sum(np.hypot(np.diff(g.parts[0][0]),
                                  np.diff(g.parts[0][1]))))
        for k, frac in enumerate((0.15, 0.5, 0.85)):
            x, y = line_value(g, frac * plen)
            reps.append((p, 100.0 * (k + 1), x, y))
    rdf = spark.createDataFrame(reps, "path_id long, m double, x double, y double")
    parts = create_parts(df, rdf, tolerance=1e-6).collect()
    by_path = {}
    for r in parts:
        by_path.setdefault(r["path_id"], []).append(r)
    for p, w in rows:
        _, want = _local_parts(w, [(m, x, y) for q, m, x, y in reps
                                   if q == p])
        got = sorted(by_path[p], key=lambda r: r["mbeg"])
        assert len(got) == len(want), (p, got, want)
        for r, (m1, m2, d1, d2) in zip(got, want):
            assert abs(r["mbeg"] - m1) < 1e-6
            assert abs(r["mend"] - m2) < 1e-6
            assert abs(r["scale"] - (d2 - d1) / (m2 - m1)) < 1e-6
            # geometric length of the part wkt == d2 - d1
            gg = parse_wkt(r["wkt"])
            glen = float(sum(np.hypot(np.diff(gg.parts[0][0]),
                                      np.diff(gg.parts[0][1]))))
            assert abs(glen - (d2 - d1)) < 1e-6


def test_create_parts_reversed(spark):  # noqa: F811
    # repers measured from the far end -> path must be reversed
    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 10 0, 10 10)")], "path_id long, wkt string")
    rdf = spark.createDataFrame(
        [(1, 100.0, 10.0, 10.0), (1, 120.0, 10.0, 0.0)],
        "path_id long, m double, x double, y double")
    parts = {r["mbeg"]: r for r in create_parts(df, rdf,
                                                tolerance=1e-6).collect()}
    assert set(parts) == {100.0, 120.0}
    assert parts[100.0]["mend"] == 120.0
    p0 = parse_wkt(parts[100.0]["wkt"]).parts[0]
    assert p0[0][0] == 10.0 and p0[1][0] == 10.0  # starts at (10,10)
    # trailing part runs to the original start point
    p1 = parse_wkt(parts[120.0]["wkt"]).parts[0]
    assert p1[0][-1] == 0.0 and p1[1][-1] == 0.0


def test_create_parts_step(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 30 0)")], "path_id long, wkt string")
    rdf = spark.createDataFrame(
        [(1, 10.0, 5.0, 0.0), (1, 50.0, 25.0, 0.0)],
        "path_id long, m double, x double, y double")
    parts = sorted(create_parts(df, rdf, step=10.0, tolerance=1e-6)
                   .collect(), key=lambda r: r["mbeg"])
    # M domain: head part [5,10] (5 units to path start), repers 10..50,
    # tail [50,55]; pickets at 10k
    ms = [(r["mbeg"], r["mend"]) for r in parts]
    assert ms == [(5.0, 10.0), (10.0, 20.0), (20.0, 30.0), (30.0, 40.0),
                  (40.0, 50.0), (50.0, 55.0)]
    # interior scale: 20 geometric units over 40 M -> 0.5
    assert abs(parts[2]["scale"] - 0.5) < 1e-9
    assert abs(parts[0]["scale"] - 1.0) < 1e-9


def test_get_position_get_coordinates_inverse(spark, paths):  # noqa: F811
    df, rows = paths
    rng = np.random.default_rng(3)
    reps = []
    for p, w in rows:
        g = parse_wkt(w)
        plen = float(sum(np.hypot(np.diff(g.parts[0][0]),
                                  np.diff(g.parts[0][1]))))
        for k, frac in enumerate((0.1, 0.6, 0.9)):
            x, y = line_value(g, frac * plen)
            reps.append((p, 50.0 * (k + 1), x, y))
    rdf = spark.createDataFrame(reps, "path_id long, m double, x double, y double")
    parts = create_parts(df, rdf, tolerance=1e-6)
    parts.cache()
    ms = [(p, i, 50.0 + 100.0 * rng.uniform(0.02, 0.98))
          for p in range(8) for i in range(4)]
    mdf = spark.createDataFrame(ms, "path_id long, pos_id long, m double")
    pts = get_coordinates(parts, mdf)
    back = get_position(
        parts, pts.select("path_id", F.col("pos_id").alias("pt_id"),
                          "x", "y"))
    j = {(r["path_id"], r["pt_id"]): r["position"] for r in back.collect()}
    for p, i, m in ms:
        assert abs(j[(p, i)] - m) < 1e-6, (p, i, m, j[(p, i)])


def test_get_subline_single_path(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 10 0, 10 10, 20 10)")],
        "path_id long, wkt string")
    rdf = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0), (1, 30.0, 20.0, 10.0)],
        "path_id long, m double, x double, y double")
    parts = create_parts(df, rdf, tolerance=1e-6)
    out = get_subline(parts, 5.0, 25.0).collect()
    assert len(out) == 1
    got = parse_wkt(out[0]["wkt"]).parts[0]
    want = line_sub(parse_wkt("LINESTRING (0 0, 10 0, 10 10, 20 10)"),
                    5.0, 25.0).parts[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_plans_keyed_no_global_window(spark, paths):  # noqa: F811
    df, _ = paths
    plan = path_segments(df).df if hasattr(path_segments(df), "df") else \
        path_segments(df)
    s = plan._jdf.queryExecution().executedPlan().toString()
    # the only window is keyed by path — no empty-partition global sort
    assert "Window" not in s or "hashpartitioning(path_id" in s
