"""DXF driver: hand-written entity stream parse, chunk alignment,
write->read roundtrip, POLYLINE/VERTEX/SEQEND, CIRCLE/ARC arcs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.curves import parse_curve_wkt
from gdal_spark.dxf import concat_dxf_dir, read_dxf, write_dxf
from gdal_spark.geometry import parse_wkt
from tests.conftest import spark  # noqa: F401

HAND = (
    "  0\nSECTION\n  2\nHEADER\n  9\n$ACADVER\n  1\nAC1009\n"
    "  0\nENDSEC\n  0\nSECTION\n  2\nENTITIES\n"
    "  0\nPOINT\n  8\nL1\n  5\n2A\n 10\n1.5\n 20\n2.5\n"
    "  0\nLINE\n  8\nL1\n 10\n0\n 20\n0\n 11\n10\n 21\n5\n"
    "  0\nLWPOLYLINE\n  8\nL2\n 90\n4\n 70\n1\n"
    " 10\n0\n 20\n0\n 10\n4\n 20\n0\n 10\n4\n 20\n4\n 10\n0\n 20\n4\n"
    "  0\nPOLYLINE\n  8\nL3\n 70\n0\n"
    "  0\nVERTEX\n 10\n1\n 20\n1\n  0\nVERTEX\n 10\n2\n 20\n3\n"
    "  0\nVERTEX\n 10\n5\n 20\n3\n  0\nSEQEND\n"
    "  0\nCIRCLE\n  8\nL4\n 10\n10\n 20\n10\n 40\n2\n"
    "  0\nARC\n  8\nL4\n 10\n0\n 20\n0\n 40\n1\n 50\n0\n 51\n90\n"
    "  0\nTEXT\n  8\nL5\n 10\n7\n 20\n8\n 40\n1\n  1\nhello world\n"
    "  0\nENDSEC\n  0\nEOF\n"
)


@pytest.fixture()
def hand_file(tmp_path):
    p = tmp_path / "hand.dxf"
    p.write_text(HAND)
    return str(p)


def test_hand_parse(spark, hand_file):  # noqa: F811
    out = read_dxf(spark, hand_file).toPandas().sort_values("fid")
    assert list(out["etype"]) == [
        "POINT", "LINE", "LWPOLYLINE", "POLYLINE", "CIRCLE", "ARC",
        "TEXT"]
    assert out.iloc[0]["layer"] == "L1" and out.iloc[0]["handle"] == "2A"
    assert out.iloc[0]["wkt"] == "POINT (1.5 2.5)"
    assert out.iloc[1]["wkt"] == "LINESTRING (0 0, 10 5)"
    assert out.iloc[2]["wkt"] == \
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert out.iloc[3]["wkt"] == "LINESTRING (1 1, 2 3, 5 3)"
    circ = parse_curve_wkt(out.iloc[4]["wkt"])
    xs, ys = circ.parts[0] if circ.kind == "linestring" else circ
    r = np.hypot(np.asarray(xs) - 10, np.asarray(ys) - 10)
    assert np.allclose(r, 2.0, atol=1e-6)
    arc = parse_curve_wkt(out.iloc[5]["wkt"])
    axs, ays = arc.parts[0]
    assert abs(axs[0] - 1) < 1e-9 and abs(ays[0]) < 1e-9
    assert abs(axs[-1]) < 1e-9 and abs(ays[-1] - 1) < 1e-9
    assert out.iloc[6]["text"] == "hello world"


def test_chunk_alignment_matches_single_chunk(spark, hand_file):  # noqa: F811
    one = read_dxf(spark, hand_file).toPandas().sort_values("fid")
    tiny = read_dxf(spark, hand_file, chunk_bytes=64) \
        .toPandas().sort_values("fid")
    assert list(one["fid"]) == list(tiny["fid"])
    assert list(one["wkt"]) == list(tiny["wkt"])


def test_write_read_roundtrip(spark, tmp_path):  # noqa: F811
    rows = []
    for i in range(200):
        if i % 3 == 0:
            w = f"POINT ({i} {i % 7})"
        elif i % 3 == 1:
            w = f"LINESTRING ({i} 0, {i} 5, {i + 1} 9)"
        else:
            w = f"POLYGON (({i} 0, {i + 2} 0, {i + 2} 2, {i} 0))"
        rows.append((f"lay{i % 4}", w, None))
    df = spark.createDataFrame(rows, "layer string, wkt string, text string")
    d = str(tmp_path / "parts")
    out_path = str(tmp_path / "out.dxf")
    write_dxf(df, d, text_col="text")
    concat_dxf_dir(d, out_path)
    back = read_dxf(spark, out_path, chunk_bytes=2048).toPandas()
    assert len(back) == 200
    got = sorted(back["wkt"])
    want = []
    for lay, w, _ in rows:
        g = parse_wkt(w)
        if g.kind == "polygon":
            xs, ys = g.parts[0][0]
            pts = list(zip(xs, ys))
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            body = ", ".join(f"{x:.10g} {y:.10g}" for x, y in pts)
            want.append(f"POLYGON (({body}))")
        else:
            want.append(w)
    assert got == sorted(want)
    # layer survives
    assert set(back["layer"]) == {"lay0", "lay1", "lay2", "lay3"}


def test_single_file_mode_and_text(spark, tmp_path):  # noqa: F811
    p = str(tmp_path / "s.dxf")
    df = spark.createDataFrame(
        [("notes", "POINT (3 4)", "label A")],
        "layer string, wkt string, text string")
    write_dxf(df, p, text_col="text", single_file=True)
    out = read_dxf(spark, p).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["etype"] == "TEXT"
    assert out.iloc[0]["text"] == "label A"
    assert out.iloc[0]["wkt"] == "POINT (3 4)"


def test_plan_map_only(spark, hand_file):  # noqa: F811
    plan = read_dxf(spark, hand_file)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning" not in plan and "Window" not in plan
