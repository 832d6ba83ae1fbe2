"""GRIB2 driver tests (gdal_spark/grib.py).

Reference behavior: gdal/frmts/grib/gribdataset.cpp (band per
message); autotest/gdrivers/grib.py (simple packing, bitmap grids).
"""

import numpy as np
import pytest

from gdal_spark import grib


def _grids():
    r = np.arange(24).reshape(24, 1)
    c = np.arange(37).reshape(1, 37)
    a = (((r * 131 + c) % 251) - 17) * 0.25
    r2 = np.arange(11).reshape(11, 1)
    c2 = np.arange(29).reshape(1, 29)
    b = (((r2 * 53 + c2 * 7) % 113) - 9) * 0.5
    b = np.where((r2 * 7 + c2 * 3) % 19 == 0, np.nan, b)
    return a, b


def _write(path, a, b):
    grib.write_grib2(path, [
        dict(data=a, lat0=60.0, lon0=10.0, dlat=0.5, dlon=0.5,
             decimals=2, category=3, parameter=5, forecast_hour=6),
        dict(data=b, lat0=40.0, lon0=350.0, dlat=1.0, dlon=1.0,
             decimals=1),
    ])


def _assemble(rows, band, nj, ni, tile_px):
    g = np.full((nj, ni), np.nan)
    for r in rows:
        if r.band != band:
            continue
        t = np.frombuffer(r.data, dtype=np.float64).reshape(
            r.height, r.width)
        g[r.tile_y * tile_px:r.tile_y * tile_px + r.height,
          r.tile_x * tile_px:r.tile_x * tile_px + r.width] = t
    return g


def test_metadata(tmp_path):
    a, b = _grids()
    p = str(tmp_path / "t.grib2")
    _write(p, a, b)
    md = grib.grib2_metadata(p)
    assert [m["band"] for m in md] == [1, 2]
    assert md[0]["category"] == 3 and md[0]["parameter"] == 5
    assert md[0]["forecast_hour"] == 6 and not md[0]["bitmap"]
    assert md[1]["bitmap"] and md[1]["decimals"] == 1
    assert md[0]["ni"] == 37 and md[0]["nj"] == 24
    assert md[1]["lat0"] == 40.0 and md[1]["dlon"] == 1.0


@pytest.mark.parametrize("tile_px", [16, 8, 256])
def test_roundtrip_exact(spark, tmp_path, tile_px):
    """Bit-exact decode at several strip widths — the strip-split bit
    offsets (no-bitmap path) and the whole-message bitmap path must
    agree with the written grids exactly."""
    a, b = _grids()
    p = str(tmp_path / "t.grib2")
    _write(p, a, b)
    rows = grib.read_grib2(spark, p, tile_px=tile_px).collect()
    g1 = _assemble(rows, 1, 24, 37, tile_px)
    g2 = _assemble(rows, 2, 11, 29, tile_px)
    assert np.array_equal(g1, a)
    m = np.isfinite(b)
    assert np.array_equal(np.isfinite(g2), m)
    assert np.array_equal(g2[m], b[m])


def test_georef(spark, tmp_path):
    a, b = _grids()
    p = str(tmp_path / "t.grib2")
    _write(p, a, b)
    rows = grib.read_grib2(spark, p, tile_px=256).collect()
    t = [r for r in rows if r.band == 1 and r.tile_x == 0
         and r.tile_y == 0][0]
    # pixel-is-point: geotransform origin is half a cell out from the
    # first grid-point coordinate (same convention as ehdr.py ULXMAP)
    assert t.geotransform == [9.75, 0.5, 0.0, 60.25, 0.0, -0.5]
    assert t.crs == "EPSG:4326"


def test_scan_map_only(spark, tmp_path):
    a, b = _grids()
    p = str(tmp_path / "t.grib2")
    _write(p, a, b)
    plan = grib.read_grib2(spark, p)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
    assert "Sort" not in plan and "Window" not in plan


def test_unsupported_inputs(tmp_path):
    p = str(tmp_path / "bad.grib2")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 20)
    with pytest.raises(ValueError):
        grib.grib2_metadata(p)
    # edition 1 gated like the reference gates unknown templates
    with open(p, "wb") as f:
        f.write(b"GRIB\x00\x00\x00\x01" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        grib.grib2_metadata(p)


def test_reference_value_range_guard():
    with pytest.raises(NotImplementedError):
        grib.write_grib2("/tmp/never.grib2", [
            dict(data=np.array([[1e9]]), lat0=0, lon0=0,
                 dlat=1, dlon=1, decimals=0)])


# ------------------------- complex packing (templates 5.2 / 5.3)

def _smooth():
    r = np.arange(60).reshape(60, 1)
    c = np.arange(81).reshape(1, 81)
    return 1013.0 + 8.0 * np.sin(r / 15.0) + 5.0 * np.cos(c / 20.0)


@pytest.mark.parametrize("order", [0, 1, 2])
def test_complex_roundtrip_exact(spark, tmp_path, order):
    """Templates 5.2 (order 0) and 5.3 (orders 1/2): decode must be
    bit-exact (single float64 division) for any packing the writer
    emits; per-message granularity, tiles still split on read."""
    a = (((np.arange(40).reshape(40, 1) * 131
           + np.arange(53).reshape(1, 53) * 17) % 509) - 200) * 0.25
    p = str(tmp_path / f"cx{order}.grib2")
    grib.write_grib2(p, [dict(
        data=a, lat0=60.0, lon0=10.0, dlat=0.5, dlon=0.5, decimals=2,
        packing="complex", order=order)])
    md = grib.grib2_metadata(p)
    assert md[0]["packing"] == (3 if order else 2)
    rows = grib.read_grib2(spark, p, tile_px=16).collect()
    g = _assemble(rows, 1, 40, 53, 16)
    np.testing.assert_array_equal(g, a)


def test_complex_with_bitmap(spark, tmp_path):
    """Section-6 bitmap composes with complex packing: only present
    cells enter the group stream; missing decode to NaN."""
    b = _smooth()
    b = np.where((np.arange(60).reshape(60, 1) * 7
                  + np.arange(81).reshape(1, 81) * 3) % 23 == 0,
                 np.nan, b)
    p = str(tmp_path / "cxbmp.grib2")
    grib.write_grib2(p, [dict(
        data=b, lat0=50.0, lon0=0.0, dlat=0.25, dlon=0.25, decimals=2,
        packing="complex", order=2)])
    rows = grib.read_grib2(spark, p, tile_px=32).collect()
    g = _assemble(rows, 1, 60, 81, 32)
    np.testing.assert_array_equal(np.isnan(g), np.isnan(b))
    # D=2 quantization: decode is exactly rint(v*100)/100 via the
    # writer's deterministic E=0 / R=min (float32-exact) packing
    q = np.rint(b[~np.isnan(b)] * 100.0)
    np.testing.assert_array_equal(g[~np.isnan(b)], q / 100.0)


def test_spatial_differencing_compresses_smooth_fields(tmp_path):
    """The point of template 5.3: a pressure-like smooth field packs
    substantially smaller under order-2 differencing than under
    simple packing (degrib's default for NCEP output)."""
    sizes = {}
    for name, msg in [
        ("simple", {}),
        ("cx2", {"packing": "complex", "order": 2}),
    ]:
        p = str(tmp_path / f"{name}.grib2")
        grib.write_grib2(p, [dict(
            data=_smooth(), lat0=60.0, lon0=10.0, dlat=0.5, dlon=0.5,
            decimals=2, **msg)])
        sizes[name] = grib._index_messages(p)[0]["data_len"]
    assert sizes["cx2"] < 0.6 * sizes["simple"]


def test_complex_negative_h_values(tmp_path):
    """Signed-magnitude extra descriptors: a decreasing field makes
    hmin (and with negative data h1/h2 relative ints) exercise the
    sign bit."""
    import os

    a = -np.arange(400, dtype=np.float64).reshape(20, 20) * 0.5
    p = str(tmp_path / "neg.grib2")
    grib.write_grib2(p, [dict(
        data=a, lat0=10.0, lon0=0.0, dlat=0.5, dlon=0.5, decimals=1,
        packing="complex", order=2)])
    m = grib._index_messages(p)[0]
    with open(p, "rb") as f:
        raw = os.pread(f.fileno(), m["data_len"], m["data_off"])
    fv = grib._decode_complex(raw, m)
    y = (m["R"] + fv * 2.0 ** m["E"]) / 10.0 ** m["D"]
    np.testing.assert_array_equal(y.reshape(20, 20), a)


# ----------------------- Lambert conformal grids (template 3.30)

def _lcc_msg(a, **kw):
    base = dict(data=a, grid="lcc", la1=21.138, lo1=-122.72, lad=25.0,
                lov=-95.0, latin1=25.0, latin2=25.0, dx=12191.0,
                dy=12191.0, decimals=2)
    base.update(kw)
    return base


def test_lcc_grid_roundtrip(spark, tmp_path):
    """Template 3.30 (NCEP NAM-style tangent cone, scan 0x40 south-
    first): values bit-exact, rows returned north-up."""
    a = (((np.arange(40).reshape(40, 1) * 131
           + np.arange(55).reshape(1, 55) * 17) % 509) - 200) * 0.25
    p = str(tmp_path / "lcc.grib2")
    grib.write_grib2(p, [_lcc_msg(a)])
    md = grib.grib2_metadata(p)[0]
    assert md["grid"] == "lcc" and md["latin1"] == 25.0
    rows = grib.read_grib2(spark, p, tile_px=16).collect()
    g = _assemble(rows, 1, 40, 55, 16)
    np.testing.assert_array_equal(g, a)


def test_lcc_georef_and_proj4_closure(spark, tmp_path):
    """The grid's georeferencing closes through the engine's own
    proj4 importer: inverse-projecting the computed first-point
    (x1, y1) through the emitted +proj=lcc string recovers La1/Lo1;
    the tangent cone (Latin1 == Latin2) exercises the LCC-1SP
    n -> sin(phi1) limit."""
    from gdal_spark import crs, proj4

    a = np.arange(12.0).reshape(3, 4)
    p = str(tmp_path / "geo.grib2")
    grib.write_grib2(p, [_lcc_msg(a, decimals=0)])
    m = grib._index_messages(p)[0]
    md = grib.grib2_metadata(p)[0]
    code = proj4.register_proj4(md["proj4"])
    lo, la = crs.np_transform_fn(code, inverse=True)(
        np.array([m["x1"]]), np.array([m["y1"]]))
    assert abs(lo[0] - -122.72) < 1e-9 and abs(la[0] - 21.138) < 1e-9
    rows = grib.read_grib2(spark, p, tile_px=16).collect()
    gt = rows[0].geotransform
    # scan 0x40: first point is the SW corner -> UL edge is
    # y1 + (nj-1)*dy + dy/2
    assert abs(gt[3] - (m["y1"] + 2 * 12191.0 + 12191.0 / 2)) < 1e-6
    assert abs(gt[0] - (m["x1"] - 12191.0 / 2)) < 1e-6
    assert gt[5] == -12191.0
    assert rows[0].crs.startswith("+proj=lcc")


def test_lcc_complex_packing_combination(spark, tmp_path):
    """The realistic NCEP combination: Lambert grid + order-2 complex
    packing (whole-message decode + south-first flip compose)."""
    a = (((np.arange(40).reshape(40, 1) * 131
           + np.arange(55).reshape(1, 55) * 17) % 509) - 200) * 0.25
    p = str(tmp_path / "lcccx.grib2")
    grib.write_grib2(p, [_lcc_msg(a, packing="complex", order=2)])
    rows = grib.read_grib2(spark, p, tile_px=16).collect()
    g = _assemble(rows, 1, 40, 55, 16)
    np.testing.assert_array_equal(g, a)


def test_lcc_tangent_cone_limit():
    """latin1 == latin2 must hit the n = sin(phi1) limit, matching
    the 2SP formula's value as the parallels merge."""
    from gdal_spark import crs

    B = crs._NpBackend
    x1, y1 = crs.lcc_forward(B, np.array([-100.0]), np.array([35.0]),
                             phi1=25.0, phi2=25.0, phi0=25.0,
                             lon0=-95.0, a=6371229.0, f=0.0)
    x2, y2 = crs.lcc_forward(B, np.array([-100.0]), np.array([35.0]),
                             phi1=25.0 - 1e-7, phi2=25.0 + 1e-7,
                             phi0=25.0, lon0=-95.0, a=6371229.0, f=0.0)
    assert abs(x1[0] - x2[0]) < 0.5 and abs(y1[0] - y2[0]) < 0.5


def test_ps_grid_roundtrip_both_hemispheres(spark, tmp_path):
    """Template 3.20 (NCEP polar stereographic, scan 0x40): values
    bit-exact, georeferencing closes through the engine's proj4
    importer for both hemispheres."""
    from gdal_spark import crs, proj4

    a = (((np.arange(24).reshape(24, 1) * 37
           + np.arange(31).reshape(1, 31) * 11) % 211) - 90) * 0.5
    for lad, la1, lo1 in ((60.0, 44.0, -125.0), (-60.0, -44.0, 155.0)):
        p = str(tmp_path / f"ps{int(lad)}.grib2")
        grib.write_grib2(p, [dict(
            data=a, grid="ps", la1=la1, lo1=lo1, lad=lad, lov=-105.0,
            dx=47625.0, dy=47625.0, decimals=1)])
        md = grib.grib2_metadata(p)[0]
        assert md["grid"] == "ps" and md["lad"] == lad
        rows = grib.read_grib2(spark, p, tile_px=16).collect()
        g = _assemble(rows, 1, 24, 31, 16)
        np.testing.assert_array_equal(g, a)
        m = grib._index_messages(p)[0]
        code = proj4.register_proj4(md["proj4"])
        lo, la = crs.np_transform_fn(code, inverse=True)(
            np.array([m["x1"]]), np.array([m["y1"]]))
        # the stere inverse returns the principal branch around lon0;
        # compare modulo 360
        assert abs((lo[0] - lo1 + 180.0) % 360.0 - 180.0) < 1e-9
        assert abs(la[0] - la1) < 1e-9
        assert rows[0].crs.startswith("+proj=stere")
