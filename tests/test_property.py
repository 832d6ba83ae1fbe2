"""Property-based invariants (hypothesis) for the pure-python/numpy
kernels — no SparkSession needed, so these are fast and broad."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark import geometry as GM


def _polyline(coords):
    xs = np.array([c[0] for c in coords], float)
    ys = np.array([c[1] for c in coords], float)
    return GM.Geom("linestring", [(xs, ys)])


coords_st = st.lists(
    st.tuples(
        st.floats(-1000, 1000, allow_nan=False),
        st.floats(-1000, 1000, allow_nan=False),
    ),
    min_size=2,
    max_size=8,
)


def _length(g):
    xs, ys = g.parts[0]
    return float(np.hypot(np.diff(xs), np.diff(ys)).sum())


@settings(max_examples=200, deadline=None)
@given(coords_st, st.floats(0.01, 0.99), st.floats(0.01, 0.99))
def test_line_sub_endpoints_match_value(coords, fa, fb):
    g = _polyline(coords)
    total = _length(g)
    if total <= 0:
        return
    a, b = sorted([fa * total, fb * total])
    if b - a < 1e-9 or a >= total:
        return
    sub = GM.line_sub(g, a, b)
    if sub is None:
        return
    xs, ys = sub.parts[0]
    va = GM.line_value(g, a)
    vb = GM.line_value(g, b)
    assert math.hypot(xs[0] - va[0], ys[0] - va[1]) < 1e-6 * max(1, total)
    assert math.hypot(xs[-1] - vb[0], ys[-1] - vb[1]) < 1e-6 * max(1, total)
    # subline length equals the measure interval
    assert abs(_length(sub) - (b - a)) < 1e-6 * max(1.0, total)


@settings(max_examples=200, deadline=None)
@given(coords_st, st.floats(0.0, 1.0))
def test_project_inverts_value(coords, frac):
    g = _polyline(coords)
    total = _length(g)
    if total <= 0:
        return
    m = frac * total
    x, y = GM.line_value(g, m)
    m2 = GM.line_project(g, x, y)
    # the point at measure m projects back to a measure whose point
    # is the same location (measure itself may differ on self-near
    # polylines — location is the invariant)
    x2, y2 = GM.line_value(g, m2)
    assert math.hypot(x - x2, y - y2) < 1e-6 * max(1.0, total)


_grid = st.integers(-5000, 5000).map(lambda v: v / 100.0)
_gridlen = st.integers(100, 4000).map(lambda v: v / 100.0)


@settings(max_examples=150, deadline=None)
@given(_grid, _grid, _gridlen, _gridlen, _grid, _grid, _gridlen, _gridlen)
def test_boolean_area_partition(ax, ay, aw, ah, bx, by, bw, bh):
    """area(A ∩ B) + area(A \\ B) == area(A) for axis-aligned rects
    through the general polygon-boolean kernel. Coordinates live on a
    0.01 grid — inside the kernel's documented robustness domain
    (features either exactly coincident or separated by >> 1e-8 of
    the span), which still exercises the exact-coincidence paths
    hard (shared edges and corners are common on the grid)."""
    from gdal_spark import boolean as BO

    def rect(x, y, w, h):
        return GM.parse_wkt(
            f"POLYGON(({x} {y}, {x+w} {y}, {x+w} {y+h}, {x} {y+h}, {x} {y}))"
        )

    A = rect(ax, ay, aw, ah)
    B = rect(bx, by, bw, bh)

    def area(op):
        polys = BO.polygon_boolean(A, B, op)
        tot = 0.0
        for rings in polys:
            for i, r in enumerate(rings):
                r = np.asarray(r)
                s = 0.5 * abs(
                    np.dot(r[:, 0], np.roll(r[:, 1], -1))
                    - np.dot(r[:, 1], np.roll(r[:, 0], -1))
                )
                tot += s if i == 0 else -s
        return tot

    a_area = aw * ah
    inter = area("intersection")
    diff = area("difference")
    assert abs((inter + diff) - a_area) < 1e-6 * max(1.0, a_area)


@settings(max_examples=200, deadline=None)
@given(coords_st)
def test_wkb_roundtrip_linestring(coords):
    g = _polyline(coords)
    g2 = GM.parse_wkb(GM.to_wkb(g))
    assert g2.kind == "linestring"
    assert np.array_equal(g2.parts[0][0], g.parts[0][0])
    assert np.array_equal(g2.parts[0][1], g.parts[0][1])


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(-100, 100, allow_nan=False),
                  st.floats(-100, 100, allow_nan=False)),
        min_size=3, max_size=6, unique=True,
    )
)
def test_wkb_roundtrip_polygon(pts):
    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    g = GM.Geom("polygon", [[(xs, ys)]])
    g2 = GM.parse_wkb(GM.to_wkb(g))
    assert g2.kind == "polygon"
    assert np.array_equal(g2.parts[0][0][0], xs)
    assert np.array_equal(g2.parts[0][0][1], ys)


@settings(max_examples=300, deadline=None)
@given(
    st.floats(-179.999, 179.999),
    st.floats(-85.0, 85.0),
    st.integers(1, 18),
)
def test_tile_math_invariants(lon, lat, zoom):
    """gdal2tiles math invariants: tile ids in range; the quadkey has
    zoom digits; the quadkey prefix IS the parent tile's quadkey
    (the property prefix-range pruning relies on); meters roundtrip."""
    from gdal_spark import cells

    tx, ty = cells.np_lonlat_to_tile(np.array([lon]), np.array([lat]), zoom)
    n = 2 ** zoom
    assert 0 <= tx[0] < n and 0 <= ty[0] < n
    ty_tms = (n - 1) - ty
    qk = cells.np_quadkey(tx, ty_tms, zoom)[0]
    assert len(qk) == zoom and set(qk) <= set("0123")
    if zoom > 1:
        # parent at zoom-1
        ptx, pty = cells.np_lonlat_to_tile(
            np.array([lon]), np.array([lat]), zoom - 1
        )
        # parent of the child tile by index must match the direct
        # parent computation (consistent pyramid)...
        assert ptx[0] == tx[0] // 2 and pty[0] == ty[0] // 2
        pqk = cells.np_quadkey(
            ptx, np.array([(2 ** (zoom - 1) - 1) - pty[0]]), zoom - 1
        )[0]
        assert qk.startswith(pqk)
    # meters forward is monotone in lon and bounded by the world
    mx, my = cells.np_lonlat_to_meters(np.array([lon]), np.array([lat]))
    assert abs(mx[0]) <= cells.ORIGIN_SHIFT + 1e-6
    assert abs(my[0]) <= cells.ORIGIN_SHIFT * 1.1


@settings(max_examples=300, deadline=None)
@given(st.floats(-180, 180), st.floats(-90, 90), st.integers(0, 20))
def test_geo_cell_consistency(lon, lat, level):
    """The packed geodetic cell id decodes back to the scalar helper's
    (cx, cy) for every input — the PIP index depends on this."""
    from gdal_spark import cells

    cid = int(cells.np_geo_cell(np.array([lon]), np.array([lat]), level)[0])
    cx, cy = cells.geo_cell_xy(lon, lat, level)
    lvl = cid >> 52
    rx = (cid - (lvl << 52)) >> 26
    ry = cid & ((1 << 26) - 1)
    assert (lvl, rx, ry) == (level, cx, cy)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_warp_identity_and_checksum_stability(seed):
    """Identity warp (same grid, nearest) reproduces the source
    exactly, and the GDAL checksum is a pure function of the pixels."""
    import localref
    from gdal_spark import geomlite as G

    rng = np.random.RandomState(seed % (2**31))
    src = rng.randint(0, 255, size=(32, 32)).astype(np.float64)
    out = localref._warp_global(src, 0.0, 32.0, 1.0, 0.0, 32.0, 1.0,
                                32, 32, "nearest")
    assert np.array_equal(out, src)
    assert G.gdal_checksum(src) == G.gdal_checksum(src.copy())
    assert 0 <= G.gdal_checksum(src) <= 0xFFFF
