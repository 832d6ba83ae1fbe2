"""Geolocation-array transformer (geoloc.py)."""

import numpy as np

from gdal_spark.geoloc import GeolocTransformer


def _make_arrays(H=40, W=50, step=4):
    gy, gx = np.mgrid[0:H, 0:W]
    px = gx * step
    py = gy * step
    # smooth non-affine mapping: rotation + scale + sinusoidal wobble
    lon = -120.0 + 0.01 * px + 0.002 * py + 0.05 * np.sin(px / 40.0)
    lat = 35.0 - 0.008 * py + 0.001 * px + 0.04 * np.cos(py / 50.0)
    return lon, lat, step


def test_forward_matches_grid_nodes():
    lon, lat, step = _make_arrays()
    t = GeolocTransformer(lon, lat, pixel_step=step, line_step=step)
    # at exact grid nodes, the bilinear sample is the array value
    glon, glat = t.forward_np(np.array([0, 4 * step, 12 * step]),
                              np.array([0, 8 * step, 20 * step]))
    assert glon[0] == lon[0, 0] and glat[0] == lat[0, 0]
    assert glon[1] == lon[8, 4] and glat[1] == lat[8, 4]
    assert glon[2] == lon[20, 12] and glat[2] == lat[20, 12]


def test_inverse_roundtrip():
    lon, lat, step = _make_arrays()
    t = GeolocTransformer(lon, lat, pixel_step=step, line_step=step)
    rng = np.random.RandomState(5)
    px = rng.uniform(5, 45 * step - 5, 300)
    py = rng.uniform(5, 35 * step - 5, 300)
    glon, glat = t.forward_np(px, py)
    px2, py2 = t.inverse_np(glon, glat)
    # back within the pixel tolerance
    assert np.max(np.abs(px2 - px)) < 0.05
    assert np.max(np.abs(py2 - py)) < 0.05
