"""SimpleSURF detection/matching vs literal per-pixel transcriptions.

Reference: alg/gdal_octave.cpp (GetRectangleSum, ComputeLayer,
PointIsExtremum), alg/gdal_simplesurf.cpp (SetDescriptor,
MatchFeaturePoints), alg/gdalmatching.cpp.
"""

import numpy as np
import pytest

from gdal_spark import surf, synth


def _rect_sum_scalar(ii, H, W, row, col, w, h):
    """Literal scalar port of GetRectangleSum for cross-checking the
    vectorized version (loops + GetValue OOB -> 0)."""
    def val(r, c):
        if 0 <= r < H and 0 <= c < W:
            return ii[r + 1, c + 1]
        return 0.0

    lt_row = row - 1 if row <= H else -1
    lt_col = col - 1 if col <= W else -1
    rb_row = row + h - 1 if row + h - 1 < H else H - 1
    rb_col = col + w - 1 if col + w - 1 < W else W - 1
    res = val(lt_row, lt_col) + val(rb_row, rb_col) \
        - val(lt_row, rb_col) - val(rb_row, lt_col)
    return res if res > 0 else 0.0


@pytest.fixture(scope="module")
def small_img():
    return synth.surf_image_window_np(100, 100, 96, 96) / 255.0


def test_rect_sum_matches_scalar_port(small_img):
    ii = surf.integral_image(small_img)
    H, W = small_img.shape
    rng = [(0, 0, 5, 5), (-3, -3, 7, 7), (90, 90, 20, 20),
           (50, -2, 4, 9), (-1, 94, 9, 4), (95, 95, 2, 2), (10, 20, 1, 1)]
    for row, col, w, h in rng:
        got = float(surf._rect_sum(ii, H, W, np.array(row), np.array(col),
                                   w, h))
        want = _rect_sum_scalar(ii, H, W, row, col, w, h)
        assert got == pytest.approx(want, abs=1e-9), (row, col, w, h)
    # brute-force cross-check on raw pixels for an interior rect
    got = float(surf._rect_sum(ii, H, W, np.array(10), np.array(20), 8, 6))
    assert got == pytest.approx(small_img[10:16, 20:28].sum(), abs=1e-9)


def test_hessian_layer_matches_literal_loop(small_img):
    ii = surf.integral_image(small_img)
    H, W = small_img.shape
    octave, interval = 1, 2
    det, sgn, radius, filt = surf.hessian_layer(ii, H, W, octave, interval)
    lobe = filt // 3
    long_part = 2 * lobe - 1
    norm = filt * filt
    rs = lambda r, c, w, h: _rect_sum_scalar(ii, H, W, r, c, w, h)
    for r in (radius, radius + 5, H - radius):
        for c in (radius, 40, W - radius):
            dxx = rs(r - lobe + 1, c - radius, filt, long_part) \
                - 3 * rs(r - lobe + 1, c - (lobe - 1) // 2, lobe, long_part)
            dyy = rs(r - radius, c - lobe - 1, long_part, filt) \
                - 3 * rs(r - lobe + 1, c - lobe + 1, long_part, lobe)
            dxy = rs(r - lobe, c - lobe, lobe, lobe) \
                + rs(r + 1, c + 1, lobe, lobe) \
                - rs(r - lobe, c + 1, lobe, lobe) \
                - rs(r + 1, c - lobe, lobe, lobe)
            dxx /= norm
            dyy /= norm
            dxy /= norm
            want = dxx * dyy - 0.81 * dxy * dxy
            assert det[r, c] == pytest.approx(want, abs=1e-12)
            assert sgn[r, c] == (1 if dxx + dyy >= 0 else -1)


def test_descriptor_matches_literal_loop(small_img):
    ii = surf.integral_image(small_img)
    H, W = small_img.shape
    scale = 2
    x, y = 48, 50
    got = surf._descriptors(ii, H, W, [x], [y], scale)[0]
    # literal SetDescriptor port
    haar = 2 * scale
    desc_side = 20 * scale
    quad = desc_side // 4
    sub = quad // 5
    lt_r = y - desc_side // 2
    lt_c = x - desc_side // 2
    rs = lambda r, c, w, h: _rect_sum_scalar(ii, H, W, r, c, w, h)

    def haar_x(r, c, size):
        return rs(r, c + size // 2, size // 2, size) - rs(r, c, size // 2, size)

    def haar_y(r, c, size):
        return rs(r + size // 2, c, size, size // 2) - rs(r, c, size, size // 2)

    want = []
    for r in range(lt_r, lt_r + desc_side, quad):
        for c in range(lt_c, lt_c + desc_side, quad):
            dx = dy = adx = ady = 0.0
            for sr in range(r, r + quad, sub):
                for sc in range(c, c + quad, sub):
                    cr = sr + sub // 2 - haar // 2
                    cc = sc + sub // 2 - haar // 2
                    hx = haar_x(cr, cc, haar)
                    hy = haar_y(cr, cc, haar)
                    dx += hx
                    dy += hy
                    adx += abs(hx)
                    ady += abs(hy)
            want += [dx, dy, adx, ady]
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_distributed_detection_matches_global_kernel(spark):
    t1 = synth.surf_tiles_df(spark, 2, 2)
    got = sorted((r["x"], r["y"], r["scale"], r["radius"], r["sign"])
                 for r in surf.feature_points(t1, 2, 2).collect())
    img = synth.surf_image_window_np(0, 0, 512, 512) / 255.0
    fp = surf.extract_feature_points_np(img, 2, 2, 0.001)
    want = sorted(zip(fp.x, fp.y, fp.scale, fp.radius, fp.sign))
    assert got == want and len(got) > 0


def test_end_to_end_shift_recovery(spark):
    t1 = synth.surf_tiles_df(spark, 2, 2)
    t2 = synth.surf_tiles_df(spark, 2, 2, shift=(17, 9))
    g = surf.compute_matching_points(t1, t2, 2, 2, matching_threshold=1.0)
    rows = [(r["pixel"], r["line"], r["gcp_x"], r["gcp_y"])
            for r in g.collect()]
    assert len(rows) >= 10
    assert all(p - x == pytest.approx(17) and ln - y == pytest.approx(9)
               for p, ln, x, y in rows)


def test_georef_output(spark):
    t1 = synth.surf_tiles_df(spark, 1, 1)
    g = surf.compute_matching_points(
        t1, t1, 1, 1, matching_threshold=1.0,
        georef_gt=[1000.0, 2.0, 0.0, 500.0, 0.0, -2.0])
    for r in g.collect():
        assert r["gcp_x"] == pytest.approx(1000.0 + 2.0 * r["pixel"])
        assert r["gcp_y"] == pytest.approx(500.0 - 2.0 * r["line"])
