"""Approximate transformer (approx.py vs exact CRS transforms)."""

import numpy as np

from gdal_spark.approx import ApproxTransformer


def _mercator(xs, ys):
    R = 6378137.0
    return (np.radians(xs) * R,
            R * np.log(np.tan(np.pi / 4 + np.radians(ys) / 2)))


def test_approx_within_tolerance_and_cheaper():
    xs = np.linspace(-120.0, -60.0, 257)
    ys = np.full(257, 45.0)
    ex, ey = _mercator(xs, ys)
    at = ApproxTransformer(_mercator, max_error=0.25)
    ax, ay = at.transform(xs, ys)
    # endpoints + sampled middles are exact; everything is within a
    # small multiple of the per-interval error budget
    assert abs(ax[0] - ex[0]) == 0 and abs(ax[-1] - ex[-1]) == 0
    assert np.max(np.abs(ax - ex) + np.abs(ay - ey)) < 2.0
    # far fewer exact evaluations than points
    assert at.exact_calls < 80


def test_approx_exact_on_linear_transform():
    def affine(xs, ys):
        return 2.0 * xs + 3.0, -0.5 * ys + 1.0

    xs = np.linspace(0, 100, 513)
    ys = np.linspace(5, 9, 513)
    at = ApproxTransformer(affine, max_error=1e-9)
    ax, ay = at.transform(xs, ys)
    ex, ey = affine(xs, ys)
    assert np.allclose(ax, ex, atol=1e-9)
    assert np.allclose(ay, ey, atol=1e-9)
    assert at.exact_calls <= 5  # one subdivision level only


def test_approx_subdivides_under_tight_tolerance():
    # a diagonal line over an ASYMMETRIC lat range: Y = mercator(lat)
    # is nonlinear along it, and the midpoint does not sit on the chord
    # (a symmetric range would fool the middle-sample error check —
    # exactly as it would fool the reference's, which also tests only
    # the middle point, gdaltransformer.cpp:3397)
    xs = np.linspace(-170.0, 170.0, 1025)
    ys = np.linspace(5.0, 75.0, 1025)
    loose = ApproxTransformer(_mercator, max_error=1000.0)
    loose.transform(xs, ys)
    tight = ApproxTransformer(_mercator, max_error=0.001)
    ax, ay = tight.transform(xs, ys)
    ex, ey = _mercator(xs, ys)
    assert tight.exact_calls > loose.exact_calls
    assert np.max(np.abs(ax - ex)) < 0.5
