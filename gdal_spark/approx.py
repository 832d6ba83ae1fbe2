"""Approximate transformer (alg/gdaltransformer.cpp:3124
GDALApproxTransform): wrap an exact-but-expensive point transformer so
a scanline of points is evaluated exactly only at its start / middle /
end; when the linear interpolation of the middle point lands within
`max_error` (GDAL's metric: |dx_err| + |dy_err| summed per axis pair),
every interior point is interpolated; otherwise the scanline splits in
half and recurses (gdaltransformer.cpp:3346 GDALApproxTransformInternal).

This is the strategy gdalwarp enables with -et: on smooth transforms
(all the CRS closed forms here) it cuts exact evaluations per 256-px
scanline from 256 to a handful. It composes with any (xs, ys) ->
(X, Y) vectorized transformer — crs.conic/tm forwards, tps/rpc
forward_np — and stays pure numpy, so warp kernels can call it inside
their tile tasks.
"""

from __future__ import annotations

import numpy as np


class ApproxTransformer:
    def __init__(self, fn, max_error: float = 0.125):
        self.fn = fn
        self.max_error = float(max_error)
        self.exact_calls = 0  # points evaluated exactly (for tests)

    def _exact(self, xs, ys):
        self.exact_calls += len(xs)
        return self.fn(xs, ys)

    def transform(self, xs: np.ndarray, ys: np.ndarray):
        """Approximate the transform of one scanline (points ordered
        along the line; GDAL applies this per warp scanline)."""
        xs = np.asarray(xs, np.float64)
        ys = np.asarray(ys, np.float64)
        n = len(xs)
        ox = np.empty(n)
        oy = np.empty(n)
        if n <= 5:
            ox[:], oy[:] = self._exact(xs, ys)
            return ox, oy
        sx, sy = self._exact(
            np.array([xs[0], xs[(n - 1) // 2], xs[-1]]),
            np.array([ys[0], ys[(n - 1) // 2], ys[-1]]),
        )
        self._recurse(xs, ys, ox, oy, 0, n - 1,
                      (sx[0], sy[0]), (sx[2], sy[2]), (sx[1], sy[1]))
        return ox, oy

    def _recurse(self, xs, ys, ox, oy, i0, i1, t0, t1, tm):
        """[i0, i1] endpoints already transformed to t0/t1; tm is the
        exact transform of the middle index."""
        im = (i0 + i1) // 2
        span = xs[i1] - xs[i0]
        if span == 0.0:
            span = ys[i1] - ys[i0]
            param = ys
        else:
            param = xs
        fdx = (t1[0] - t0[0]) / span
        fdy = (t1[1] - t0[1]) / span
        err = abs(t0[0] + fdx * (param[im] - param[i0]) - tm[0]) \
            + abs(t0[1] + fdy * (param[im] - param[i0]) - tm[1])
        if err <= self.max_error or i1 - i0 <= 4:
            # interpolate the whole interval (endpoints + exact middle
            # kept, like the reference which writes the SME points)
            t = (param[i0 + 1 : i1] - param[i0])
            ox[i0] = t0[0]
            oy[i0] = t0[1]
            ox[i1] = t1[0]
            oy[i1] = t1[1]
            ox[i0 + 1 : i1] = t0[0] + fdx * t
            oy[i0 + 1 : i1] = t0[1] + fdy * t
            ox[im] = tm[0]
            oy[im] = tm[1]
            return
        # split: transform the two quarter points exactly and recurse
        iq1 = (i0 + im) // 2
        iq2 = (im + i1) // 2
        qx, qy = self._exact(
            np.array([xs[iq1], xs[iq2]]), np.array([ys[iq1], ys[iq2]])
        )
        self._recurse(xs, ys, ox, oy, i0, im, t0, tm, (qx[0], qy[0]))
        self._recurse(xs, ys, ox, oy, im, i1, tm, t1, (qx[1], qy[1]))
