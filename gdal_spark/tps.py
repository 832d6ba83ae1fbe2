"""Thin-plate-spline GCP transformer (alg/gdal_tps.cpp,
alg/thinplatespline.cpp VizGeorefSpline2D): exact interpolation through
the control points with the r^2*log(r^2) radial basis.

Spark shape (same small-model pattern as gcp.py): the SOLVE is a tiny
driver-side dense system — (N+3) x (N+3) for N control points, what
VizGeorefSpline2D::solve (thinplatespline.cpp:433) builds — and the
APPLY is emitted twice from one formula (the crs.py dual-backend
pattern): as pyspark Columns (JVM codegen, no UDF) and as mirrored-
association SQL text for the DuckDB oracle. N is small by nature (GCPs
are hand-picked), so the N+3 basis terms stay comfortably inside
codegen; for N in the hundreds switch the apply to a pandas UDF over
the same coefficient vectors.

Basis and system restated from the reference:
  U(p, q)   = d2 * log(d2), d2 = |p - q|^2   (:190, 0 at d2 = 0)
  A         = [[0_3x3, P^T], [P, K]] with P = [1, x_c, y_c] rows over
              MEAN-CENTERED control points, K_rc = U(r, c)   (:569-590)
  solve A [a; w] = [0_3; v] per target variable               (:604-613)
  f(p)      = a0 + a1*(px - x_mean) + a2*(py - y_mean)
              + sum_r w_r * U(p, r)                           (:677-699)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


class TPSTransformer:
    def __init__(self, xc: np.ndarray, yc: np.ndarray,
                 coef_x: np.ndarray, coef_y: np.ndarray,
                 x_mean: float, y_mean: float):
        self.xc = xc  # mean-centered control x
        self.yc = yc
        self.coef_x = coef_x  # [a0, a1, a2, w_0..w_{N-1}]
        self.coef_y = coef_y
        self.x_mean = x_mean
        self.y_mean = y_mean

    # -- numpy ------------------------------------------------------------
    def forward_np(self, px, py):
        px = np.asarray(px, np.float64) - self.x_mean
        py = np.asarray(py, np.float64) - self.y_mean
        d2 = (px[..., None] - self.xc) ** 2 + (py[..., None] - self.yc) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.where(d2 > 0.0, d2 * np.log(d2), 0.0)
        outs = []
        for c in (self.coef_x, self.coef_y):
            outs.append(c[0] + c[1] * px + c[2] * py + u @ c[3:])
        return outs[0], outs[1]

    # -- dual backend -----------------------------------------------------
    def forward_cols(self, px: Column, py: Column) -> tuple[Column, Column]:
        dx = px - F.lit(self.x_mean)
        dy = py - F.lit(self.y_mean)

        def f(c):
            e = F.lit(float(c[0])) + F.lit(float(c[1])) * dx
            e = e + F.lit(float(c[2])) * dy
            for w, cx, cy in zip(c[3:], self.xc, self.yc):
                d2 = (dx - F.lit(float(cx))) * (dx - F.lit(float(cx))) \
                    + (dy - F.lit(float(cy))) * (dy - F.lit(float(cy)))
                u = F.when(d2 > 0.0, d2 * F.log(d2)).otherwise(F.lit(0.0))
                e = e + F.lit(float(w)) * u
            return e

        return f(self.coef_x), f(self.coef_y)

    def sql_exprs(self, px: str, py: str) -> tuple[str, str]:
        dx = f"({px} - {self.x_mean!r})"
        dy = f"({py} - {self.y_mean!r})"

        def f(c):
            e = f"({float(c[0])!r} + ({float(c[1])!r} * {dx}))"
            e = f"({e} + ({float(c[2])!r} * {dy}))"
            for w, cx, cy in zip(c[3:], self.xc, self.yc):
                d2 = (f"((({dx} - {float(cx)!r}) * ({dx} - {float(cx)!r}))"
                      f" + (({dy} - {float(cy)!r}) * ({dy} - {float(cy)!r})))")
                u = f"(CASE WHEN {d2} > 0.0 THEN {d2} * LN({d2}) ELSE 0.0 END)"
                e = f"({e} + ({float(w)!r} * {u}))"
            return e

        return f(self.coef_x), f(self.coef_y)


def fit_tps(gcps) -> TPSTransformer:
    """gcps: iterable of (pixel, line, geo_x, geo_y); needs >= 3
    non-collinear points (the reference's degenerate 1-D/2-point
    fallbacks are out of scope — raise instead)."""
    g = np.asarray(list(gcps), dtype=np.float64)
    n = len(g)
    if n < 3:
        raise ValueError("TPS needs >= 3 control points")
    x_mean = float(g[:, 0].mean())
    y_mean = float(g[:, 1].mean())
    xc = g[:, 0] - x_mean
    yc = g[:, 1] - y_mean
    d2 = (xc[:, None] - xc[None, :]) ** 2 + (yc[:, None] - yc[None, :]) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        K = np.where(d2 > 0.0, d2 * np.log(d2), 0.0)
    A = np.zeros((n + 3, n + 3))
    A[0, 3:] = 1.0
    A[1, 3:] = xc
    A[2, 3:] = yc
    A[3:, 0] = 1.0
    A[3:, 1] = xc
    A[3:, 2] = yc
    A[3:, 3:] = K
    rhs = np.zeros((n + 3, 2))
    rhs[3:, 0] = g[:, 2]
    rhs[3:, 1] = g[:, 3]
    coef = np.linalg.solve(A, rhs)
    return TPSTransformer(xc, yc, coef[:, 0], coef[:, 1], x_mean, y_mean)
