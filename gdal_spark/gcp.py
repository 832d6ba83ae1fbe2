"""GCP polynomial transformers (alg/gdal_crs.cpp
GDALCreateGCPTransformer): least-squares polynomial fit of
(pixel, line) -> (geo X, geo Y) from ground control points, order
1..3, applied as pure Column expressions.

The FIT is a tiny driver-side lstsq (GCP lists are small by nature —
GDAL's transformer holds them in memory too); the APPLY is JVM column
math over any number of rows. TPS/RPC transformers (thin-plate
splines, rational polynomial camera models) are out of scope.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

_TERMS = {
    1: [(0, 0), (1, 0), (0, 1)],
    2: [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2)],
    3: [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2),
        (3, 0), (2, 1), (1, 2), (0, 3)],
}


class GCPTransformer:
    """coef_x/coef_y over the monomial basis px^i * py^j."""

    def __init__(self, coef_x: np.ndarray, coef_y: np.ndarray, order: int,
                 residual: float):
        self.coef_x = coef_x
        self.coef_y = coef_y
        self.order = order
        self.residual = residual

    def forward_np(self, px, py):
        A = _design(np.asarray(px, np.float64), np.asarray(py, np.float64),
                    self.order)
        return A @ self.coef_x, A @ self.coef_y

    def forward_cols(self, px: Column, py: Column) -> tuple[Column, Column]:
        def poly(coefs):
            e = F.lit(float(coefs[0]))
            for c, (i, j) in zip(coefs[1:], _TERMS[self.order][1:]):
                t = F.lit(float(c))
                for _ in range(i):
                    t = t * px
                for _ in range(j):
                    t = t * py
                e = e + t
            return e

        return poly(self.coef_x), poly(self.coef_y)

    def sql_exprs(self, px: str, py: str) -> tuple[str, str]:
        """The same polynomial as SQL text (mirrored association)."""

        def poly(coefs):
            s = repr(float(coefs[0]))
            for c, (i, j) in zip(coefs[1:], _TERMS[self.order][1:]):
                t = repr(float(c))
                for _ in range(i):
                    t = f"({t} * {px})"
                for _ in range(j):
                    t = f"({t} * {py})"
                s = f"({s} + {t})"
            return s

        return poly(self.coef_x), poly(self.coef_y)


def _design(px: np.ndarray, py: np.ndarray, order: int) -> np.ndarray:
    return np.stack([px ** i * py ** j for i, j in _TERMS[order]], axis=1)


def fit_gcps(gcps, order: int = 1) -> GCPTransformer:
    """gcps: iterable of (pixel, line, geo_x, geo_y). Least-squares
    polynomial fit (GDAL CRS_compute_georef_equations)."""
    if order not in _TERMS:
        raise ValueError("order must be 1, 2 or 3")
    g = np.asarray(list(gcps), dtype=np.float64)
    need = len(_TERMS[order])
    if len(g) < need:
        raise ValueError(f"order {order} needs >= {need} GCPs, got {len(g)}")
    A = _design(g[:, 0], g[:, 1], order)
    cx, res_x, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    cy, res_y, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
    pred = _design(g[:, 0], g[:, 1], order)
    rms = float(np.sqrt(np.mean((pred @ cx - g[:, 2]) ** 2
                                + (pred @ cy - g[:, 3]) ** 2)))
    return GCPTransformer(cx, cy, order, rms)


def gcps_to_geotransform_df(gcps_df, px_col: str = "px", py_col: str = "py",
                            gx_col: str = "gx", gy_col: str = "gy"):
    """gdal.GCPsToGeoTransform over a DataFrame of GCPs
    (gcore/gdal_misc.cpp GDALGCPsToGeoTransform; consumed by
    osgeo_utils/samples/gcps2wld.py, whose world-file output order —
    gt1, gt4, gt2, gt5, then the half-pixel-shifted origin — this
    returns).

    Distributed shape: the affine least squares runs as ONE partial+
    final aggregate of the normal-equation moments (n, Σpx, Σpy, Σpx²,
    Σpxpy, Σpy², and the 6 cross moments with gx/gy) — 13 doubles of
    driver state however many GCPs there are (the reference caps at a
    few thousand; a dense tie-point grid from e.g. image matching can
    be millions of rows here). The two 3x3 solves are numpy on the
    driver."""
    from pyspark.sql import functions as F

    px, py = F.col(px_col), F.col(py_col)
    gx, gy = F.col(gx_col), F.col(gy_col)
    m = gcps_df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(px).alias("sx"), F.sum(py).alias("sy"),
        F.sum(px * px).alias("sxx"), F.sum(px * py).alias("sxy"),
        F.sum(py * py).alias("syy"),
        F.sum(gx).alias("bx0"), F.sum(px * gx).alias("bx1"),
        F.sum(py * gx).alias("bx2"),
        F.sum(gy).alias("by0"), F.sum(px * gy).alias("by1"),
        F.sum(py * gy).alias("by2"),
    ).collect()[0]
    A = np.array([[m["n"], m["sx"], m["sy"]],
                  [m["sx"], m["sxx"], m["sxy"]],
                  [m["sy"], m["sxy"], m["syy"]]])
    cx = np.linalg.solve(A, np.array([m["bx0"], m["bx1"], m["bx2"]]))
    cy = np.linalg.solve(A, np.array([m["by0"], m["by1"], m["by2"]]))
    # geotransform convention: gx = gt0 + px*gt1 + py*gt2
    gt = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])
    return {
        "gt": gt,
        "world_file": (gt[1], gt[4], gt[2], gt[5],
                       gt[0] + 0.5 * gt[1] + 0.5 * gt[2],
                       gt[3] + 0.5 * gt[4] + 0.5 * gt[5]),
    }
