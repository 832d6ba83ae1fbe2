"""CEM (collinearity equation model) transformer — the fork's own
photogrammetric frame-camera transformer, alg/gdal_cem.cpp
(GDALCreateCEMTransformer / CEMTransformPoint / GDALCEMTransform)
restated.

Ground -> image (CEMTransformPoint, gdal_cem.cpp:160-194): build the
omega/phi/kappa rotation matrix (only the constant term of each
3-coefficient angle array is used — adfOmega[0] etc., exactly as the
reference does), then

    dTemp = a31*X + a32*Y - a33*f
    pixel = -f * (a11*(X-XS) + a21*(Y-YS) + a31*(Z-ZS)) / dTemp
    line  = -f * (a12*(X-XS) + a22*(Y-YS) + a32*(Z-ZS)) / dTemp

Note the reference's denominator uses the RAW map coordinates
(a31*X + a32*Y - a33*f), NOT the camera-frame offsets the textbook
collinearity equations would use — we reproduce that verbatim because
output parity with gdal_cem.cpp is the contract. The distortion
parameters (K1..K3, P1, P2, ALPHA, BETA), principal point and pixel
sizes are carried as metadata exactly like the reference does: it
stores them in GDALCEMInfo but CEMTransformPoint never applies them.

Image -> ground (CEMInverseTransformPoint, :458-525): no closed form;
the reference seeds with a finite-difference affine built around
(XS, YS, h=0) with delta 1e-4 (GDALCreateCEMTransformer :395-430,
inverted with GDALInvGeoTransform) and runs <= 10 fixed-point
iterations   result -= (J_seed^-1) @ (forward(result) - target)
until both pixel deltas drop below the threshold.

Height handling (GDALCEMTransform :745-760): the Z fed to the
equations is  z + height_offset * height_scale  — the reference
multiplies the OFFSET by the scale (RPC applies scale to the
above-ground height instead); reproduced verbatim.

Spark shape: identical to rpc.py — the forward transform is pure
Column math (JVM whole-stage codegen; the dual backend also emits the
mirrored SQL text for the DuckDB oracle), the iterative inverse is
vectorized numpy inside an Arrow-batched pandas UDF (per-iteration,
not per-row, Python cost).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata keys GDALExtractCEMInfo (gdal_cem.cpp:95-152) requires;
#: the reference's misspelling "PXIEL" is part of the format.
REQUIRED_MD_KEYS = (
    "CEM_FOCAL_LENGTH", "CEM_PRINCIPAL_X0", "CEM_PRINCIPAL_Y0",
    "CEM_PXIEL_XSIZE", "CEM_PXIEL_YSIZE",
    "CEM_DISTORTION_K1", "CEM_DISTORTION_K2", "CEM_DISTORTION_K3",
    "CEM_DISTORTION_P1", "CEM_DISTORTION_P2",
    "CEM_DISTORTION_ALPHA", "CEM_DISTORTION_BETA",
    "CEM_EXTERIOR_XS", "CEM_EXTERIOR_YS", "CEM_EXTERIOR_ZS",
    "CEM_EXTERIOR_OMEGA", "CEM_EXTERIOR_PHI", "CEM_EXTERIOR_KAPPA",
    "CEM_ANGLE_TYPE", "CEM_ANGLE_ORDER",
)


class CEMTransformer:
    """Parameter bundle mirroring GDALCEMInfo (gdal_alg_ext.h:26-48).

    omega/phi/kappa accept the reference's 3-coefficient arrays; only
    coefficient [0] enters the rotation (gdal_cem.cpp:165-172)."""

    def __init__(self, focal_length, xs, ys, zs, omega=0.0, phi=0.0,
                 kappa=0.0, x0=0.0, y0=0.0, xps=1.0, yps=1.0,
                 k1=0.0, k2=0.0, k3=0.0, p1=0.0, p2=0.0,
                 alpha=0.0, beta=0.0, angle_type=0, angle_order=0,
                 height_offset=0.0, height_scale=1.0):
        def _c0(v):
            return float(np.asarray(v, np.float64).reshape(-1)[0])

        self.f = float(focal_length)
        self.xs, self.ys, self.zs = float(xs), float(ys), float(zs)
        self.omega, self.phi, self.kappa = _c0(omega), _c0(phi), _c0(kappa)
        self.x0, self.y0 = float(x0), float(y0)
        self.xps, self.yps = float(xps), float(yps)
        self.k1, self.k2, self.k3 = float(k1), float(k2), float(k3)
        self.p1, self.p2 = float(p1), float(p2)
        self.alpha, self.beta = float(alpha), float(beta)
        self.angle_type, self.angle_order = int(angle_type), int(angle_order)
        self.height_offset = float(height_offset)
        self.height_scale = float(height_scale)

    # -- rotation (gdal_cem.cpp:174-184) -----------------------------------
    def _rotation(self):
        o, p, k = self.omega, self.phi, self.kappa
        so, co = math.sin(o), math.cos(o)
        sp, cp = math.sin(p), math.cos(p)
        sk, ck = math.sin(k), math.cos(k)
        a11 = cp * ck - sp * so * sk
        a12 = -(cp * sk) - (sp * so * ck)
        a13 = -(sp * co)
        a21 = co * sk
        a22 = co * ck
        a23 = -so
        a31 = sp * ck + cp * so * sk
        a32 = -(sp * sk) + cp * so * ck
        a33 = cp * co
        return (a11, a12, a13, a21, a22, a23, a31, a32, a33)

    def _z_used(self, h):
        # gdal_cem.cpp:745: padfZ + dfHeightOffset * dfHeightScale
        return h + self.height_offset * self.height_scale

    # -- numpy --------------------------------------------------------------
    def forward_np(self, x, y, h=0.0):
        """(mapx, mapy, height) -> (pixel, line), CEMTransformPoint."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        z = self._z_used(np.broadcast_to(np.asarray(h, np.float64), x.shape))
        a11, a12, _, a21, a22, _, a31, a32, a33 = self._rotation()
        dtemp = a31 * x + a32 * y - a33 * self.f
        pixel = (-self.f) * ((a11 * (x - self.xs) + a21 * (y - self.ys)
                              + a31 * (z - self.zs)) / dtemp)
        line = (-self.f) * ((a12 * (x - self.xs) + a22 * (y - self.ys)
                             + a32 * (z - self.zs)) / dtemp)
        return pixel, line

    def _seed_geotransform(self):
        """Finite-difference affine around (XS, YS, 0) inverted like
        GDALInvGeoTransform (GDALCreateCEMTransformer :395-430)."""
        lon0, lat0, d = self.xs, self.ys, 1e-4
        p0, l0 = (float(v) for v in self.forward_np(lon0, lat0, 0.0))
        p1, l1 = (float(v) for v in self.forward_np(lon0 + d, lat0, 0.0))
        p2, l2 = (float(v) for v in self.forward_np(lon0, lat0 + d, 0.0))
        gt = [0.0] * 6
        gt[1] = (p1 - p0) / d
        gt[4] = (l1 - l0) / d
        gt[2] = (p2 - p0) / d
        gt[5] = (l2 - l0) / d
        gt[0] = p0 - gt[1] * lon0 - gt[2] * lat0
        gt[3] = l0 - gt[4] * lon0 - gt[5] * lat0
        det = gt[1] * gt[5] - gt[2] * gt[4]
        if abs(det) < 1e-15:
            raise ValueError("CEM: cannot invert seed geotransform")
        inv_det = 1.0 / det
        igt = [0.0] * 6
        igt[1] = gt[5] * inv_det
        igt[4] = -gt[4] * inv_det
        igt[2] = -gt[2] * inv_det
        igt[5] = gt[1] * inv_det
        igt[0] = (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det
        igt[3] = (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det
        return igt

    def inverse_np(self, pixel, line, h=0.0, threshold=0.1, max_iter=10):
        """(pixel, line, height) -> (mapx, mapy), iterative
        (CEMInverseTransformPoint :458-525), all rows per iteration."""
        pixel = np.asarray(pixel, np.float64)
        line = np.asarray(line, np.float64)
        igt = self._seed_geotransform()
        x = igt[0] + igt[1] * pixel + igt[2] * line
        y = igt[3] + igt[4] * pixel + igt[5] * line
        for _ in range(max_iter):
            bp, bl = self.forward_np(x, y, h)
            dx = bp - pixel
            dy = bl - line
            x = x - (dx * igt[1] + dy * igt[2])
            y = y - (dx * igt[4] + dy * igt[5])
            if float(np.max(np.maximum(np.abs(dx), np.abs(dy)))) < threshold:
                break
        return x, y

    # -- dual backend (forward) ---------------------------------------------
    def forward_cols(self, x: Column, y: Column, h: Column | None = None
                     ) -> tuple[Column, Column]:
        a11, a12, _, a21, a22, _, a31, a32, a33 = self._rotation()
        z = (h if h is not None else F.lit(0.0)) \
            + F.lit(self.height_offset * self.height_scale)
        dtemp = (F.lit(a31) * x + F.lit(a32) * y) - F.lit(a33 * self.f)
        pixel = F.lit(-self.f) * (
            ((F.lit(a11) * (x - F.lit(self.xs)))
             + (F.lit(a21) * (y - F.lit(self.ys)))
             + (F.lit(a31) * (z - F.lit(self.zs)))) / dtemp)
        line = F.lit(-self.f) * (
            ((F.lit(a12) * (x - F.lit(self.xs)))
             + (F.lit(a22) * (y - F.lit(self.ys)))
             + (F.lit(a32) * (z - F.lit(self.zs)))) / dtemp)
        return pixel, line

    def sql_exprs(self, x: str, y: str, h: str = "0.0"
                  ) -> tuple[str, str]:
        """The SAME forward expressions as SQL text with identical
        association order (the oracle side of the dual backend)."""
        a11, a12, _, a21, a22, _, a31, a32, a33 = self._rotation()
        z = f"({h} + {self.height_offset * self.height_scale!r})"
        dtemp = (f"((({a31!r} * {x}) + ({a32!r} * {y}))"
                 f" - {a33 * self.f!r})")
        pixel = (f"({-self.f!r} * (((({a11!r} * ({x} - {self.xs!r})))"
                 f" + (({a21!r} * ({y} - {self.ys!r})))"
                 f" + (({a31!r} * ({z} - {self.zs!r})))) / {dtemp}))")
        line = (f"({-self.f!r} * (((({a12!r} * ({x} - {self.xs!r})))"
                f" + (({a22!r} * ({y} - {self.ys!r})))"
                f" + (({a32!r} * ({z} - {self.zs!r})))) / {dtemp}))")
        return pixel, line

    # -- inverse as a pandas UDF ---------------------------------------------
    def inverse_udf(self, threshold: float = 0.1):
        t = self

        @F.pandas_udf(T.StructType([
            T.StructField("mapx", T.DoubleType()),
            T.StructField("mapy", T.DoubleType()),
        ]))
        def u(pixel: pd.Series, line: pd.Series) -> pd.DataFrame:
            x, y = t.inverse_np(pixel.to_numpy(np.float64),
                                line.to_numpy(np.float64),
                                threshold=threshold)
            return pd.DataFrame({"mapx": x, "mapy": y})

        return u


def extract_cem_info(md: dict) -> CEMTransformer:
    """GDALExtractCEMInfo (gdal_cem.cpp:95-152): build a transformer
    from a CEM_* metadata dict; every key the reference requires must
    be present (it errors on any missing one). The three EXTERIOR
    angles are space/comma-separated 3-vectors; ANGLE_TYPE/ORDER are
    carried as ints."""
    missing = [k for k in REQUIRED_MD_KEYS if k not in md]
    if missing:
        raise ValueError(
            f"Some required CEM metadata missing: {sorted(missing)}")

    def one(k):
        return float(md[k])

    def three(k):
        toks = [t for t in str(md[k]).replace(",", " ").split() if t]
        if len(toks) == 1:
            return [float(toks[0]), 0.0, 0.0]
        if len(toks) != 3:
            raise ValueError(f"{k}: expected 1 or 3 values, got {len(toks)}")
        return [float(t) for t in toks]

    return CEMTransformer(
        focal_length=one("CEM_FOCAL_LENGTH"),
        x0=one("CEM_PRINCIPAL_X0"), y0=one("CEM_PRINCIPAL_Y0"),
        xps=one("CEM_PXIEL_XSIZE"), yps=one("CEM_PXIEL_YSIZE"),
        k1=one("CEM_DISTORTION_K1"), k2=one("CEM_DISTORTION_K2"),
        k3=one("CEM_DISTORTION_K3"), p1=one("CEM_DISTORTION_P1"),
        p2=one("CEM_DISTORTION_P2"), alpha=one("CEM_DISTORTION_ALPHA"),
        beta=one("CEM_DISTORTION_BETA"),
        xs=one("CEM_EXTERIOR_XS"), ys=one("CEM_EXTERIOR_YS"),
        zs=one("CEM_EXTERIOR_ZS"),
        omega=three("CEM_EXTERIOR_OMEGA"), phi=three("CEM_EXTERIOR_PHI"),
        kappa=three("CEM_EXTERIOR_KAPPA"),
        angle_type=int(md["CEM_ANGLE_TYPE"]),
        angle_order=int(md["CEM_ANGLE_ORDER"]),
    )


def cem_info_to_md(t: CEMTransformer) -> dict:
    """CEMInfoToMD inverse of extract_cem_info (round-trip tested)."""
    return {
        "CEM_FOCAL_LENGTH": repr(t.f),
        "CEM_PRINCIPAL_X0": repr(t.x0), "CEM_PRINCIPAL_Y0": repr(t.y0),
        "CEM_PXIEL_XSIZE": repr(t.xps), "CEM_PXIEL_YSIZE": repr(t.yps),
        "CEM_DISTORTION_K1": repr(t.k1), "CEM_DISTORTION_K2": repr(t.k2),
        "CEM_DISTORTION_K3": repr(t.k3), "CEM_DISTORTION_P1": repr(t.p1),
        "CEM_DISTORTION_P2": repr(t.p2),
        "CEM_DISTORTION_ALPHA": repr(t.alpha),
        "CEM_DISTORTION_BETA": repr(t.beta),
        "CEM_EXTERIOR_XS": repr(t.xs), "CEM_EXTERIOR_YS": repr(t.ys),
        "CEM_EXTERIOR_ZS": repr(t.zs),
        "CEM_EXTERIOR_OMEGA": f"{t.omega!r} 0.0 0.0",
        "CEM_EXTERIOR_PHI": f"{t.phi!r} 0.0 0.0",
        "CEM_EXTERIOR_KAPPA": f"{t.kappa!r} 0.0 0.0",
        "CEM_ANGLE_TYPE": str(t.angle_type),
        "CEM_ANGLE_ORDER": str(t.angle_order),
    }
