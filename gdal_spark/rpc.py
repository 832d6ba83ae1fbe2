"""RPC (rational polynomial camera) transformer — alg/gdal_rpc.cpp
GDALCreateRPCTransformer restated.

Geo -> image (RPCTransformPoint): normalize (long, lat, height) by the
OFF/SCALE constants, evaluate four 20-term cubic polynomials in the
RPC00B term order (RPCComputeTerms, gdal_rpc.cpp:202-229), and take
the two ratios:
    line  = LINE_OFF + LINE_SCALE * (lineNum(P) / lineDen(P))
    pixel = SAMP_OFF + SAMP_SCALE * (sampNum(P) / sampDen(P))

Image -> geo (RPCInverseTransformPoint, :1204): no closed form exists;
GDAL seeds with a linearized pixel/line -> lat/long geotransform built
around the reference point and iterates
    result -= J_inv @ (back_transform(result) - target)
until the pixel error drops below the threshold (default 0.1 px,
max 10 iterations without DEM).

Spark shape: the 40 coefficients are a tiny broadcast-free closure;
forward evaluates as pure Column expressions (JVM codegen — the
dual-backend pattern of crs.py / tps.py also emits the mirrored SQL
text). The iterative inverse is vectorized numpy inside an
Arrow-batched pandas UDF: every iteration advances ALL rows of the
batch at once, so the Python overhead is per-iteration (<= 10), not
per-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# RPC00B 20-term order (gdal_rpc.cpp RPCComputeTerms): exponents of
# (L=long, P=lat, H=height)
_TERMS = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1), (3, 0, 0), (1, 2, 0), (1, 0, 2), (2, 1, 0), (0, 3, 0),
    (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
]


class RPCTransformer:
    """Coefficient bundle: line_num/line_den/samp_num/samp_den are
    20-vectors; offsets/scales per RPC00B."""

    def __init__(self, line_num, line_den, samp_num, samp_den,
                 long_off=0.0, long_scale=1.0, lat_off=0.0, lat_scale=1.0,
                 height_off=0.0, height_scale=1.0,
                 line_off=0.0, line_scale=1.0, samp_off=0.0, samp_scale=1.0):
        self.line_num = np.asarray(line_num, np.float64)
        self.line_den = np.asarray(line_den, np.float64)
        self.samp_num = np.asarray(samp_num, np.float64)
        self.samp_den = np.asarray(samp_den, np.float64)
        self.long_off, self.long_scale = long_off, long_scale
        self.lat_off, self.lat_scale = lat_off, lat_scale
        self.height_off, self.height_scale = height_off, height_scale
        self.line_off, self.line_scale = line_off, line_scale
        self.samp_off, self.samp_scale = samp_off, samp_scale

    # -- numpy ------------------------------------------------------------
    def _terms_np(self, lon, lat, h):
        L = (lon - self.long_off) / self.long_scale
        P = (lat - self.lat_off) / self.lat_scale
        H = (h - self.height_off) / self.height_scale
        return np.stack([L ** i * P ** j * H ** k
                         for i, j, k in _TERMS], axis=-1)

    def forward_np(self, lon, lat, h=0.0):
        """(long, lat, height) -> (pixel, line)."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        h = np.broadcast_to(np.asarray(h, np.float64), lon.shape)
        t = self._terms_np(lon, lat, h)
        line = self.line_off + self.line_scale * (
            t @ self.line_num) / (t @ self.line_den)
        pixel = self.samp_off + self.samp_scale * (
            t @ self.samp_num) / (t @ self.samp_den)
        return pixel, line

    def _pl_to_latlong(self):
        """Linearized pixel/line -> long/lat geotransform around the
        reference point (gdal_rpc.cpp:1090-1110)."""
        eps = 1e-5 * self.long_scale
        lon0, lat0 = self.long_off, self.lat_off
        p0, l0 = self.forward_np(lon0, lat0, self.height_off)
        p1, l1 = self.forward_np(lon0 + eps, lat0, self.height_off)
        p2, l2 = self.forward_np(lon0, lat0 + eps, self.height_off)
        # J maps (dlon, dlat) -> (dpixel, dline); invert
        J = np.array([[(p1 - p0) / eps, (p2 - p0) / eps],
                      [(l1 - l0) / eps, (l2 - l0) / eps]], dtype=np.float64)
        Jinv = np.linalg.inv(J)
        return Jinv  # [[dlon/dpix, dlon/dline], [dlat/dpix, dlat/dline]]

    def inverse_np(self, pixel, line, h=0.0, threshold=0.1, max_iter=10):
        """(pixel, line, height) -> (long, lat), iterative
        (RPCInverseTransformPoint :1204): seed from the linearization,
        then result -= J_inv @ pixel_delta until max|delta| < threshold
        px. Vectorized over all rows at once."""
        pixel = np.asarray(pixel, np.float64)
        line = np.asarray(line, np.float64)
        Jinv = self._pl_to_latlong()
        dlon = (pixel - self.samp_off) * Jinv[0, 0] \
            + (line - self.line_off) * Jinv[0, 1]
        dlat = (pixel - self.samp_off) * Jinv[1, 0] \
            + (line - self.line_off) * Jinv[1, 1]
        lon = self.long_off + dlon
        lat = self.lat_off + dlat
        for _ in range(max_iter):
            bp, bl = self.forward_np(lon, lat, h)
            dx = bp - pixel
            dy = bl - line
            if float(np.max(np.maximum(np.abs(dx), np.abs(dy)))) < threshold:
                break
            lon = lon - (dx * Jinv[0, 0] + dy * Jinv[0, 1])
            lat = lat - (dx * Jinv[1, 0] + dy * Jinv[1, 1])
        return lon, lat

    # -- dual backend (forward only) --------------------------------------
    def forward_cols(self, lon: Column, lat: Column, h: Column | None = None
                     ) -> tuple[Column, Column]:
        L = (lon - F.lit(self.long_off)) / F.lit(self.long_scale)
        P = (lat - F.lit(self.lat_off)) / F.lit(self.lat_scale)
        H = ((h if h is not None else F.lit(0.0)) - F.lit(self.height_off)) \
            / F.lit(self.height_scale)

        def poly(c):
            e = F.lit(float(c[0]))
            for cv, (i, j, k) in zip(c[1:], _TERMS[1:]):
                t = F.lit(float(cv))
                for _ in range(i):
                    t = t * L
                for _ in range(j):
                    t = t * P
                for _ in range(k):
                    t = t * H
                e = e + t
            return e

        line = F.lit(self.line_off) + F.lit(self.line_scale) * (
            poly(self.line_num) / poly(self.line_den))
        pixel = F.lit(self.samp_off) + F.lit(self.samp_scale) * (
            poly(self.samp_num) / poly(self.samp_den))
        return pixel, line

    def sql_exprs(self, lon: str, lat: str, h: str = "0.0"
                  ) -> tuple[str, str]:
        L = f"(({lon} - {self.long_off!r}) / {self.long_scale!r})"
        P = f"(({lat} - {self.lat_off!r}) / {self.lat_scale!r})"
        H = f"(({h} - {self.height_off!r}) / {self.height_scale!r})"

        def poly(c):
            e = repr(float(c[0]))
            for cv, (i, j, k) in zip(c[1:], _TERMS[1:]):
                t = repr(float(cv))
                for _ in range(i):
                    t = f"({t} * {L})"
                for _ in range(j):
                    t = f"({t} * {P})"
                for _ in range(k):
                    t = f"({t} * {H})"
                e = f"({e} + {t})"
            return e

        line = (f"({self.line_off!r} + ({self.line_scale!r} * "
                f"({poly(self.line_num)} / {poly(self.line_den)})))")
        pixel = (f"({self.samp_off!r} + ({self.samp_scale!r} * "
                 f"({poly(self.samp_num)} / {poly(self.samp_den)})))")
        return pixel, line

    # -- inverse as a pandas UDF ------------------------------------------
    def inverse_udf(self):
        t = self

        @F.pandas_udf(T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]))
        def u(pixel: pd.Series, line: pd.Series) -> pd.DataFrame:
            lon, lat = t.inverse_np(pixel.to_numpy(np.float64),
                                    line.to_numpy(np.float64))
            return pd.DataFrame({"lon": lon, "lat": lat})

        return u
