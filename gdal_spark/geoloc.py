"""Geolocation-array transformer (alg/gdalgeoloc.cpp
GDALCreateGeoLocTransformer): the source raster's georeferencing is a
pair of LON/LAT arrays sampled on a (possibly subsampled) pixel grid —
GEOLOCATION metadata domain with PIXEL_OFFSET/LINE_OFFSET and
PIXEL_STEP/LINE_STEP.

Forward (source pixel -> geo): bilinear interpolation inside the
geolocation arrays at array coords ((pixel - PIXEL_OFFSET) /
PIXEL_STEP, (line - LINE_OFFSET) / LINE_STEP) — the reference's
GDALGeoLocTransform forward path.

Inverse (geo -> source pixel): the reference builds a quadtree /
backmap over the array (gdalgeoloc.cpp GDALGeoLoc::GenerateBackMap);
here the seed is a least-squares affine fit of the array followed by
Newton iterations with a finite-difference Jacobian per batch —
the same per-batch vectorized scheme as rpc.py's iterative inverse.

Spark shape: the arrays are a broadcast small model (GDAL holds them
fully in memory too); both directions are numpy-vectorized and run
inside Arrow batches.
"""

from __future__ import annotations

import numpy as np


class GeolocTransformer:
    def __init__(self, lon_arr: np.ndarray, lat_arr: np.ndarray,
                 pixel_offset: float = 0.0, line_offset: float = 0.0,
                 pixel_step: float = 1.0, line_step: float = 1.0):
        self.lon = np.asarray(lon_arr, np.float64)
        self.lat = np.asarray(lat_arr, np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2:
            raise ValueError("lon/lat arrays must share a 2-D shape")
        self.px_off = float(pixel_offset)
        self.ln_off = float(line_offset)
        self.px_step = float(pixel_step)
        self.ln_step = float(line_step)
        self._affine = None

    # -- forward ----------------------------------------------------------
    def _sample(self, arr, ax, ay):
        H, W = arr.shape
        x0 = np.clip(np.floor(ax).astype(np.int64), 0, W - 2)
        y0 = np.clip(np.floor(ay).astype(np.int64), 0, H - 2)
        fx = np.clip(ax - x0, 0.0, 1.0)
        fy = np.clip(ay - y0, 0.0, 1.0)
        return (
            arr[y0, x0] * (1 - fx) * (1 - fy)
            + arr[y0, x0 + 1] * fx * (1 - fy)
            + arr[y0 + 1, x0] * (1 - fx) * fy
            + arr[y0 + 1, x0 + 1] * fx * fy
        )

    def forward_np(self, pixel, line):
        """(pixel, line) -> (lon, lat): bilinear in the geoloc arrays."""
        ax = (np.asarray(pixel, np.float64) - self.px_off) / self.px_step
        ay = (np.asarray(line, np.float64) - self.ln_off) / self.ln_step
        return self._sample(self.lon, ax, ay), self._sample(self.lat, ax, ay)

    # -- inverse ----------------------------------------------------------
    def _affine_seed(self):
        if self._affine is None:
            H, W = self.lon.shape
            gy, gx = np.mgrid[0:H, 0:W]
            px = gx.ravel() * self.px_step + self.px_off
            py = gy.ravel() * self.ln_step + self.ln_off
            A = np.stack(
                [np.ones(px.size), self.lon.ravel(), self.lat.ravel()], axis=1
            )
            cx, *_ = np.linalg.lstsq(A, px, rcond=None)
            cy, *_ = np.linalg.lstsq(A, py, rcond=None)
            self._affine = (cx, cy)
        return self._affine

    def inverse_np(self, lon, lat, max_iter: int = 12, tol: float = 1e-3):
        """(lon, lat) -> (pixel, line), Newton with a shared
        finite-difference Jacobian refreshed per iteration; `tol` is
        the pixel-space convergence threshold."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        cx, cy = self._affine_seed()
        px = cx[0] + cx[1] * lon + cx[2] * lat
        py = cy[0] + cy[1] * lon + cy[2] * lat
        for _ in range(max_iter):
            flon, flat = self.forward_np(px, py)
            ex = flon - lon
            ey = flat - lat
            if max(np.max(np.abs(ex)), np.max(np.abs(ey))) < 1e-12:
                break
            eps = max(self.px_step, self.ln_step) * 0.5
            flon_x, flat_x = self.forward_np(px + eps, py)
            flon_y, flat_y = self.forward_np(px, py + eps)
            j00 = (flon_x - flon) / eps  # dlon/dpx
            j01 = (flon_y - flon) / eps  # dlon/dpy
            j10 = (flat_x - flat) / eps
            j11 = (flat_y - flat) / eps
            det = j00 * j11 - j01 * j10
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            dpx = (ex * j11 - ey * j01) / det
            dpy = (ey * j00 - ex * j10) / det
            px = px - dpx
            py = py - dpy
            if max(np.max(np.abs(dpx)), np.max(np.abs(dpy))) < tol:
                break
        return px, py
