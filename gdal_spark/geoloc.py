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


def transform_geolocations(tiles, transform_np, *, x_band: int = 1,
                           y_band: int = 2, z_band: int | None = None):
    """GDALTransformGeolocations (alg/gdaltransformgeolocs.cpp:68):
    the X/Y (and optionally Z) location bands of a raster are pushed
    through a spatial transformer and written back.

    The reference walks the bands one scanline at a time through a
    single transformer callback; here the tile table groups each tile
    key's bands together (ONE keyed skew-free shuffle — every group is
    exactly the 2-3 bands of one tile) and `transform_np`, a
    vectorized (x, y, z) -> (x', y', z'|None) kernel, runs Arrow-
    batched per tile. Non-location bands pass through untouched."""
    import pandas as pd

    from .synth import TILE_SCHEMA
    from .tiling import _decode

    def apply(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bands = {int(b): i for i, b in enumerate(pdf["band"])}
        if x_band not in bands or y_band not in bands:
            raise ValueError(
                f"tile {tuple(key)}: missing X/Y location bands")
        out = pdf.copy()

        def arr(b):
            r = pdf.iloc[bands[b]]
            return _decode(r["data"], r["dtype"], r["height"],
                           r["width"]).astype(np.float64)

        x, y = arr(x_band), arr(y_band)
        z = arr(z_band) if z_band is not None and z_band in bands else None
        res = transform_np(x.ravel(), y.ravel(),
                           z.ravel() if z is not None else None)
        x2, y2 = res[0].reshape(x.shape), res[1].reshape(y.shape)
        z2 = res[2] if len(res) > 2 else None

        def put(b, a):
            i = bands[b]
            dt = pdf.iloc[i]["dtype"]
            out.iat[i, out.columns.get_loc("data")] = \
                a.astype(dt).tobytes()

        put(x_band, x2)
        put(y_band, y2)
        if z2 is not None and z_band is not None and z_band in bands:
            put(z_band, z2.reshape(x.shape))
        return out

    return tiles.groupBy("zoom", "tile_x", "tile_y").applyInPandas(
        apply, schema=TILE_SCHEMA)
