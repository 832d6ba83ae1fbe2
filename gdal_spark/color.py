"""Color quantization: median-cut palette + Floyd-Steinberg dither
(the reference's RGB->paletted pipeline: alg/gdalmediancut.cpp
GDALComputeMedianCutPCT + alg/gdaldither.cpp GDALDitherRGB2PCT).

Distributed shape:
  palette — per-tile strided RGB samples stream to the driver (bounded
  by the stride, not the raster size) and one numpy median-cut runs
  there: the palette is a tiny global model, like the broadcast
  spatial index.
  dither — per-tile Floyd-Steinberg error diffusion against the
  broadcast palette. GDAL diffuses across the whole image serially;
  per-tile diffusion (errors reset at tile borders) is the documented
  distributed approximation — border pixels can differ from a
  single-pass global dither by at most the diffused error magnitude.

Input: the tile table with band in {1,2,3} as R,G,B planes per tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .synth import TILE_SCHEMA
from .tiling import _decode

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("r", T.IntegerType()),
        T.StructField("g", T.IntegerType()),
        T.StructField("b", T.IntegerType()),
    ]
)


def _assemble_rgb(pdf: pd.DataFrame):
    bands = {}
    first = pdf.iloc[0]
    h, w = int(first["height"]), int(first["width"])
    for i in range(len(pdf)):
        row = pdf.iloc[i]
        bands[int(row["band"])] = _decode(
            row["data"], row["dtype"], int(row["height"]), int(row["width"])
        ).astype(np.float64)
    return np.stack([bands[1], bands[2], bands[3]], axis=-1), h, w


def median_cut_palette(tiles: DataFrame, n_colors: int = 16,
                       stride: int = 7) -> np.ndarray:
    """(n_colors, 3) uint8 palette via median cut over strided samples
    (GDALComputeMedianCutPCT, alg/gdalmediancut.cpp)."""

    def sample(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rgb, h, w = _assemble_rgb(pdf)
        sub = rgb[::stride, ::stride].reshape(-1, 3).astype(np.int32)
        return pd.DataFrame({"r": sub[:, 0], "g": sub[:, 1], "b": sub[:, 2]})

    pts = (
        tiles.groupBy("tile_x", "tile_y")
        .applyInPandas(sample, schema=SAMPLE_SCHEMA)
        .toPandas()
        .to_numpy(dtype=np.float64)
    )
    boxes = [pts]
    while len(boxes) < n_colors:
        # split the box with the largest channel range at its median
        ranges = [
            (b[:, c].max() - b[:, c].min() if len(b) > 1 else -1.0, i, c)
            for i, b in enumerate(boxes)
            for c in range(3)
        ]
        rng, bi, ch = max(ranges)
        if rng <= 0:
            break
        b = boxes.pop(bi)
        med = np.median(b[:, ch])
        lo = b[b[:, ch] <= med]
        hi = b[b[:, ch] > med]
        if len(lo) == 0 or len(hi) == 0:
            order = np.argsort(b[:, ch], kind="stable")
            half = len(b) // 2
            lo, hi = b[order[:half]], b[order[half:]]
        boxes.extend([lo, hi])
    pal = np.array(
        [b.mean(axis=0) if len(b) else [0, 0, 0] for b in boxes]
    )
    return np.clip(np.round(pal), 0, 255).astype(np.uint8)


def dither(tiles: DataFrame, palette: np.ndarray,
           dst_raster_id: str = "paletted") -> DataFrame:
    """RGB tiles -> single-band palette-index tiles via per-tile
    Floyd-Steinberg error diffusion (GDALDitherRGB2PCT,
    alg/gdaldither.cpp) against the broadcast palette."""
    spark = tiles.sparkSession
    bc = spark.sparkContext.broadcast(palette.astype(np.float64))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pal = bc.value
        rgb, h, w = _assemble_rgb(pdf)
        out = np.zeros((h, w), dtype=np.uint8)
        work = rgb.copy()
        for y in range(h):
            xs = range(w) if y % 2 == 0 else range(w - 1, -1, -1)  # serpentine
            step = 1 if y % 2 == 0 else -1
            for x in xs:
                px = work[y, x]
                d = pal - px[None, :]
                k = int(np.argmin((d * d).sum(axis=1)))
                out[y, x] = k
                err = px - pal[k]
                if 0 <= x + step < w:
                    work[y, x + step] += err * (7 / 16)
                if y + 1 < h:
                    if 0 <= x - step < w:
                        work[y + 1, x - step] += err * (3 / 16)
                    work[y + 1, x] += err * (5 / 16)
                    if 0 <= x + step < w:
                        work[y + 1, x + step] += err * (1 / 16)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                {
                    "raster_id": dst_raster_id, "band": 1,
                    "zoom": int(first["zoom"]),
                    "tile_x": int(first["tile_x"]),
                    "tile_y": int(first["tile_y"]),
                    "width": w, "height": h, "dtype": "uint8",
                    "nodata": -1.0, "crs": str(first["crs"]),
                    "geotransform": list(first["geotransform"]),
                    "data": out.tobytes(),
                }
            ]
        )

    return tiles.groupBy("tile_x", "tile_y").applyInPandas(run, schema=TILE_SCHEMA)
