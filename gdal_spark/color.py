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
    # canonical sample order: Spark returns tile groups in arbitrary
    # order, and the degenerate-split branch below is order-sensitive —
    # lexsort makes the palette a pure function of the sample SET
    pts = pts[np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))]
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


def dither_tile(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Serpentine Floyd-Steinberg error diffusion of one (H, W, 3)
    uint8 tile against a (P, 3) palette; returns (H, W) uint8 indices.

    Integer error arithmetic with clamp-before-search, the shape of
    GDALDitherRGB2PCT's scanline loop (alg/gdaldither.cpp:238-330,
    int error accumulators + CLAMP + nearest-color cache). The serial
    in-row carry is irreducible, so the inner loop runs on Python ints
    with a memoized exact nearest-palette lookup (the analog of GDAL's
    color cache) — ~20x faster than per-pixel numpy argmin and exact:
    cache hits return precomputed exact answers, misses do the full
    scan. Error weights are 7/16 right, 3/16, 5/16, 1/16 down, floor
    division, remainder folded into the 1/16 slot so error is
    conserved like GDAL's int pipeline."""
    h, w = rgb.shape[:2]
    out = np.zeros((h, w), dtype=np.uint8)
    pal = [(int(r), int(g), int(b)) for r, g, b in palette.astype(np.int64)]
    memo: dict = {}
    cur = [[0] * w for _ in range(3)]  # error arriving from the row above
    for y in range(h):
        serp = y & 1
        step = -1 if serp else 1
        xs = range(w - 1, -1, -1) if serp else range(w)
        nxt = [[0] * w for _ in range(3)]
        rr = rgb[y, :, 0].tolist()
        gg = rgb[y, :, 1].tolist()
        bb = rgb[y, :, 2].tolist()
        cr0, cg0, cb0 = cur
        nr0, ng0, nb0 = nxt
        out_row = out[y]
        car_r = car_g = car_b = 0
        for x in xs:
            r = rr[x] + cr0[x] + car_r
            g = gg[x] + cg0[x] + car_g
            b = bb[x] + cb0[x] + car_b
            rc = 0 if r < 0 else (255 if r > 255 else r)
            gc = 0 if g < 0 else (255 if g > 255 else g)
            bc_ = 0 if b < 0 else (255 if b > 255 else b)
            key = (rc << 16) | (gc << 8) | bc_
            k = memo.get(key)
            if k is None:
                best = 1 << 30
                k = 0
                for i, (pr, pg, pb) in enumerate(pal):
                    d = (rc - pr) ** 2 + (gc - pg) ** 2 + (bc_ - pb) ** 2
                    if d < best:
                        best = d
                        k = i
                memo[key] = k
            out_row[x] = k
            pr, pg, pb = pal[k]
            er, eg, eb = rc - pr, gc - pg, bc_ - pb
            e7r, e5r, e3r = (er * 7) // 16, (er * 5) // 16, (er * 3) // 16
            e7g, e5g, e3g = (eg * 7) // 16, (eg * 5) // 16, (eg * 3) // 16
            e7b, e5b, e3b = (eb * 7) // 16, (eb * 5) // 16, (eb * 3) // 16
            car_r, car_g, car_b = e7r, e7g, e7b
            nr0[x] += e5r
            ng0[x] += e5g
            nb0[x] += e5b
            xm = x - step
            if 0 <= xm < w:
                nr0[xm] += e3r
                ng0[xm] += e3g
                nb0[xm] += e3b
            xp = x + step
            if 0 <= xp < w:
                nr0[xp] += er - e7r - e5r - e3r
                ng0[xp] += eg - e7g - e5g - e3g
                nb0[xp] += eb - e7b - e5b - e3b
            else:
                car_r = car_g = car_b = 0
        cur = nxt
    return out


def dither(tiles: DataFrame, palette: np.ndarray,
           dst_raster_id: str = "paletted") -> DataFrame:
    """RGB tiles -> single-band palette-index tiles via per-tile
    Floyd-Steinberg error diffusion (GDALDitherRGB2PCT,
    alg/gdaldither.cpp) against the broadcast palette."""
    spark = tiles.sparkSession
    bc = spark.sparkContext.broadcast(palette.astype(np.uint8))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pal = bc.value
        rgb, h, w = _assemble_rgb(pdf)
        out = dither_tile(
            np.clip(np.round(rgb), 0, 255).astype(np.uint8), pal
        )
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
