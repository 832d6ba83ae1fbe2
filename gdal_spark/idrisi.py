"""Idrisi / TerrSet raster driver (.rst + .rdc documentation file).

Reference: gdal/frmts/idrisi/IdrisiDataset.cpp —
  - the .rdc metadata file is `key : value` lines with 12-char key
    fields (:73-101): data type byte/integer/real/rgb24 (:124-127),
    columns/rows, min./max. X/Y and `unit dist.` scaling (the
    geotransform multiplies extents by the unit, :820-845), flag
    value as nodata.
  - the .rst data file is raw little-endian, rows TOP-DOWN
    (IReadBlock :1555 seeks to `recordSize * row`); rgb24 pixels are
    stored B,G,R so GDAL band n is byte `3 - n` of each triplet
    (:1576-1582) — the BMP convention.
  - writer: Create (:1130-1260) emits the same layout plus the
    canonical "Idrisi Raster A.1" file-format line.

Spark lowering: byte/integer/real grids lower straight onto
ehdr.read_raw (descriptor-parallel map-only strip scan, parallel
pwrite sink); rgb24 is the same scan with interleave=bip and a
band-number remap column (n -> 4-n) on both sides — a pure
projection, no extra exchange.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ehdr

RST_VERSION = "Idrisi Raster A.1"
_DTYPES = {"byte": "uint8", "integer": "int16", "real": "float32"}
_RDTYPES = {v: k for k, v in _DTYPES.items()}


def _rdc_path(path: str) -> str:
    return os.path.splitext(path)[0] + ".rdc"


def parse_rdc(text: str) -> dict:
    """`key : value` lines, 12-char key field (IdrisiDataset.cpp
    :73-101 rdc* constants)."""
    kv: dict[str, str] = {}
    for line in text.splitlines():
        if ":" not in line:
            continue
        k, _, v = line.partition(":")
        kv[k.strip().lower()] = v.strip()
    ncols, nrows = int(kv["columns"]), int(kv["rows"])
    dt = kv.get("data type", "byte").lower()
    if dt == "rgb24":
        dtype, nbands = "uint8", 3
    elif dt in _DTYPES:
        dtype, nbands = _DTYPES[dt], 1
    else:
        raise NotImplementedError(f"Idrisi data type {dt!r}")
    unit = float(kv.get("unit dist.", "1") or 1.0)
    minx = float(kv.get("min. x", "0")) * unit
    maxx = float(kv.get("max. x", str(ncols))) * unit
    miny = float(kv.get("min. y", "0")) * unit
    maxy = float(kv.get("max. y", str(nrows))) * unit
    gt = [minx, (maxx - minx) / ncols, 0.0,
          maxy, 0.0, (miny - maxy) / nrows]
    flag = kv.get("flag value", "")
    return {
        "nrows": nrows, "ncols": ncols, "nbands": nbands, "dtype": dtype,
        "byteorder": "<", "interleave": "bip" if nbands == 3 else "bsq",
        "skip": 0, "geotransform": gt,
        "nodata": float(flag) if flag else None,
        "crs": kv.get("ref. system", ""),
        "title": kv.get("file title", ""),
    }


def read_rst(spark: SparkSession, path: str, *, tile_px: int = 256,
             raster_id: str | None = None, zoom: int = 0) -> DataFrame:
    """RST scan -> tile table: ehdr.read_raw map-only strips; rgb24
    band numbers remapped 4-n (stored B,G,R; GDAL band 1 = R)."""
    hdr = parse_rdc(open(_rdc_path(path)).read())
    df = ehdr.read_raw(spark, path, hdr, tile_px=tile_px,
                       raster_id=raster_id, zoom=zoom,
                       crs=hdr.get("crs", ""))
    if hdr["nbands"] == 3:
        df = df.withColumn("band", (F.lit(4) - F.col("band")).cast("int"))
    return df


def write_rst(tiles: DataFrame, path: str, *, tile_px: int = 256,
              ref_system: str | None = None) -> dict:
    """RST sink: driver writes only the .rdc; pixels pwrite in
    parallel (rgb24 via the one narrow BIP interleave shuffle)."""
    m = ehdr._collect_meta(tiles)
    nrows, ncols = int(m["img_h"]), int(m["img_w"])
    nbands, dtype = int(m["nbands"]), m["dtype"]
    if nbands == 3:
        if dtype != "uint8":
            raise ValueError("Idrisi rgb24 stores byte samples")
        dt_name = "rgb24"
        # stored order B,G,R: remap band n -> storage slot 4-n
        tiles = tiles.withColumn(
            "band", (F.lit(4) - F.col("band")).cast("int"))
    elif nbands == 1 and dtype in _RDTYPES:
        dt_name = _RDTYPES[dtype]
    else:
        raise ValueError(f"Idrisi stores byte/integer/real/rgb24, "
                         f"not {nbands}x{dtype}")
    gt = list(m["gt"]) if m["gt"] is not None else \
        [0.0, 1.0, 0.0, float(nrows), 0.0, -1.0]
    ehdr._write_raw_data(tiles, path,
                         interleave="bip" if nbands == 3 else "bsq",
                         nrows=nrows, ncols=ncols, nbands=nbands,
                         dtype=dtype, tile_px=tile_px)
    nodata = m["nodata"]
    lines = [
        ("file format", RST_VERSION),
        ("file title", ""),
        ("data type", dt_name),
        ("file type", "binary"),
        ("columns", str(ncols)),
        ("rows", str(nrows)),
        ("ref. system", ref_system or (m["crs"] or "plane")),
        ("ref. units", "m"),
        ("unit dist.", "1.0000000"),
        ("min. X", repr(gt[0])),
        ("max. X", repr(gt[0] + gt[1] * ncols)),
        ("min. Y", repr(gt[3] + gt[5] * nrows)),
        ("max. Y", repr(gt[3])),
        ("pos'n error", "unknown"),
        ("resolution", repr(abs(gt[1]))),
        ("min. value", ""),
        ("max. value", ""),
        ("display min", ""),
        ("display max", ""),
        ("value units", "unspecified"),
        ("value error", "unknown"),
        ("flag value",
         "" if nodata is None or (isinstance(nodata, float)
                                  and np.isnan(nodata))
         else repr(float(nodata))),
        ("flag def'n", "none"),
        ("legend cats", "0"),
    ]
    with open(_rdc_path(path), "w") as f:
        for k, v in lines:
            f.write(f"{k:<12}: {v}\n")
    return {"nrows": nrows, "ncols": ncols, "dtype": dtype,
            "nbands": nbands}
