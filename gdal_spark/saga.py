"""SAGA GIS binary grid driver (.sgrd keyword header + .sdat body).

Reference:
  - gdal/frmts/saga/sagadataset.cpp — `KEY\\t= VALUE` header parse
    (:600-700), POSITION_XMIN/YMIN name CELL CENTERS so the
    geotransform shifts by half a cell (:721-726), TOPTOBOTTOM FALSE
    means bottom-up rows (the usual case; IReadBlock seeks
    `(nRasterYSize - nBlockYOff - 1)` :260), DATAFORMAT ->
    BYTE_UNSIGNED..DOUBLE type map (:636-668), NODATA_VALUE,
    Create/WriteHeader emitting the same keywords (:900-1010).
  - autotest/gdrivers/saga.py — 4byteFloat.sdat checksum 108.

Spark lowering: the body is a fixed-stride raw grid — bottom-up files
ride the gsg.py strip scan (a bottom-up strip is one contiguous
pread + a numpy flip), top-down files the ehdr read_raw scan; both
map-only, zero shuffles.  The sink writes the KB .sgrd driver-side
and pwrites bottom-up strips in parallel (gsg._write_bottom_up).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .ehdr import _collect_meta, read_raw
from .gsg import _read_bottom_up, _write_bottom_up

_FMT = {
    "BYTE_UNSIGNED": "uint8", "BYTE": "int8",
    "SHORTINT_UNSIGNED": "uint16", "SHORTINT": "int16",
    "DWORD": "uint32", "INTEGER_UNSIGNED": "uint32",
    "INTEGER": "int32", "FLOAT": "float32", "DOUBLE": "float64",
}
_FMT_BACK = {"uint8": "BYTE_UNSIGNED", "int8": "BYTE",
             "uint16": "SHORTINT_UNSIGNED", "int16": "SHORTINT",
             "uint32": "DWORD", "int32": "INTEGER",
             "float32": "FLOAT", "float64": "DOUBLE"}


def _paths(path: str) -> tuple[str, str]:
    base, ext = os.path.splitext(path)
    if ext.lower() == ".sgrd":
        return path, base + ".sdat"
    return base + ".sgrd", path


def parse_sgrd(path: str) -> dict:
    """.sgrd keyword header -> scan dict (sagadataset.cpp Open)."""
    sgrd, sdat = _paths(path)
    kv = {}
    with open(sgrd, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            if "=" in line:
                k, v = line.split("=", 1)
                kv[k.strip().upper()] = v.strip()
    fmt = kv.get("DATAFORMAT", "FLOAT").upper()
    if fmt not in _FMT:
        raise ValueError(f"SAGA DATAFORMAT {fmt!r} not supported")
    if kv.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE":
        raise ValueError("big-endian SAGA grids not supported")
    ncols = int(kv["CELLCOUNT_X"])
    nrows = int(kv["CELLCOUNT_Y"])
    cs = float(kv["CELLSIZE"])
    xmin = float(kv["POSITION_XMIN"])
    ymin = float(kv["POSITION_YMIN"])
    # POSITION_* name cell centers: shift half a cell (:721-726)
    gt = [xmin - cs / 2.0, cs, 0.0,
          ymin - cs / 2.0 + cs * nrows, 0.0, -cs]
    return dict(
        nrows=nrows, ncols=ncols, dtype=_FMT[fmt],
        data_offset=int(kv.get("DATAFILE_OFFSET", "0")),
        nodata=float(kv.get("NODATA_VALUE", "-99999")),
        geotransform=gt, z_factor=float(kv.get("Z_FACTOR", "1")),
        toptobottom=kv.get("TOPTOBOTTOM", "FALSE").upper() == "TRUE",
        sdat=sdat)


def read_saga(spark: SparkSession, path: str, *, tile_px: int = 256,
              raster_id: str | None = None, zoom: int = 0) -> DataFrame:
    """Distributed SAGA grid scan -> tile table (map-only)."""
    hdr = parse_sgrd(path)
    rid = raster_id or os.path.splitext(os.path.basename(path))[0]
    if hdr["toptobottom"]:
        raw = dict(nrows=hdr["nrows"], ncols=hdr["ncols"], nbands=1,
                   dtype=hdr["dtype"], interleave="bip",
                   skip=hdr["data_offset"],
                   geotransform=hdr["geotransform"], byteorder="<",
                   nodata=hdr["nodata"], crs="")
        return read_raw(spark, hdr["sdat"], raw, tile_px=tile_px,
                        raster_id=rid, zoom=zoom)
    return _read_bottom_up(spark, hdr["sdat"], hdr, tile_px=tile_px,
                           raster_id=rid, zoom=zoom, crs="")


def write_saga(tiles: DataFrame, path: str, *,
               tile_px: int = 256) -> dict:
    """.sgrd + .sdat sink (bottom-up body, parallel strip pwrite)."""
    sgrd, sdat = _paths(path)
    m = _collect_meta(tiles)
    nrows, ncols = int(m.img_h), int(m.img_w)
    dtype = str(m.dtype)
    if dtype not in _FMT_BACK:
        raise ValueError(f"SAGA cannot hold dtype {dtype}")
    gt = list(m.gt) if m.gt is not None else [0, 1, 0, 0, 0, -1]
    cs = gt[1]
    nod = m.nodata
    if nod is None or (isinstance(nod, float) and np.isnan(nod)):
        nod = -99999.0
    name = os.path.splitext(os.path.basename(sgrd))[0]
    hdr_txt = (
        f"NAME\t= {name}\nDESCRIPTION\t= \nUNIT\t= \n"
        f"DATAFILE_OFFSET\t= 0\nDATAFORMAT\t= {_FMT_BACK[dtype]}\n"
        f"BYTEORDER_BIG\t= FALSE\n"
        f"POSITION_XMIN\t= {gt[0] + cs / 2.0:.10f}\n"
        f"POSITION_YMIN\t= {gt[3] - cs * nrows + cs / 2.0:.10f}\n"
        f"CELLCOUNT_X\t= {ncols}\nCELLCOUNT_Y\t= {nrows}\n"
        f"CELLSIZE\t= {cs:.10f}\nZ_FACTOR\t= 1.000000\n"
        f"NODATA_VALUE\t= {float(nod):.6f}\nTOPTOBOTTOM\t= FALSE\n")
    with open(sgrd, "w", encoding="ascii") as f:
        f.write(hdr_txt)
    _write_bottom_up(tiles, sdat, b"", dtype, nrows, ncols, tile_px)
    return {"sgrd": sgrd, "sdat": sdat, "width": ncols,
            "height": nrows, "dtype": dtype}
