"""ERMapper ERS raster driver (.ers ASCII header + raw BIL data file).

Reference: gdal/frmts/ers/ersdataset.cpp and ershdrnode.cpp —
  - the header is a nested `Name Begin ... End` block of `Key = value`
    lines; lookups are dotted paths (ERSHdrNode::Find), e.g.
    RasterInfo.NrOfLines / NrOfCellsPerLine / NrOfBands (:897-923),
    RasterInfo.CellType (:944-962 Unsigned8BitInteger ...
    IEEE8ByteReal), ByteOrder LSBFirst/MSBFirst (:971-977),
    HeaderOffset (:933-941), RasterInfo.NullCellValue (:1205).
  - the data file (DataFile key, default = header name minus .ers)
    is raw BAND-INTERLEAVED-BY-LINE: band offset = word * band * nx,
    line stride = word * nbands * nx (:1065-1075 ERSRasterBand).
  - georeferencing (:1143-1200): RegistrationCoord
    Eastings/Northings = the coordinate of cell
    (RegistrationCellX, RegistrationCellY) (default 0,0 = the UL
    corner); gt = (E - cellX*dx, dx, 0, N - cellY*(-dy), 0, -dy)
    with CellInfo.Xdimension/Ydimension.

Spark lowering: a pure composition — parse the small text header
driver-side, then ehdr.read_raw / _write_raw_data do the
descriptor-parallel map-only BIL scan and parallel-pwrite sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import ehdr

CELLTYPES = {
    "unsigned8bitinteger": "uint8", "signed8bitinteger": "int8",
    "unsigned16bitinteger": "uint16", "signed16bitinteger": "int16",
    "unsigned32bitinteger": "uint32", "signed32bitinteger": "int32",
    "ieee4bytereal": "float32", "ieee8bytereal": "float64",
}
_RCELL = {v: k for k, v in CELLTYPES.items()}
_RCELL_NAMES = {  # canonical capitalization the reference writes
    "uint8": "Unsigned8BitInteger", "int8": "Signed8BitInteger",
    "uint16": "Unsigned16BitInteger", "int16": "Signed16BitInteger",
    "uint32": "Unsigned32BitInteger", "int32": "Signed32BitInteger",
    "float32": "IEEE4ByteReal", "float64": "IEEE8ByteReal",
}


def parse_ers_header(text: str) -> dict:
    """Nested Begin/End blocks -> flat dotted-path dict (ershdrnode.cpp
    ERSHdrNode::ParseChildren / Find)."""
    flat: dict[str, str] = {}
    stack: list[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.lower().endswith(" begin"):
            stack.append(line[:-6].strip())
            continue
        if line.split()[0].lower() == "end" or \
                line.lower().endswith(" end"):
            if stack:
                stack.pop()
            continue
        if "=" in line:
            k, _, v = line.partition("=")
            v = v.strip().rstrip(";").strip().strip('"')
            path = ".".join(stack[1:] + [k.strip()])  # root block implicit
            flat[path] = v
    return flat


def _layout_from_header(flat: dict, path: str) -> tuple[dict, str]:
    nrows = int(flat["RasterInfo.NrOfLines"])
    ncols = int(flat["RasterInfo.NrOfCellsPerLine"])
    nbands = int(flat.get("RasterInfo.NrOfBands", "1"))
    dtype = CELLTYPES[flat.get("RasterInfo.CellType",
                               "Unsigned8BitInteger").lower()]
    bo = "<" if flat.get("ByteOrder", "LSBFirst").lower() == "lsbfirst" \
        else ">"
    skip = int(flat.get("HeaderOffset", "0"))
    dx = float(flat.get("RasterInfo.CellInfo.Xdimension", "1"))
    dy = float(flat.get("RasterInfo.CellInfo.Ydimension", "1"))
    e = float(flat.get("RasterInfo.RegistrationCoord.Eastings", "0"))
    n = float(flat.get("RasterInfo.RegistrationCoord.Northings",
                       str(nrows * dy)))
    cx = float(flat.get("RasterInfo.RegistrationCellX", "0"))
    cy = float(flat.get("RasterInfo.RegistrationCellY", "0"))
    gt = [e - cx * dx, dx, 0.0, n - cy * -dy, 0.0, -dy]
    nd = flat.get("RasterInfo.NullCellValue")
    data = flat.get("DataFile", "")
    data_path = os.path.join(os.path.dirname(path), data) if data \
        else os.path.splitext(path)[0]
    hdr = {"nrows": nrows, "ncols": ncols, "nbands": nbands,
           "dtype": dtype, "byteorder": bo, "interleave": "bil",
           "skip": skip, "geotransform": gt,
           "nodata": float(nd) if nd is not None else None,
           "crs": flat.get("CoordinateSpace.Projection", "")}
    return hdr, data_path


def read_ers(spark: SparkSession, path: str, *, tile_px: int = 256,
             raster_id: str | None = None, zoom: int = 0) -> DataFrame:
    """ERS scan -> tile table (map-only BIL strip scan)."""
    flat = parse_ers_header(open(path).read())
    hdr, data_path = _layout_from_header(flat, path)
    rid = raster_id or os.path.splitext(os.path.basename(path))[0]
    return ehdr.read_raw(spark, data_path, hdr, tile_px=tile_px,
                         raster_id=rid, zoom=zoom, crs=hdr["crs"])


def write_ers(tiles: DataFrame, path: str, *, tile_px: int = 256,
              projection: str = "RAW", datum: str = "RAW") -> dict:
    """ERS sink: .ers text header driver-side, BIL data file via the
    parallel-pwrite raw sink.  `path` names the header; the data file
    is `path` minus the .ers extension (the reference default)."""
    m = ehdr._collect_meta(tiles)
    nrows, ncols = int(m["img_h"]), int(m["img_w"])
    nbands, dtype = int(m["nbands"]), m["dtype"]
    if dtype not in _RCELL_NAMES:
        raise ValueError(f"no ERS CellType for {dtype}")
    gt = list(m["gt"]) if m["gt"] is not None else \
        [0.0, 1.0, 0.0, float(nrows), 0.0, -1.0]
    data_path = os.path.splitext(path)[0]
    ehdr._write_raw_data(tiles, data_path, interleave="bil",
                         nrows=nrows, ncols=ncols, nbands=nbands,
                         dtype=dtype, tile_px=tile_px)
    nodata = m["nodata"]
    nd_line = "" if nodata is None or nodata != nodata else \
        f"\t\tNullCellValue\t= {float(nodata)!r}\n"
    hdr = (
        'DatasetHeader Begin\n'
        '\tVersion\t\t= "6.4"\n'
        '\tDataSetType\t= ERStorage\n'
        '\tDataType\t= Raster\n'
        '\tByteOrder\t= LSBFirst\n'
        '\tCoordinateSpace Begin\n'
        f'\t\tDatum\t\t= "{datum}"\n'
        f'\t\tProjection\t= "{projection}"\n'
        '\t\tCoordinateType\t= EN\n'
        '\t\tUnits\t\t= "METERS"\n'
        '\t\tRotation\t= 0:0:0.0\n'
        '\tCoordinateSpace End\n'
        '\tRasterInfo Begin\n'
        f'\t\tCellType\t= {_RCELL_NAMES[dtype]}\n'
        + nd_line +
        '\t\tCellInfo Begin\n'
        f'\t\t\tXdimension\t= {gt[1]!r}\n'
        f'\t\t\tYdimension\t= {-gt[5]!r}\n'
        '\t\tCellInfo End\n'
        f'\t\tNrOfLines\t= {nrows}\n'
        f'\t\tNrOfCellsPerLine\t= {ncols}\n'
        '\t\tRegistrationCoord Begin\n'
        f'\t\t\tEastings\t= {gt[0]!r}\n'
        f'\t\t\tNorthings\t= {gt[3]!r}\n'
        '\t\tRegistrationCoord End\n'
        f'\t\tNrOfBands\t= {nbands}\n'
        '\tRasterInfo End\n'
        'DatasetHeader End\n'
    )
    with open(path, "w") as f:
        f.write(hdr)
    return {"nrows": nrows, "ncols": ncols, "dtype": dtype,
            "nbands": nbands, "data_path": data_path}
