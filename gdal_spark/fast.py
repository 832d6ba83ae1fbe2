"""EOSAT FAST / FAST-L7A (Landsat, IRS 1C/1D) raster reader.

Reference: gdal/frmts/raw/fastdataset.cpp —
  - 5000-byte text admin header; GetValue (:~525) finds "KEY =" and
    takes a fixed-width value (ACQUISITION DATE 8, SATELLITE 10,
    SENSOR 10, FILENAME 29, PIXELS PER LINE 5, LINES PER BAND/IMAGE
    5, BITS PER PIXEL 2 — 10/16 bits → uint16).
  - band files: FILENAME= entries (Landsat), else the Euromap IRS
    conventions (:373-515): PAN header last letter a-j → digit
    0-9, k-m → n-p; LISS3 rows 0/6/b/g/l/q/v → the 4 following
    letters; WIFS '0' → '1','2'; else bandN.dat-style guesses.
  - georef (:940-1140): corner coordinates 28 chars after
    "UL/UR/LL/LR " within the PROJECTION record (13-wide values,
    pixel-center convention), zone-prefixed eastings stripped;
    the geotransform is the least-squares fit of the four corner
    GCPs at (0.5, 0.5)-style pixel centers
    (GDALGCPsToGeoTransform).
  - GAIN%d/BIAS%d metadata from the "BIASES AND GAINS" record in
    whichever order the header spells it.

Spark lowering: the driver parses the KB header; each band file is
a bare raw strip file read map-only via the shared `read_raw`
scan."""

from __future__ import annotations

import os
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _get_value(header: str, key: str, size: int) -> str | None:
    i = header.find(key)
    if i < 0:
        return None
    i += len(key)
    while i < len(header) and header[i] == " ":
        i += 1
    while i < len(header) and header[i] == "=":
        i += 1
    return header[i:i + size].strip()


def _ci_file(dirname: str, name: str) -> str | None:
    for cand in (name, name.lower(), name.upper()):
        p = os.path.join(dirname, cand)
        if os.path.exists(p):
            return p
    low = name.lower()
    for f in os.listdir(dirname):
        if f.lower() == low:
            return os.path.join(dirname, f)
    return None


_LISS_ROWS = ["02345", "6789a", "bcdef", "ghijk", "lmnop", "qrstu",
              "vwxyz"]


def _euromap_bands(path: str, sensor: str) -> list[str]:
    last = path[-1]
    out = []

    def variant(ch):
        cand = path[:-1] + ch
        if os.path.exists(cand):
            return cand
        up = path[:-1] + ch.upper()
        return up if os.path.exists(up) else None

    if sensor == "PAN":
        c = last.lower() if "A" <= last <= "M" else last
        if "a" <= c <= "j":
            f = variant(chr(ord("0") + ord(c) - ord("a")))
            if f:
                out.append(f)
        elif "k" <= c <= "m":
            f = variant(chr(ord("n") + ord(c) - ord("k")))
            if f:
                out.append(f)
    elif sensor == "LISS3":
        for row in _LISS_ROWS:
            if last == row[0] or last.lower() == row[0]:
                for ch in row[1:]:
                    f = variant(ch)
                    if f:
                        out.append(f)
                break
    elif sensor == "WIFS":
        if last == "0":
            for ch in "12":
                f = variant(ch)
                if f:
                    out.append(f)
    return out


def parse_fast(path: str) -> dict:
    with open(path, "rb") as f:
        header = f.read(5000).decode("latin-1", errors="replace")
    md = {}
    for key, klen, size in (("ACQUISITION DATE", 0, 8),
                            ("SATELLITE", 0, 10), ("SENSOR", 0, 10)):
        v = _get_value(header, key, size)
        if v is not None:
            md[key.replace(" ", "_")] = v
    satellite = md.get("SATELLITE", "")
    landsat = satellite.upper().startswith("LANDSAT")

    dirname = os.path.dirname(os.path.abspath(path))
    bands = []
    # FILENAME= entries
    at = 0
    for _ in range(7):
        i = header.find("FILENAME", at)
        if i < 0:
            break
        at = i + 8
        j = at
        while j < len(header) and header[j] in " =":
            j += 1
        name = header[j:j + 29].strip()
        if name:
            p = _ci_file(dirname, name)
            if p:
                bands.append(p)
    if not bands and not landsat:
        bands = _euromap_bands(path, md.get("SENSOR", ""))
    if not bands:
        # bandN.dat-style guesses
        base = os.path.splitext(os.path.basename(path))[0]
        ext = os.path.splitext(path)[1].lstrip(".")
        for n in range(1, 8):
            for cand in (f"{base}.b{n:02d}", f"band{n}.{ext}",
                         f"band{n}.dat", f"imagery{n}.dat",
                         f"imagery{n}.{ext}"):
                p = _ci_file(dirname, cand)
                if p:
                    bands.append(p)
                    break
    if not bands:
        raise ValueError(f"FAST: no band files found for {path}")

    W = int(_get_value(header, "PIXELS PER LINE", 5) or 0)
    H = int(_get_value(header, "LINES PER BAND", 5)
            or _get_value(header, "LINES PER IMAGE", 5) or 0)
    bits = int(_get_value(header, "OUTPUT BITS PER PIXEL", 2)
               or _get_value(header, "BITS PER PIXEL", 2) or 8)
    dtype = "uint16" if bits in (10, 16) else "uint8"

    # gains/biases
    bi = header.find("BIASES")
    gi = header.find("GAINS")
    if bi >= 0 and gi >= 0:
        first, second = ("GAIN{}", "BIAS{}") if bi > gi \
            else ("BIAS{}", "GAIN{}")
        seg = header[min(bi, gi):]
        nums = re.findall(r"[-+]?[0-9]*\.?[0-9]+", seg)
        for b in range(len(bands)):
            if 2 * b + 1 < len(nums):
                md[first.format(b + 1)] = nums[2 * b]
                md[second.format(b + 1)] = nums[2 * b + 1]

    # corner GCPs -> least-squares geotransform
    zone = int(_get_value(header, "USGS MAP ZONE", 6) or 0)
    geom = header[header.find("PROJECTION"):] \
        if "PROJECTION" in header else ""
    corners = {}
    for tag in ("UL ", "UR ", "LL ", "LR "):
        i = geom.find(tag)
        if i >= 0:
            at2 = i + len(tag) + 28
            x = _scan_double(geom[at2:at2 + 13])
            y = _scan_double(geom[at2 + 14:at2 + 27])
            corners[tag.strip()] = (x, y)
    gt = [0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    if len(corners) == 4 and all(
            v != (0.0, 0.0) for v in corners.values()):
        cc = {k: ((x - zone * 1e6 if x >= 1e6 else x), y)
              for k, (x, y) in corners.items()}
        px = {"UL": (0.5, 0.5), "UR": (W - 0.5, 0.5),
              "LR": (W - 0.5, H - 0.5), "LL": (0.5, H - 0.5)}
        A = np.array([[1.0, px[k][0], px[k][1]] for k in cc])
        bx = np.array([cc[k][0] for k in cc])
        by = np.array([cc[k][1] for k in cc])
        sx, *_ = np.linalg.lstsq(A, bx, rcond=None)
        sy, *_ = np.linalg.lstsq(A, by, rcond=None)
        gt = [sx[0], sx[1], sx[2], sy[0], sy[1], sy[2]]
    return dict(width=W, height=H, dtype=dtype, bands=bands,
                geotransform=gt, metadata=md)


def _scan_double(s: str) -> float:
    m = re.search(r"[-+]?[0-9]*\.?[0-9]+([eEdD][-+]?[0-9]+)?", s)
    return float(m.group(0).replace("D", "E").replace("d", "e")) \
        if m else 0.0


def read_fast(spark: SparkSession, path: str, *, tile_px: int = 256,
              raster_id: str | None = None, zoom: int = 0) -> DataFrame:
    from pyspark.sql import functions as F

    from .ehdr import read_raw

    info = parse_fast(path)
    rid = raster_id or os.path.splitext(os.path.basename(path))[0]
    out = None
    for b, bpath in enumerate(info["bands"], start=1):
        hdr = dict(nrows=info["height"], ncols=info["width"],
                   nbands=1, dtype=info["dtype"], interleave="bsq",
                   skip=0, geotransform=info["geotransform"],
                   byteorder=">" if info["dtype"] == "uint16" else "<",
                   nodata=None, crs="")
        t = read_raw(spark, bpath, hdr, tile_px=tile_px,
                     raster_id=rid, zoom=zoom) \
            .withColumn("band", F.lit(b).cast("int"))
        out = t if out is None else out.unionByName(t)
    return out
