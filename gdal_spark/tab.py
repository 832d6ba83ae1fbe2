"""MapInfo TAB (binary) vector reader: .tab + .dat + .map + .id.

Reference: gdal/ogr/ogrsf_frmts/mitab/ —
  - mitab_mapheaderblock.cpp InitBlockFromData (:176-330): magic
    0x42424242 at 0x100, version/block-size at 0x104/0x106,
    quadrant byte at 0x161, X/YScale + X/YDispl doubles at
    0x170..0x190; Int2Coordsys (:357): quadrant 2/3/0 negates
    (x+displ)/scale, 3/4/0 negates (y+displ)/scale (no rounding on
    read — UpdatePrecision runs only on write).
  - mitab_idfile.cpp: .id = one little-endian int32 per fid
    (1-based), the absolute byte offset of the object record in
    .map (0 = no geometry).
  - mitab_mapobjectblock.cpp: object blocks (type 2) carry a
    20-byte header (numDataBytes i16 @2, center x/y i32 @4 — the
    base for compressed int16 coordinates); object record = type
    u8 + id i32 + per-type body (ReadObj of each TABMAPObj*
    class); type%3==1 means compressed.
  - mitab_mapcoordblock.cpp: coordinate blocks (type 3) carry an
    8-byte header (numDataBytes i16 @2, next block ptr i32 @4) and
    chain; region/pline section headers (ReadCoordSecHdrs :~208):
    numVertices i16 (i32 >= V450), numHoles i16, MBR, data offset
    i32; compressed coords are relative to the OBJECT's
    compressed-origin.
  - mitab_feature.cpp geometry generation: rects are 5-point
    rings; rounded rects 4 x 45-point quarter arcs
    (TABGenerateArc, :4176-4206); ellipses 180-point arcs (:4628);
    arcs |end-start|/2+1 points at tenths-of-degree angles
    (:5138); TABCloseRing closes rings.
  - mitab_datfile.cpp: .dat is dBASE-framed (numRecords i32 @4,
    first-record ptr i16 @8, record size i16 @10, 32-byte field
    descriptors) but fields are MapInfo-native binary: the TRUE
    types come from the .tab text's `Fields` section — Integer =
    LE i32, SmallInt = LE i16, Float = LE f64, Char/Decimal =
    ASCII, Logical = 'T'/'F', Date = u16 year + month + day.

Feature styles (pen/brush/symbol tool defs) and TEXT string
geometry are not decoded (geometry + attributes only); TEXT
objects yield their label anchor point.

Spark lowering: the driver reads the KB .tab/.dat header and .id
array, partitions the fid range, and executors decode their
feature slices straight from .map/.dat preads in mapInPandas —
map-only, zero shuffles."""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .fmt import fmt_coord as fnum

# geometry type codes (mitab.h TAB_GEOM_*)
_SYMBOLS = {0x01, 0x02, 0x28, 0x29, 0x2B, 0x2C}
_LINES = {0x04, 0x05}
_PLINES = {0x07, 0x08}
_MULTIPLINES = {0x25, 0x26, 0x31, 0x32}
_REGIONS = {0x0D, 0x0E, 0x2E, 0x2F}
_RECTS = {0x13, 0x14}
_ROUNDRECTS = {0x16, 0x17}
_ELLIPSES = {0x19, 0x1A}
_ARCS = {0x0A, 0x0B}
_TEXTS = {0x10, 0x11}
_MULTIPOINTS = {0x34, 0x35}
_COLLECTIONS = {0x37, 0x38}
_V450 = {0x2E, 0x2F, 0x31, 0x32}


def identify(path: str) -> bool:
    if not path.lower().endswith(".tab"):
        return False
    try:
        with open(path, "r", encoding="latin-1") as f:
            head = f.read(512)
        return "!table" in head
    except OSError:
        return False


# ----------------------------------------------------------- .tab text

_TAB_TYPES = {
    "integer": ("int", 4), "smallint": ("smallint", 2),
    "float": ("float", 8), "char": ("char", None),
    "decimal": ("decimal", None), "date": ("date", 4),
    "logical": ("logical", 1),
}


def parse_tab_text(path: str) -> dict:
    fields = []
    coordsys = ""
    in_fields = 0
    for line in open(path, encoding="latin-1"):
        s = line.strip()
        low = s.lower()
        if low.startswith("coordsys"):
            coordsys = s
        if low.startswith("fields"):
            in_fields = int(s.split()[1])
            continue
        if in_fields and s:
            toks = s.replace(";", " ").split()
            name, typ = toks[0], toks[1].lower()
            width = None
            if "(" in s:
                width = [int(v) for v in
                         s[s.index("(") + 1:s.index(")")].split(",")]
            fields.append((name, typ, width))
            in_fields -= 1
    return {"fields": fields, "coordsys": coordsys}


# ------------------------------------------------------------- .map


class MapFile:
    """Random-access .map decode (driver parses the 1KB header;
    executors construct one per task)."""

    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "rb")
        hdr = self.f.read(1024)
        magic, = struct.unpack("<i", hdr[0x100:0x104])
        if magic != 42424242:
            raise ValueError(f"TAB .map: bad magic in {path}")
        self.version, self.block_size = struct.unpack(
            "<2h", hdr[0x104:0x108])
        self.quadrant = hdr[0x161]
        self.xscale, self.yscale, self.xdispl, self.ydispl = \
            struct.unpack("<4d", hdr[0x170:0x190])

    def int2coord(self, nx: int, ny: int) -> tuple[float, float]:
        q = self.quadrant
        if q in (2, 3, 0):
            x = -1.0 * (nx + self.xdispl) / self.xscale
        else:
            x = (nx - self.xdispl) / self.xscale
        if q in (3, 4, 0):
            y = -1.0 * (ny + self.ydispl) / self.yscale
        else:
            y = (ny - self.ydispl) / self.yscale
        return x, y

    # -- raw readers --------------------------------------------------
    def _block_center(self, block_off: int) -> tuple[int, int]:
        self.f.seek(block_off + 4)
        return struct.unpack("<2i", self.f.read(8))

    def coord_stream(self, ptr: int, nbytes: int) -> bytes:
        """Read nbytes of coordinate data starting at absolute ptr,
        following the coord-block chain across 512-byte blocks."""
        bs = self.block_size
        out = bytearray()
        while len(out) < nbytes:
            block = ptr - ptr % bs
            self.f.seek(block)
            bh = self.f.read(8)
            ndata = struct.unpack("<h", bh[2:4])[0]
            nxt = struct.unpack("<i", bh[4:8])[0]
            end = block + 8 + ndata
            take = min(end - ptr, nbytes - len(out))
            self.f.seek(ptr)
            out += self.f.read(take)
            ptr = nxt
            if take <= 0 or (ptr <= 0 and len(out) < nbytes):
                break
        return bytes(out)

    def read_object(self, offset: int):
        """Decode one object record → (geom_wkt | None)."""
        bs = self.block_size
        center = self._block_center(offset - offset % bs)
        self.f.seek(offset)
        buf = self.f.read(min(512, bs - offset % bs) + 512)
        # object records never span blocks; read generous slice
        self.f.seek(offset)
        head = self.f.read(5)
        typ = head[0]
        pos = [5]
        compressed = (typ % 3) == 1

        def i8():
            self.f.seek(offset + pos[0])
            pos[0] += 1
            return self.f.read(1)[0]

        def i16():
            self.f.seek(offset + pos[0])
            pos[0] += 2
            return struct.unpack("<h", self.f.read(2))[0]

        def i32():
            self.f.seek(offset + pos[0])
            pos[0] += 4
            return struct.unpack("<i", self.f.read(4))[0]

        def icoord(base=None):
            if compressed:
                cx, cy = base if base is not None else center
                return cx + i16(), cy + i16()
            return i32(), i32()

        del buf

        if typ in _SYMBOLS:
            if typ in (0x28, 0x29):       # font symbol (ReadObj :1253)
                i8()                       # symbol id
                i8()                       # point size
                i16()                      # font style
                for _ in range(6):
                    i8()                   # fg rgb + 3 unknown
                i16()                      # angle
                x, y = icoord()
                i8()                       # font id
            elif typ in (0x2B, 0x2C):     # custom symbol (:1327)
                i8()                       # unknown
                i8()                       # custom style
                x, y = icoord()
                i8()                       # symbol id
                i8()                       # font id
            else:
                x, y = icoord()
                i8()
            X, Y = self.int2coord(x, y)
            return f"POINT ({fnum(X)} {fnum(Y)})"

        if typ in _LINES:
            x1, y1 = icoord()
            x2, y2 = icoord()
            X1, Y1 = self.int2coord(x1, y1)
            X2, Y2 = self.int2coord(x2, y2)
            return (f"LINESTRING ({fnum(X1)} {fnum(Y1)}, "
                    f"{fnum(X2)} {fnum(Y2)})")

        if typ in _PLINES:
            ptr = i32()
            size = i32() & 0x7FFFFFFF
            n = size // (4 if compressed else 8)
            if compressed:
                i16(), i16()               # label point
                corg = (i32(), i32())
            else:
                i32(), i32()
                corg = None
            pts = self._coords(ptr, n, compressed, corg)
            return "LINESTRING (" + self._pts(pts) + ")"

        if typ in _MULTIPLINES or typ in _REGIONS:
            ptr = i32()
            i32()                          # coord data size (w/ smooth)
            nsec = i16()
            if compressed:
                i16(), i16()
                corg = (i32(), i32())
            else:
                i32(), i32()
                corg = None
            v450 = typ in _V450
            secs = self._sections(ptr, nsec, compressed, corg, v450)
            if typ in _REGIONS:
                rings = []
                for pts in secs:
                    if pts and pts[0] != pts[-1]:
                        pts.append(pts[0])   # TABCloseRing
                    rings.append(pts)
                return "POLYGON (" + ", ".join(
                    "(" + self._pts(r) + ")" for r in rings) + ")"
            if len(secs) == 1:
                return "LINESTRING (" + self._pts(secs[0]) + ")"
            return "MULTILINESTRING (" + ", ".join(
                "(" + self._pts(s) + ")" for s in secs) + ")"

        if typ in _RECTS or typ in _ROUNDRECTS or typ in _ELLIPSES:
            rw = rh = 0
            if typ in _ROUNDRECTS:
                rw = i16() if compressed else i32()
                rh = i16() if compressed else i32()
            x1, y1 = icoord()
            x2, y2 = icoord()
            X1, Y1 = self.int2coord(min(x1, x2), min(y1, y2))
            X2, Y2 = self.int2coord(max(x1, x2), max(y1, y2))
            xmin, xmax = min(X1, X2), max(X1, X2)
            ymin, ymax = min(Y1, Y2), max(Y1, Y2)
            if typ in _ELLIPSES:
                cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
                rx, ry = (xmax - xmin) / 2, (ymax - ymin) / 2
                pts = _arc(180, cx, cy, rx, ry, 0.0, 2 * math.pi)
                _close(pts)
                return "POLYGON ((" + self._pts(pts) + "))"
            if typ in _ROUNDRECTS and rw != 0 and rh != 0:
                # corner radii are stored in int units; /2 like the
                # reference (width is the full axis)
                dxr = min(rw / self.xscale / 2.0,
                          (xmax - xmin) / 2.0)
                dyr = min(rh / self.yscale / 2.0,
                          (ymax - ymin) / 2.0)
                pts = []
                pts += _arc(45, xmin + dxr, ymin + dyr, dxr, dyr,
                            math.pi, 3 * math.pi / 2)
                pts += _arc(45, xmax - dxr, ymin + dyr, dxr, dyr,
                            3 * math.pi / 2, 2 * math.pi)
                pts += _arc(45, xmax - dxr, ymax - dyr, dxr, dyr,
                            0.0, math.pi / 2)
                pts += _arc(45, xmin + dxr, ymax - dyr, dxr, dyr,
                            math.pi / 2, math.pi)
                _close(pts)
                return "POLYGON ((" + self._pts(pts) + "))"
            pts = [(xmin, ymin), (xmax, ymin), (xmax, ymax),
                   (xmin, ymax), (xmin, ymin)]
            return "POLYGON ((" + self._pts(pts) + "))"

        if typ in _ARCS:
            a0 = i16() / 10.0
            a1 = i16() / 10.0
            ex1, ey1 = icoord()
            ex2, ey2 = icoord()
            X1, Y1 = self.int2coord(ex1, ey1)
            X2, Y2 = self.int2coord(ex2, ey2)
            cx, cy = (X1 + X2) / 2, (Y1 + Y2) / 2
            rx, ry = abs(X2 - X1) / 2, abs(Y2 - Y1) / 2
            if a1 < a0:
                n = max(2, int(abs((a1 + 360) - a0) / 2) + 1)
            else:
                n = max(2, int(abs(a1 - a0) / 2) + 1)
            pts = _arc(n, cx, cy, rx, ry,
                       math.radians(a0), math.radians(a1))
            return "LINESTRING (" + self._pts(pts) + ")"

        if typ in _TEXTS:
            i32()                           # string ptr
            i16()                           # string length
            i16()                           # alignment
            angle = i16() / 10.0
            i16()                           # font style
            for _ in range(6):
                i8()                        # fg/bg rgb
            icoord()                        # label line end
            nh = i16() if compressed else i32()
            i8()                            # font id
            x1, y1 = icoord()
            x2, y2 = icoord()
            X1, Y1 = self.int2coord(x1, y1)
            X2, Y2 = self.int2coord(x2, y2)
            xmin, xmax = min(X1, X2), max(X1, X2)
            ymin, ymax = min(Y1, Y2), max(Y1, Y2)
            # anchor = lower-left before rotation (TABText::Read
            # GeometryFromMAPFile :~3000: quadrant-of-angle cases)
            height = nh / self.yscale
            dsin, dcos = math.sin(math.radians(angle)), \
                math.cos(math.radians(angle))
            if dsin > 0.0 and dcos > 0.0:
                ax, ay = xmin + height * dsin, ymin
            elif dsin > 0.0 and dcos < 0.0:
                ax, ay = xmax, ymin - height * dcos
            elif dsin < 0.0 and dcos < 0.0:
                ax, ay = xmax + height * dsin, ymax
            else:
                ax, ay = xmin, ymax - height * dcos
            return f"POINT ({fnum(ax)} {fnum(ay)})"

        if typ in _MULTIPOINTS:
            ptr = i32()
            n = i32()
            i32(), i32(), i32()
            i8(), i8(), i8()
            i8()                            # symbol id
            i8()
            if compressed:
                i16(), i16()
                corg = (i32(), i32())
            else:
                i32(), i32()
                corg = None
            pts = self._coords(ptr, n, compressed, corg)
            return "MULTIPOINT (" + self._pts(pts) + ")"

        if typ in _COLLECTIONS:
            ptr = i32()
            npts = i32()
            reg_size = i32()
            pl_size = i32()
            nreg = i16()
            npl = i16()
            # corrected data sizes (mitab_mapobjectblock.cpp :1884)
            reg_size -= 2 * nreg
            pl_size -= 2 * npl
            for _ in range(3):
                i32()                       # all zeros
            for _ in range(3):
                i8()
            i8()                            # multipoint symbol id
            i8()                            # unknown
            i8(), i8(), i8()                # region/pline pen, brush
            if compressed:
                corg = (i32(), i32())
            else:
                corg = None
            # each part in the coord block: ReadLabelAndMBR mini
            # header (label + MBR: 12 B compressed / 24 B plain),
            # then V450-style section headers (collections are V650)
            mini = 12 if compressed else 24
            parts = []
            at = ptr
            if nreg:
                secs = self._sections(at + mini, nreg, compressed,
                                      corg, True)
                rings = []
                for pts in secs:
                    if pts and pts[0] != pts[-1]:
                        pts.append(pts[0])
                    rings.append(pts)
                parts.append("POLYGON (" + ", ".join(
                    "(" + self._pts(r) + ")" for r in rings) + ")")
                at += mini + reg_size
            if npl:
                secs = self._sections(at + mini, npl, compressed,
                                      corg, True)
                if len(secs) == 1:
                    parts.append(
                        "LINESTRING (" + self._pts(secs[0]) + ")")
                else:
                    parts.append("MULTILINESTRING (" + ", ".join(
                        "(" + self._pts(s) + ")" for s in secs) + ")")
                at += mini + pl_size
            if npts:
                pts = self._coords(at + mini, npts, compressed, corg)
                parts.append("MULTIPOINT (" + self._pts(pts) + ")")
            return "GEOMETRYCOLLECTION (" + ", ".join(parts) + ")"

        return None

    # -- helpers ------------------------------------------------------
    def _coords(self, ptr, n, compressed, corg):
        raw = self.coord_stream(ptr, n * (4 if compressed else 8))
        if compressed:
            a = np.frombuffer(raw, "<i2").astype(np.int64).reshape(-1, 2)
            a[:, 0] += corg[0]
            a[:, 1] += corg[1]
        else:
            a = np.frombuffer(raw, "<i4").astype(np.int64).reshape(-1, 2)
        return [self.int2coord(int(x), int(y)) for x, y in a]

    def _sections(self, ptr, nsec, compressed, corg, v450):
        """ReadCoordSecHdrs: V300 16/24-byte vs V450+ 20/28-byte
        section headers (int32 numVertices + 2 alignment bytes)."""
        # actual on-disk sizes: V300 = i16 nv (16/24 B); V450+ =
        # i32 nv (18/26 B — the "+2 alignment" exists only in the
        # reference's uncompressed offset bookkeeping, not on disk)
        hdr_sz = (18 if v450 else 16) if compressed else \
            (26 if v450 else 24)
        raw = self.coord_stream(ptr, nsec * hdr_sz)
        counts = []
        for i in range(nsec):
            base = i * hdr_sz
            if v450:
                nv, = struct.unpack_from("<i", raw, base)
            else:
                nv, = struct.unpack_from("<h", raw, base)
            counts.append(nv)
        secs = []
        at = ptr + nsec * hdr_sz
        for nv in counts:
            secs.append(self._coords(at, nv, compressed, corg))
            at += nv * (4 if compressed else 8)
        return secs

    @staticmethod
    def _pts(pts):
        return ", ".join(f"{fnum(x)} {fnum(y)}" for x, y in pts)


def _arc(n, cx, cy, rx, ry, a0, a1):
    """TABGenerateArc: n points + the closing end-angle point."""
    if a1 < a0:
        a1 += 2 * math.pi
    step = (a1 - a0) / (n - 1.0)
    pts = []
    a = a0
    for i in range(n):
        a = a0 + i * step
        pts.append((cx + rx * math.cos(a), cy + ry * math.sin(a)))
    pts.append((cx + rx * math.cos(a), cy + ry * math.sin(a)))
    return pts


def _close(pts):
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])


# --------------------------------------------------------------- .dat


def read_dat_header(path: str):
    with open(path, "rb") as f:
        h = f.read(32)
        nrec, = struct.unpack("<i", h[4:8])
        first, recsz = struct.unpack("<2h", h[8:12])
        nfields = first // 32 - 1
        descs = []
        for i in range(nfields):
            d = f.read(32)
            name = d[:11].split(b"\0")[0].decode("latin-1")
            ctype = chr(d[11])
            length = d[16]
            descs.append((name, ctype, length))
    return nrec, first, recsz, descs


def _decode_field(raw: bytes, tab_type: str):
    t = tab_type.lower()
    if t == "integer":
        return int(struct.unpack("<i", raw)[0])
    if t == "smallint":
        return int(struct.unpack("<h", raw)[0])
    if t == "float":
        return float(struct.unpack("<d", raw)[0])
    if t == "logical":
        return raw[:1] in (b"T", b"t", b"1")
    if t == "date":
        y, = struct.unpack("<H", raw[0:2])
        return f"{y:04d}-{raw[2]:02d}-{raw[3]:02d}" if y else None
    s = raw.decode("latin-1").rstrip("\0 ").strip()
    if t == "decimal":
        return float(s) if s else None
    return s


# --------------------------------------------------------------- scan


def read_tab(spark: SparkSession, path: str) -> DataFrame:
    """Distributed TAB read → (fid, attributes..., geom_wkt)."""
    base = os.path.splitext(path)[0]

    def sib(ext):
        for cand in (base + ext, base + ext.upper()):
            if os.path.exists(cand):
                return cand
        return base + ext

    meta = parse_tab_text(path)
    dat_path, map_path, id_path = sib(".dat"), sib(".map"), sib(".id")
    nrec, first, recsz, descs = read_dat_header(dat_path)
    has_map = os.path.exists(map_path) and os.path.exists(id_path)

    fields = meta["fields"]
    if not fields:
        fields = [(n, {"C": "char", "N": "decimal",
                       "L": "logical"}.get(c, "char"), [ln])
                  for n, c, ln in descs]

    # byte layout of each record
    offs = []
    pos = 0
    for (name, typ, width), (dn, dc, dl) in zip(fields, descs):
        size = _TAB_TYPES.get(typ, ("char", None))[1] or dl
        offs.append((name, typ, pos, size))
        pos += size

    spark_fields = [T.StructField("fid", T.LongType())]
    for name, typ, _, _ in offs:
        st = {"integer": T.IntegerType(), "smallint": T.IntegerType(),
              "float": T.DoubleType(), "decimal": T.DoubleType(),
              "logical": T.BooleanType()}.get(typ, T.StringType())
        spark_fields.append(T.StructField(name, st))
    spark_fields.append(T.StructField("geom_wkt", T.StringType()))
    schema = T.StructType(spark_fields)

    npart = max(1, min(64, nrec // 1024 + 1))
    bounds = spark.createDataFrame(
        [(i * nrec // npart + 1, (i + 1) * nrec // npart)
         for i in range(npart)], "lo long, hi long")

    def scan(batches):
        for pdf in batches:
            out = []
            mf = MapFile(map_path) if has_map else None
            idbuf = open(id_path, "rb").read() if has_map else b""
            with open(dat_path, "rb") as df_:
                fd = df_.fileno()
                for r in pdf.itertuples(index=False):
                    for fid in range(int(r.lo), int(r.hi) + 1):
                        rec = os.pread(fd, recsz,
                                       first + (fid - 1) * recsz)
                        # leading byte: ' ' active, '*' deleted
                        # (mitab_datfile.cpp GetRecordBlock :516-524)
                        deleted = rec[:1] != b" "
                        row = {"fid": fid}
                        for name, typ, p, size in offs:
                            row[name] = None if deleted else \
                                _decode_field(rec[1 + p:1 + p + size],
                                              typ)
                        wkt = None
                        if mf is not None:
                            optr, = struct.unpack_from(
                                "<i", idbuf, (fid - 1) * 4)
                            if optr > 0:
                                wkt = mf.read_object(optr)
                        row["geom_wkt"] = wkt
                        out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in schema])

    return bounds.mapInPandas(scan, schema=schema)
