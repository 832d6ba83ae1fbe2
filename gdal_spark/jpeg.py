"""Baseline JPEG codec, pure numpy — the engine's second raster
image codec after the from-scratch PNG one (png.py).

Reference: gdal/frmts/jpeg/jpgdataset.cpp (the GDAL JPEG driver wraps
libjpeg; this module re-implements the ITU-T T.81 baseline process it
depends on), exercised by autotest/gdrivers/jpeg.py.  MBTiles/GPKG
tile pyramids in the wild are overwhelmingly JPEG
(mbtilesdataset.cpp:1740 reads the `format` metadata and dispatches);
until this module the engine errored on them.

Scope — ITU-T T.81 baseline sequential (SOF0), 8-bit:
  decode: grayscale or YCbCr, any sampling factors (4:4:4 / 4:2:2 /
          4:2:0 ...), multiple DQT/DHT tables, restart intervals,
          0xFF00 stuffing.  Chroma upsampling is pixel replication
          (libjpeg's "fancy" triangular filter differs by <=1 LSB on
          smooth data; this codec is the engine's own reference).
  encode: grayscale or RGB->YCbCr, 4:4:4, Annex K quantization tables
          scaled libjpeg-style by `quality`, Annex K Huffman tables.
Progressive (SOF2), arithmetic coding, 12-bit and hierarchical modes
raise NotImplementedError with the marker that triggered it.

Everything is deterministic: decode(encode(x)) is a pure function of
(x, quality), which is what lets the lossy MBTiles-JPEG contract
query compare the distributed loop against a sequential oracle
bit-for-bit.

DCT: the exact orthonormal 8x8 DCT-II matrix, applied to all blocks
of a plane in one einsum — no per-block Python in the transform.
Only the entropy (Huffman) stage loops per block, mirroring the
bitstream's inherently serial structure.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------- constants
_ZZ = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)
_UNZZ = np.argsort(_ZZ)

# Annex K.1 / K.2 quantization tables (natural order).
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL).
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float -> (nby, nbx, 8, 8); H, W multiples of 8."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,...jk,lk->...il", _C, blocks, _C)


def _idct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ji,...jk,kl->...il", _C, blocks, _C)


# ------------------------------------------------------------ Huffman
def _build_enc_table(bits, vals):
    """{value: (code, length)} per T.81 C.2 canonical assignment."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_dec_table(bits, vals):
    """16-bit-peek LUT decoder table: (value[65536], length[65536]).
    Every canonical code of length L fills the 2^(16-L) entries that
    share its L-bit prefix — one array index replaces the bit-serial
    walk (length 0 marks an invalid prefix)."""
    lv = np.zeros(65536, np.int16)
    ll = np.zeros(65536, np.uint8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            span = 1 << (16 - ln)
            lv[base:base + span] = vals[k]
            ll[base:base + span] = ln
            code += 1
            k += 1
        code <<= 1
    return lv, ll


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at any
    other marker so the caller can handle RSTn.  Keeps a >=16-bit
    lookahead so Huffman decode is ONE LUT index; past the segment
    end the lookahead is virtual 1-padding (`navail` tracks how many
    real bits remain — consuming beyond them is an error)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.navail = 0
        self.marker = None

    def _fill(self):
        d = self.d
        if self.marker is None and self.pos < len(d):
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
            self.navail += 8
        else:
            self.acc = (self.acc << 8) | 0xFF  # virtual padding
            self.nbits += 8

    def _peek(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)

    def _consume(self, n: int):
        if n > self.navail:
            raise EOFError("read past entropy segment")
        self.navail -= n
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = self._peek(n)
        self._consume(n)
        return v

    def decode(self, table) -> int:
        lv, ll = table
        v = self._peek(16)
        ln = ll[v]
        if ln == 0:
            raise ValueError("invalid Huffman code")
        self._consume(int(ln))
        return int(lv[v])

    def align_and_expect_rst(self, n: int):
        """Consume the pending RSTn marker between restart intervals."""
        if self.marker is None:
            # lookahead may not have reached it yet — scan forward
            while self.marker is None:
                self._fill()
                if self.navail > 16 * 8:
                    raise ValueError("expected RST marker")
        m = self.marker
        if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != (n & 7):
            raise ValueError(f"bad restart marker 0x{m:02x}")
        self.marker = None
        self.acc = 0
        self.nbits = 0
        self.navail = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


# ------------------------------------------------------------- encode
def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled the libjpeg way (jcparam.c
    jpeg_quality_scaling): q<50 -> 5000/q, else 200-2q, clamp 1..255."""
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * s + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * s + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _encode_plane_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 -> (nblocks, 64) int32 quantized zigzag coeffs."""
    f = _blockify(plane.astype(np.float64) - 128.0)
    coef = _fdct(f)
    qm = q.reshape(8, 8).astype(np.float64)
    qz = np.round(coef / qm).astype(np.int32)
    flat = qz.reshape(-1, 64)
    return flat[:, _ZZ]


def _huff_block(w: _BitWriter, zz: np.ndarray, pred: int,
                dc_tab, ac_tab) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    w.put(code, ln)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_tab[(run << 4) | t]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.put(code, ln)
    return dc


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(img: np.ndarray, quality: int = 75,
                restart: int = 0) -> bytes:
    """Baseline JFIF encode: (H, W) or (H, W, 1) grayscale, or
    (H, W, 3) RGB (converted to YCbCr), uint8, 4:4:4 sampling.

    `restart` > 0 emits DRI + RSTn markers every `restart` MCUs —
    each interval is an independently decodable bitstream span (DC
    predictors reset), which is what makes a huge JPEG splittable
    for parallel decode."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    gray = img.ndim == 2
    ql, qc = quant_tables(quality)

    if gray:
        planes = [_pad_to_8(img)]
        qids = [0]
        qtabs = [ql]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [_pad_to_8(np.clip(p, 0, 255)) for p in (y, cb, cr)]
        qids = [0, 1, 1]
        qtabs = [ql, qc]

    enc_dc = [_build_enc_table(*_DC_L), _build_enc_table(*_DC_C)]
    enc_ac = [_build_enc_table(*_AC_L), _build_enc_table(*_AC_C)]

    out = bytearray()
    out += b"\xff\xd8"                                   # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qtabs):
        out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big")
        out += bytes([tid]) + bytes(int(q[z]) for z in _ZZ)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big")
    out += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, qids[ci]])           # 4:4:4
    specs = [(0x00, _DC_L), (0x10, _AC_L)]
    if not gray:
        specs += [(0x01, _DC_C), (0x11, _AC_C)]
    for tid, (bits, vals) in specs:
        out += b"\xff\xc4" + (2 + 1 + 16 + len(vals)).to_bytes(2, "big")
        out += bytes([tid]) + bytes(bits) + bytes(vals)
    if restart:
        out += b"\xff\xdd\x00\x04" + int(restart).to_bytes(2, "big")
    out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big")
    out += bytes([ncomp])
    for ci in range(ncomp):
        td = 0 if ci == 0 else 1
        out += bytes([ci + 1, (td << 4) | td])
    out += bytes([0, 63, 0])

    coeffs = [_encode_plane_coeffs(p, qtabs[qids[ci]])
              for ci, p in enumerate(planes)]
    nbx = planes[0].shape[1] // 8
    nby = planes[0].shape[0] // 8
    wtr = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    nrst = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart and mcu and mcu % restart == 0:
                wtr.flush()
                out += wtr.buf
                out += bytes([0xFF, 0xD0 + (nrst & 7)])
                nrst += 1
                wtr = _BitWriter()
                pred = [0] * ncomp
            i = by * nbx + bx
            for ci in range(ncomp):
                hid = 0 if ci == 0 else 1
                pred[ci] = _huff_block(wtr, coeffs[ci][i], pred[ci],
                                       enc_dc[hid], enc_ac[hid])
            mcu += 1
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


# ------------------------------------------------------------- decode
def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline decode -> (H, W) uint8 grayscale or (H, W, 3) RGB."""
    d = buf
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict] = {}
    comps = None
    hdim = None
    restart = 0
    while True:
        while d[pos] != 0xFF:
            pos += 1
        m = d[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            raise ValueError("EOI before scan data")
        ln = int.from_bytes(d[pos:pos + 2], "big")
        seg = d[pos + 2:pos + ln]
        if m == 0xDB:                                    # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p:p + 128],
                                        dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p:p + 64],
                                        dtype=np.uint8).astype(np.int32)
                    p += 64
                nat = np.empty(64, np.int32)
                nat[_ZZ] = tab
                qt[tq] = nat
        elif m == 0xC4:                                  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                hts[(tc, th)] = _build_dec_table(bits, vals)
                p += 17 + nv
        elif m == 0xC0 or m == 0xC1:                     # SOF0/1
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            hgt = int.from_bytes(seg[1:3], "big")
            wid = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            hdim = (hgt, wid)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{m - 0xC0} (only baseline SOF0/1)")
        elif m == 0xDD:                                  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:                                  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            pos += ln
            return _decode_scan(d, pos, comps, hdim, qt, hts, scan,
                                restart)
        pos += ln


def _decode_scan(d, pos, comps, hdim, qt, hts, scan, restart):
    hgt, wid = hdim
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-wid // (8 * hmax))
    mcuy = -(-hgt // (8 * vmax))
    order = []
    for cs, td, ta in scan:
        ci = next(i for i, c in enumerate(comps) if c["id"] == cs)
        order.append((ci, td, ta))

    for c in comps:
        c["nbx"] = mcux * c["h"]
        c["nby"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["nby"] * c["nbx"], 64), np.int32)

    rdr = _BitReader(d, pos)
    pred = [0] * len(comps)
    nrst = 0
    mcu = 0
    total = mcux * mcuy
    while mcu < total:
        if restart and mcu and mcu % restart == 0:
            rdr.align_and_expect_rst(nrst)
            nrst += 1
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, td, ta in order:
            c = comps[ci]
            dctab, actab = hts[(0, td)], hts[(1, ta)]
            for v in range(c["v"]):
                for hcell in range(c["h"]):
                    zz = np.zeros(64, np.int32)
                    t = rdr.decode(dctab)
                    diff = _extend(rdr.bits(t), t) if t else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = rdr.decode(actab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        zz[k] = _extend(rdr.bits(s), s)
                        k += 1
                    by = my * c["v"] + v
                    bx = mx * c["h"] + hcell
                    c["coef"][by * c["nbx"] + bx] = zz
        mcu += 1

    planes = []
    for c in comps:
        q = qt[c["tq"]]
        nat = np.empty_like(c["coef"])
        nat[:, _ZZ] = c["coef"]
        blocks = (nat.astype(np.float64) * q).reshape(-1, 8, 8)
        px = _idct(blocks) + 128.0
        grid = px.reshape(c["nby"], c["nbx"], 8, 8)
        plane = _unblockify(grid)
        # component resolution -> full resolution (pixel replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:hgt, :wid])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(
            f"{len(planes)}-component JPEG (CMYK/YCCK not supported)")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(blob: bytes) -> np.ndarray:
    """Magic-byte dispatch over the engine's image codecs — the GPKG
    tile contract (gpkg spec: each tile blob self-describes; GDAL's
    gpkgdataset sniffs the signature per tile, so a pyramid may mix
    PNG and JPEG)."""
    if blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png
        return decode_png(blob)
    raise NotImplementedError(
        f"unrecognized tile blob signature {blob[:4]!r} "
        "(png and baseline jpeg decode here; webp is injectable)")
