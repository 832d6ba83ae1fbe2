"""Pure-stdlib PNG codec (zlib + numpy) — no PIL/libpng.

The reference's GeoPackage raster driver stores tiles as PNG/JPEG
blobs (gdal/ogr/ogrsf_frmts/gpkg/ogrgeopackagedataset.cpp, tile
encode/decode via the PNG driver gdal/frmts/png/pngdataset.cpp).
This module re-implements the subset the tile pipeline needs as a
from-scratch RFC 2083 codec so executors can decode/encode tile
blobs without any native imaging library:

- decode: 8/16-bit greyscale (colour type 0), truecolour (2),
  palette (3, bit depth 1/2/4/8 with PLTE + optional tRNS),
  grey+alpha (4), RGBA (6); all five scanline filters (None/Sub/
  Up/Average/Paeth, unfiltered vectorised per row); non-interlaced
  only (Adam7 raises — GDAL itself never writes interlaced tiles).
- encode: filter-0 scanlines + one zlib stream, greyscale/RGB/RGBA
  8- or 16-bit — byte-valid PNG accepted by any reader.

Decode returns (H, W) or (H, W, C) numpy arrays; encode takes the
same. Used by the GeoPackage tile reader/writer (gpkg.py) and as a
REAL (non-injected) codec for the multimodal thumbnail pipeline
(functions/multimodal.py) when media blobs are PNG.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by colour type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + crc
        if ctype == b"IEND":
            break


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters. raw is (h, 1+stride) uint8 rows
    (filter byte + data). Returns (h, stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if ft == 0:  # None
            cur = row
        elif ft == 1:  # Sub — sequential along x, strided by bpp
            cur = row
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ft == 2:  # Up — fully vectorised
            cur = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            cur = row
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = out[y]
    return out


def _unpack_bits(row_bytes: np.ndarray, depth: int, w: int) -> np.ndarray:
    """Unpack sub-byte samples (depth 1/2/4) to one sample per entry."""
    if depth == 8:
        return row_bytes[:, :w]
    h = row_bytes.shape[0]
    bits = np.unpackbits(row_bytes, axis=1)
    if depth == 1:
        return bits[:, :w]
    groups = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :w]


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG blob -> numpy array (H,W) or (H,W,C), dtype
    uint8 or uint16 (big-endian 16-bit converted to native)."""
    w = h = depth = ctype = interlace = None
    idat = []
    plte = None
    trns = None
    for name, data in _chunks(buf):
        if name == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif name == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif name == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif name == b"IDAT":
            idat.append(data)
    if w is None:
        raise ValueError("PNG missing IHDR")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG colour type {ctype}")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))

    bits_pp = depth * ch
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    arr = np.frombuffer(raw, dtype=np.uint8)
    if arr.size != h * (stride + 1):
        raise ValueError(
            f"PNG payload size {arr.size} != {h}x(1+{stride})"
        )
    flat = _unfilter(arr.reshape(h, stride + 1), h, stride, bpp)

    if ctype == 3:  # palette
        idx = _unpack_bits(flat, depth, w)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if trns is not None:
            alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
            alpha[: trns.size] = trns
            rgba = np.concatenate([plte, alpha[:, None]], axis=1)
            return rgba[idx]
        return plte[idx]
    if depth < 8:  # sub-byte greyscale
        g = _unpack_bits(flat, depth, w)
        scale = 255 // ((1 << depth) - 1)
        return (g * scale).astype(np.uint8)
    if depth == 8:
        img = flat.reshape(h, stride)[:, : w * ch]
        img = img.reshape(h, w, ch) if ch > 1 else img.reshape(h, w)
        return img
    if depth == 16:
        img = flat.reshape(h, -1).view(">u2").astype(np.uint16)
        img = img[:, : w * ch]
        return img.reshape(h, w, ch) if ch > 1 else img.reshape(h, w)
    raise ValueError(f"unsupported PNG bit depth {depth}")


def _chunk(name: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + name
        + data
        + struct.pack(">I", zlib.crc32(name + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode (H,W) or (H,W,C in {1,2,3,4}) uint8/uint16 -> PNG bytes
    (filter 0 scanlines; greyscale / grey+alpha / RGB / RGBA)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if img.dtype == np.uint16:
        depth = 16
        payload = img.astype(">u2").tobytes()
        stride = w * ch * 2
    else:
        depth = 8
        payload = np.ascontiguousarray(img, dtype=np.uint8).tobytes()
        stride = w * ch
    rows = np.frombuffer(payload, dtype=np.uint8).reshape(h, stride)
    filtered = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rows], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered, level))
        + _chunk(b"IEND", b"")
    )
