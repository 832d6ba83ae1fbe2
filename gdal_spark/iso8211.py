"""ISO/IEC 8211 (DDF) record codec — the container under S-57 ENC
and SDTS.

Reference: gdal/frmts/iso8211/ —
  - ddfmodule.cpp: 24-byte leader (record length :5, leader id @6,
    field-area base address 12:17, entry map sizes @20/21/23),
    then the directory of (tag, length, position) entries ending
    at the 0x1E field terminator; the DDR (leader id 'L') defines
    every field.
  - ddffielddefn.cpp: DDR field = field controls (structure code,
    type code) + name 0x1F subfield-label list ('!'-separated,
    leading '*' marks the repeating group) 0x1F format controls
    ('(A(2),I(10),3b12,...)' with repeat counts).
  - ddfsubfielddefn.cpp: format letters — A/C text (fixed width or
    0x1F-terminated), I integer, R real, S, b11/b12/b14 unsigned
    LE ints, b21/b24 signed LE ints, B(n) fixed-width bitfield.
  - ddfrecord.cpp: data records reuse the DDR directory semantics;
    leader id 'R' means "reuse previous leader" (not used by S-57
    base cells).
"""

from __future__ import annotations

import struct

FT = 0x1E        # field terminator
UT = 0x1F        # unit terminator


def _expand_formats(fmt: str) -> list[str]:
    """'(A(2),I(10),3b12)' → ['A(2)', 'I(10)', 'b12', 'b12', 'b12'];
    nested parens group repeated sequences."""
    fmt = fmt.strip()
    if fmt.startswith("(") and fmt.endswith(")"):
        fmt = fmt[1:-1]
    out = []
    i = 0
    n = len(fmt)
    while i < n:
        # repeat count
        rep = 0
        while i < n and fmt[i].isdigit():
            rep = rep * 10 + int(fmt[i])
            i += 1
        rep = rep or 1
        if i >= n:
            break
        if fmt[i] == "(":
            depth = 1
            j = i + 1
            while j < n and depth:
                if fmt[j] == "(":
                    depth += 1
                elif fmt[j] == ")":
                    depth -= 1
                j += 1
            inner = _expand_formats(fmt[i:j])
            out.extend(inner * rep)
            i = j
        else:
            j = i + 1
            # letter + optional width spec
            while j < n and fmt[j] not in ",()":
                j += 1
            if j < n and fmt[j] == "(":
                depth = 1
                j += 1
                while j < n and depth:
                    if fmt[j] == "(":
                        depth += 1
                    elif fmt[j] == ")":
                        depth -= 1
                    j += 1
            out.extend([fmt[i:j]] * rep)
            i = j
        while i < n and fmt[i] == ",":
            i += 1
    return out


class FieldDefn:
    def __init__(self, tag: str, raw: bytes, fc_len: int = 9):
        self.tag = tag
        self.struct_code = chr(raw[0]) if raw else "0"
        self.type_code = chr(raw[1]) if len(raw) > 1 else "0"
        parts = raw.split(bytes([UT]))
        # parts[0] = fixed field controls + field name; the controls
        # length comes from the DDR leader (9 for S-57, 6 for SDTS)
        self.name = parts[0][fc_len:].decode("latin-1",
                                             errors="replace") \
            if len(parts[0]) > fc_len else ""
        labels = parts[1].decode("latin-1") if len(parts) > 1 else ""
        fmts = parts[2].decode("latin-1").rstrip("\x1e") \
            if len(parts) > 2 else ""
        self.repeating = labels.startswith("*")
        self.labels = [s for s in labels.lstrip("*").split("!") if s]
        self.formats = _expand_formats(fmts) if fmts else []

    def decode(self, data: bytes):
        """→ list of {label: value} groups (one for non-repeating)."""
        if data.endswith(bytes([FT])):
            data = data[:-1]
        if not self.labels:                 # elementary field
            return [{"": _decode_sub(
                self.formats[0] if self.formats else "A",
                data, [0])}]
        groups = []
        pos = [0]
        while True:
            g = {}
            for lab, f in zip(self.labels, self.formats):
                g[lab] = _decode_sub(f, data, pos)
            groups.append(g)
            if not self.repeating or pos[0] >= len(data):
                break
        return groups


def _decode_sub(fmt: str, data: bytes, pos: list[int]):
    p = pos[0]
    kind = fmt[0]
    width = None
    if "(" in fmt:
        w = fmt[fmt.index("(") + 1:fmt.rindex(")")]
        if w.isdigit():
            width = int(w)
    if kind == "b":
        sub = fmt[1:3]
        if sub == "11":
            v = data[p]
            pos[0] = p + 1
        elif sub == "12":
            v = struct.unpack_from("<H", data, p)[0]
            pos[0] = p + 2
        elif sub == "14":
            v = struct.unpack_from("<I", data, p)[0]
            pos[0] = p + 4
        elif sub == "21":
            v = struct.unpack_from("<b", data, p)[0]
            pos[0] = p + 1
        elif sub == "22":
            v = struct.unpack_from("<h", data, p)[0]
            pos[0] = p + 2
        elif sub == "24":
            v = struct.unpack_from("<i", data, p)[0]
            pos[0] = p + 4
        else:
            raise ValueError(f"iso8211: binary format {fmt}")
        return v
    if kind == "B":
        nbytes = (width or 8) // 8
        v = data[p:p + nbytes]
        pos[0] = p + nbytes
        return v
    # text-ish: fixed width or UT/FT-terminated
    if width:
        raw = data[p:p + width]
        pos[0] = p + width
    else:
        end = p
        while end < len(data) and data[end] not in (UT, FT):
            end += 1
        raw = data[p:end]
        pos[0] = min(end + 1, len(data))
    s = raw.decode("latin-1")
    if kind == "I":
        s = s.strip()
        return int(s) if s and s.strip("-").isdigit() else 0
    if kind == "R":
        s = s.strip()
        try:
            return float(s)
        except ValueError:
            return 0.0
    return s


class ISO8211Reader:
    """Sequential module reader: DDR first, then data records as
    {tag: [group, ...]} dicts (repeated tags append)."""

    def __init__(self, path: str):
        self.path = path
        self.defs: dict[str, FieldDefn] = {}
        with open(path, "rb") as f:
            self._data = f.read()
        self._pos = 0
        self._read_ddr()
        self._ddr_end = self._pos

    def _leader(self, buf: bytes):
        reclen = int(buf[0:5])
        base = int(buf[12:17])
        szlen = int(chr(buf[20]))
        szpos = int(chr(buf[21]))
        sztag = int(chr(buf[23]))
        return reclen, base, szlen, szpos, sztag

    def _read_record_raw(self):
        data = self._data
        if getattr(self, "_reuse", None) is not None:
            # leader id 'R': every following record is the data
            # area only, reusing the previous directory
            # (ddfrecord.cpp ReadHeader nReuseHeader path)
            entries, datalen = self._reuse
            if self._pos + datalen > len(data):
                return None
            rec = data[self._pos:self._pos + datalen]
            self._pos += datalen
            return [(tag, rec[off:off + ln])
                    for tag, ln, off in entries]
        if self._pos + 24 > len(data):
            return None
        buf = data[self._pos:]
        try:
            reclen, base, szlen, szpos, sztag = self._leader(buf)
        except ValueError:
            return None
        rec = buf[:reclen]
        self._pos += reclen
        # directory
        entries = []
        p = 24
        entry_sz = sztag + szlen + szpos
        while p + entry_sz <= base - 1 and rec[p] != FT:
            tag = rec[p:p + sztag].decode("latin-1")
            ln = int(rec[p + sztag:p + sztag + szlen])
            off = int(rec[p + sztag + szlen:p + entry_sz])
            entries.append((tag, ln, off))
            p += entry_sz
        if chr(buf[6]) == "R" and entries:
            # record length covers this record; subsequent ones are
            # bare data areas of the same shape
            self._reuse = ([(t, ln, off) for t, ln, off in entries],
                           reclen - base)
        return [(tag, rec[base + off:base + off + ln])
                for tag, ln, off in entries]

    def _read_ddr(self):
        # field control length from the DDR leader (bytes 10-11)
        try:
            fc_len = int(self._data[10:12]) or 9
        except ValueError:
            fc_len = 9
        self.fc_len = fc_len
        fields = self._read_record_raw()
        if fields is None:
            raise ValueError(f"iso8211: empty module {self.path}")
        for tag, raw in fields:
            if tag == "0000" or tag.strip("0") == "":
                continue
            self.defs[tag] = FieldDefn(tag, raw, fc_len)

    def records(self):
        while True:
            fields = self._read_record_raw()
            if fields is None:
                return
            rec: dict[str, list] = {}
            for tag, raw in fields:
                d = self.defs.get(tag)
                if d is None:
                    continue
                rec.setdefault(tag, []).extend(d.decode(raw))
            yield rec

    def records_raw(self):
        """Yield [(tag, raw bytes)] per record — for bulk numeric
        fields (e.g. SDTS CVLS rows) that decode faster as arrays."""
        while True:
            fields = self._read_record_raw()
            if fields is None:
                return
            yield fields

    def record_offsets(self) -> list[int]:
        """Byte offsets of every data record (leader walk only) —
        the driver-side index for range-parallel record scans."""
        offs = []
        pos = self._ddr_end
        data = self._data
        reuse_len = None
        while pos < len(data):
            if reuse_len is not None:
                if pos + reuse_len > len(data):
                    break
                offs.append(pos)
                pos += reuse_len
                continue
            if pos + 24 > len(data):
                break
            try:
                reclen = int(data[pos:pos + 5])
                base = int(data[pos + 12:pos + 17])
            except ValueError:
                break
            if reclen < 24:
                break
            offs.append(pos)
            if chr(data[pos + 6]) == "R":
                reuse_len = reclen - base
                pos += reclen
            else:
                pos += reclen
        return offs
