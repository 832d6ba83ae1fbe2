"""WKT1 CRS import — the OGRSpatialReference::importFromWkt
counterpart (reference: ogr/ogrspatialreference.cpp importFromWkt +
ogr_srs_esri.cpp morphFromESRI).  A parsed ``PROJCS[...]`` string
registers a synthetic preset in ``crs.CONIC_PRESETS`` — the same
table the PROJ.4 importer fills — after which EVERY engine surface
dispatches on it: ``conic_forward/inverse`` Columns, the SQL oracle
templates, ``transform_points_np`` vertex arrays, and the
``crs_to_crs_*`` hub composition.

This closes the ``.prj`` sidecar path: shapefiles carry their CRS as
exactly this string, so ``read_shapefile`` + ``register_wkt`` +
``ogr2ogr(t_srs=...)`` reproduces ``ogr2ogr -t_srs`` on a directory
of real-world shapefiles without an EPSG lookup service.

The family mapping is DERIVED from ``srsinfo._FAMILIES`` — the same
table that renders exportToWkt — by inverting (WKT1 PROJECTION name,
PARAMETER keys) back to (family kind, preset keys).  Closure property
(tested): re-importing the engine's own ``wkt_strings()`` output
reproduces the original projection bit-for-bit at sample points for
every registered code.

ESRI morphing: ESRI ``.prj`` files spell some projections and
parameters differently (``Lambert_Conformal_Conic`` without the
``_2SP`` suffix, ``Stereographic_South_Pole``, ``Standard_Parallel_1``
for the polar ``lat_ts``); the alias tables below mirror
``ogr_srs_esri.cpp``'s rename lists for the supported families.

Driver-side only: parsing happens once at plan-build time; the
registered preset ships to executors as fold-time constants exactly
like every enumerated EPSG code.
"""

from __future__ import annotations

import re

from . import crs
from .proj4 import _ellipsoid_key, _synth_codes
from .srsinfo import _FAMILIES


class Node:
    __slots__ = ("kw", "vals")

    def __init__(self, kw: str, vals: list):
        self.kw = kw
        self.vals = vals

    def find(self, kw: str) -> "Node | None":
        for v in self.vals:
            if isinstance(v, Node) and v.kw.upper() == kw.upper():
                return v
        return None

    def findall(self, kw: str) -> list["Node"]:
        return [v for v in self.vals
                if isinstance(v, Node) and v.kw.upper() == kw.upper()]


_TOKEN = re.compile(r'''\s*(?:
    "((?:[^"]|"")*)"          # quoted string ("" escapes a quote)
  | ([A-Za-z_][A-Za-z0-9_]*)  # keyword
  | ([-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)  # number
  | ([\[\]\(\),])             # structure
)''', re.VERBOSE)


def parse_wkt(s: str) -> Node:
    """Tokenize + parse a WKT1 string into a Node tree.  Accepts both
    ``[]`` and ``()`` (the spec allows either), quoted-name escapes,
    and arbitrary nesting."""
    pos, n = 0, len(s)
    toks: list = []
    while pos < n:
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"WKT parse error at offset {pos}: "
                             f"{s[pos:pos + 20]!r}")
        pos = m.end()
        if m.group(1) is not None:
            toks.append(("str", m.group(1).replace('""', '"')))
        elif m.group(2) is not None:
            toks.append(("kw", m.group(2)))
        elif m.group(3) is not None:
            toks.append(("num", float(m.group(3))))
        else:
            toks.append(("punct", m.group(4)))

    def parse_node(i: int) -> tuple[Node, int]:
        kind, kw = toks[i]
        if kind != "kw":
            raise ValueError(f"expected keyword, got {toks[i]}")
        i += 1
        if i >= len(toks) or toks[i] != ("punct", "[") \
                and toks[i] != ("punct", "("):
            return Node(kw, []), i
        i += 1  # consume opener
        vals: list = []
        while True:
            kind2, v2 = toks[i]
            if kind2 == "punct" and v2 in "])":
                return Node(kw, vals), i + 1
            if kind2 == "punct" and v2 == ",":
                i += 1
                continue
            if kind2 == "kw":
                child, i = parse_node(i)
                vals.append(child)
            else:
                vals.append(v2)
                i += 1

    node, i = parse_node(0)
    return node


# ESRI PROJECTION-name renames (morphFromESRI, ogr_srs_esri.cpp)
_ESRI_PROJ = {
    "lambert_conformal_conic": "lambert_conformal_conic_2sp",
    "mercator": "mercator_1sp",
    "stereographic_north_pole": "polar_stereographic",
    "stereographic_south_pole": "polar_stereographic",
    "gauss_kruger": "transverse_mercator",
    "hotine_oblique_mercator_azimuth_natural_origin":
        "hotine_oblique_mercator_azimuth_center",
    "eckert_iv": "eckert_iv", "eckert_vi": "eckert_vi",
    "winkel_tripel": "winkel_tripel",
}

# ESRI PARAMETER renames per the same morph table
_ESRI_PARAM = {
    "standard_parallel_1": None,  # context-dependent (polar lat_ts)
    "longitude_of_origin": "central_meridian",
}


def _param_map(projcs: Node) -> dict[str, float]:
    out = {}
    for p in projcs.findall("PARAMETER"):
        out[str(p.vals[0]).lower()] = float(p.vals[1])
    return out


def _invert_family(proj_name: str, pmap: dict[str, float]):
    """(kind, preset params) by inverting srsinfo._FAMILIES: a
    candidate matches when every constant parameter the family would
    EMIT is either absent or equal in the WKT, and every preset key
    resolves.  Specialized aspects (polar constants) outscore the
    generic family; hemisphere suffixes are checked against the
    driving latitude."""
    name = proj_name.lower()
    name = _ESRI_PROJ.get(name, name)
    matches = []
    for kind, (_p4, wkt_proj, spec) in _FAMILIES.items():
        if wkt_proj.lower() != name:
            continue
        params: dict[str, float] = {}
        score, ok = 0, True
        for src, _p4k, wkk in spec:
            lk = wkk.lower() if wkk else None
            if isinstance(src, tuple):          # emitted constant
                if lk is None or lk not in pmap:
                    continue
                want = src[1]
                if isinstance(want, str) or \
                        abs(pmap[lk] - float(want)) > 1e-9:
                    ok = False
                    break
                score += 1
            else:                               # preset-backed value
                if lk is None:
                    ok = False
                    break
                if lk in pmap:
                    params[src] = pmap[lk]
                elif src in ("fe", "fn", "lon0", "phi0"):
                    params[src] = 0.0
                elif src in ("k0", "kc"):
                    params[src] = 1.0
                elif src == "gammac" and "alphac" in params:
                    params[src] = params["alphac"]  # PROJ default
                else:
                    ok = False
                    break
        if not ok:
            continue
        # hemisphere sanity for the aspect pairs that share a name
        lat = params.get("phi_f", params.get("phi0", None))
        if kind.endswith("_north") and lat is not None and lat < 0:
            continue
        if kind.endswith("_south") and lat is not None and lat > 0:
            continue
        matches.append((score, kind, params))
    if not matches:
        raise ValueError(f"unsupported PROJECTION[{proj_name!r}]")
    matches.sort(key=lambda t: -t[0])
    _, kind, params = matches[0]
    return kind, params


def _ellipsoid_of(geogcs: Node) -> str:
    datum = geogcs.find("DATUM")
    sph = datum.find("SPHEROID") if datum else None
    if sph is None:
        sph = datum.find("ELLIPSOID") if datum else None
    if sph is None:
        raise ValueError("WKT has no SPHEROID")
    a, rf = float(sph.vals[1]), float(sph.vals[2])
    p = {"a": a} if rf == 0.0 else {"a": a, "rf": rf}
    return _ellipsoid_key(p)


def register_wkt(s: str, code: int | None = None) -> int:
    """Parse a WKT1 CRS string and install it as a preset; returns the
    code usable with every crs.* dispatch surface.

    ``GEOGCS``-only strings resolve to 4326 when the spheroid is
    WGS84 (the ubiquitous shapefile ``.prj``); any other geographic
    CRS raises (no datum-shift chain from WKT yet).  ``PROJCS`` maps
    through the family inverter; EPSG:3857 is detected by name or
    AUTHORITY (GDAL needs the authority/EXTENSION node for it too —
    Mercator_1SP over the WGS84 ellipsoid is NOT sphere web-mercator).
    """
    root = parse_wkt(s)
    kw = root.kw.upper()
    if kw in ("GEOGCS", "GEOGCRS"):
        sph = root.find("DATUM").find("SPHEROID")
        if abs(float(sph.vals[1]) - 6378137.0) < 1e-6 and \
                abs(float(sph.vals[2]) - 298.257223563) < 1e-6:
            return 4326
        raise ValueError("only the WGS84 geographic CRS imports "
                         "without a projection")
    if kw != "PROJCS":
        raise ValueError(f"expected PROJCS, got {root.kw}")

    name = str(root.vals[0])
    auth = root.findall("AUTHORITY")
    auth_code = None
    for a in auth:
        if str(a.vals[0]).upper() == "EPSG":
            auth_code = int(float(str(a.vals[1])))
    pmap = _param_map(root)
    geogcs = root.find("GEOGCS")

    # web-mercator: sphere semantics despite the ellipsoidal GEOGCS
    if auth_code == 3857 or "pseudo-mercator" in name.lower():
        kind, params = "merc", dict(
            lon0=pmap.get("central_meridian", 0.0),
            k0=pmap.get("scale_factor", 1.0),
            fe=pmap.get("false_easting", 0.0),
            fn=pmap.get("false_northing", 0.0))
        ellps = _ellipsoid_key({"a": 6378137.0})
    else:
        proj = root.find("PROJECTION")
        if proj is None:
            raise ValueError("PROJCS without PROJECTION")
        # ESRI south-polar morph: Standard_Parallel_1 carries lat_ts
        pname = str(proj.vals[0]).lower()
        if pname in ("stereographic_south_pole",
                     "stereographic_north_pole") and \
                "standard_parallel_1" in pmap:
            pmap = dict(pmap)
            pmap["latitude_of_origin"] = pmap.pop("standard_parallel_1")
        for esri_k, ogc_k in _ESRI_PARAM.items():
            if ogc_k and esri_k in pmap and ogc_k not in pmap:
                pmap = dict(pmap)
                pmap[ogc_k] = pmap.pop(esri_k)
        if _ESRI_PROJ.get(pname, pname) == "mercator_1sp":
            # the registry holds k=1 mercs, but Mercator variant A
            # takes any scale (EPSG method 9804) — map it directly
            kind, params = "merc", dict(
                lon0=pmap.get("central_meridian", 0.0),
                k0=pmap.get("scale_factor", 1.0),
                fe=pmap.get("false_easting", 0.0),
                fn=pmap.get("false_northing", 0.0))
        else:
            kind, params = _invert_family(str(proj.vals[0]), pmap)
        ellps = _ellipsoid_of(geogcs)

    if code is None:
        code = next(_synth_codes)
    crs.CONIC_PRESETS[code] = (kind, ellps, params)
    return code


def register_srs_string(s: str) -> int:
    """Dispatch a user SRS string the way OSRSetFromUserInput does:
    WKT when it leads with PROJCS/GEOGCS, EPSG:NNNN codes, else a
    PROJ.4 parameter string (reference: ogr/ogrspatialreference.cpp
    SetFromUserInput)."""
    t = s.lstrip()
    up = t[:12].upper()
    if up.startswith(("PROJCS", "GEOGCS", "GEOGCRS", "PROJCRS")):
        return register_wkt(t)
    if up.startswith("EPSG:"):
        return int(t.split(":", 1)[1])
    from .proj4 import register_proj4
    return register_proj4(t)
