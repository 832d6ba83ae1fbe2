"""gdalsrsinfo: PROJ.4 / WKT1 renderings of every CRS the engine resolves.

Reference: ``apps/gdalsrsinfo.cpp`` (output modes ``-o proj4`` and
``-o wkt``; the report is ``exportToProj4()`` /
``exportToPrettyWkt()`` over the resolved ``OGRSpatialReference``).
The engine's answer to "which codes resolve" is the
``crs.CONIC_PRESETS`` dispatch table plus the UTM / web-mercator fast
paths; this module renders each of those codes the way the reference
utility would, so a user can diff the engine's CRS surface against
``gdalsrsinfo EPSG:xxxx`` output line-for-line.

Spark-first shape: the registry is O(40) rows of *metadata* — the
driver materialises one row per (code, parameter) with every numeric
already formatted (``_fmt`` is the single formatting authority), and
the actual string assembly (PROJ.4 ``+k=v`` chains, nested WKT1
``PARAMETER[...]`` lists) runs as Catalyst expressions over an
exploded parameter table: ``array_sort`` on (ordinal, text) structs +
``array_join`` inside one ``groupBy(code)``.  That keeps the assembly
logic in the JVM where a million-code registry would still be one
narrow shuffle, and — like the ``crs.py`` dual Column/SQL backends —
gives the DuckDB oracle (``localref.sql_srsinfo``, an independent
f-string renderer) something real to verify: the dispatch + ordering
+ quoting logic, not a copied literal.

WKT1 names follow GDAL's WKT1_GDAL emissions (``ogr_srs_api``
projection method names: ``Lambert_Conformal_Conic_2SP``,
``Hotine_Oblique_Mercator_Azimuth_Center``, ...); spheroid/datum
names follow the EPSG registry entries GDAL ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.crs import CONIC_PRESETS, ELLIPSOIDS


def _fmt(x: float) -> str:
    """Shortest round-trip decimal for a parameter value — integers
    print bare (``700000``), everything else via repr (matches PROJ's
    %.17g-then-trim convention closely enough to be stable)."""
    if isinstance(x, str):          # literal flag values (+axis=wsu)
        return x
    xf = float(x)
    if xf == int(xf) and abs(xf) < 1e15:
        return str(int(xf))
    return repr(xf)


# ellipsoid key -> (proj4 fragment, WKT spheroid name, a, rf)
# rf = inverse flattening (0 treated as sphere; not used here).
def _ellps_info(key: str) -> tuple[str, str, float, float]:
    a, f = ELLIPSOIDS[key]
    rf = 1.0 / f
    frag = {
        "WGS84": "+ellps=WGS84",
        "GRS80": "+ellps=GRS80",
        "bessel": "+ellps=bessel",
        "clrk66": "+ellps=clrk66",
        "intl": "+ellps=intl",
        # Everest 1830 (1967 definition) has no stock proj4 alias
        "evrst67": f"+a={_fmt(a)} +rf={_fmt(rf)}",
        # Clarke 1858 in Clarke's links (the Trinidad grid's native
        # frame; no stock alias — a is already in links)
        "clrk58links": f"+a={_fmt(a)} +rf={_fmt(rf)}",
        "GRS67mod": "+ellps=aust_SA",  # GRS 1967 Modified = aust_SA
    }[key]
    name = {
        "WGS84": "WGS 84",
        "GRS80": "GRS 1980",
        "bessel": "Bessel 1841",
        "clrk66": "Clarke 1866",
        "intl": "International 1924",
        "evrst67": "Everest 1830 (1967 Definition)",
        "clrk58links": "Clarke 1858",
        "GRS67mod": "GRS 1967 Modified",
    }[key]
    return frag, name, a, rf


# code -> (projected CRS name, GEOGCS name, DATUM name)
_NAMES = {
    3395: ("WGS 84 / World Mercator", "WGS 84", "WGS_1984"),
    28992: ("Amersfoort / RD New", "Amersfoort", "Amersfoort"),
    2154: ("RGF93 / Lambert-93", "RGF93",
           "Reseau_Geodesique_Francais_1993"),
    3347: ("NAD83 / Statistics Canada Lambert", "NAD83",
           "North_American_Datum_1983"),
    5070: ("NAD83 / Conus Albers", "NAD83", "North_American_Datum_1983"),
    3031: ("WGS 84 / Antarctic Polar Stereographic", "WGS 84", "WGS_1984"),
    102031: ("Europe_Equidistant_Conic", "ETRS89",
             "European_Terrestrial_Reference_System_1989"),
    102016: ("North_Pole_Azimuthal_Equidistant", "WGS 84", "WGS_1984"),
    5514: ("S-JTSK / Krovak East North", "S-JTSK",
           "System_Jednotne_Trigonometricke_Site_Katastralni"),
    54008: ("World_Sinusoidal", "WGS 84", "WGS_1984"),
    4087: ("WGS 84 / World Equidistant Cylindrical", "WGS 84", "WGS_1984"),
    54009: ("World_Mollweide", "WGS 84", "WGS_1984"),
    3035: ("ETRS89-extended / LAEA Europe", "ETRS89",
           "European_Terrestrial_Reference_System_1989"),
    6933: ("WGS 84 / NSIDC EASE-Grid 2.0 Global", "WGS 84", "WGS_1984"),
    8857: ("WGS 84 / Equal Earth Greenwich", "WGS 84", "WGS_1984"),
    2056: ("CH1903+ / LV95", "CH1903+", "CH1903+"),
    29873: ("Timbalai 1948 / RSO Borneo (m)", "Timbalai 1948",
            "Timbalai_1948"),
    2193: ("NZGD2000 / New Zealand Transverse Mercator 2000", "NZGD2000",
           "New_Zealand_Geodetic_Datum_2000"),
    29701: ("Tananarive (Paris) / Laborde Grid", "Tananarive (Paris)",
            "Tananarive_1925_Paris"),
    30200: ("Trinidad 1903 / Trinidad Grid", "Trinidad 1903",
            "Trinidad_1903"),
    29101: ("SAD69 / Brasil Polyconic", "SAD69",
            "South_American_Datum_1969"),
    54024: ("World_Bonne", "WGS 84", "WGS_1984"),
    5041: ("WGS 84 / UPS North (E,N)", "WGS 84", "WGS_1984"),
    5042: ("WGS 84 / UPS South (E,N)", "WGS 84", "WGS_1984"),
    3413: ("WGS 84 / NSIDC Sea Ice Polar Stereographic North",
           "WGS 84", "WGS_1984"),
    3575: ("WGS 84 / North Pole LAEA Europe", "WGS 84", "WGS_1984"),
    6931: ("WGS 84 / NSIDC EASE-Grid 2.0 North", "WGS 84", "WGS_1984"),
    6932: ("WGS 84 / NSIDC EASE-Grid 2.0 South", "WGS 84", "WGS_1984"),
    2054: ("Hartebeesthoek94 / Lo29", "Hartebeesthoek94",
           "Hartebeesthoek94"),
    54003: ("World_Miller_Cylindrical", "WGS 84", "WGS_1984"),
    54010: ("World_Eckert_VI", "WGS 84", "WGS_1984"),
    54012: ("World_Eckert_IV", "WGS 84", "WGS_1984"),
    54042: ("World_Winkel_Tripel", "WGS 84", "WGS_1984"),
    54044: ("World_Hammer_Aitoff", "WGS 84", "WGS_1984"),
    54016: ("World_Gall_Stereographic", "WGS 84", "WGS_1984"),
    54030: ("World_Robinson", "WGS 84", "WGS_1984"),
    32633: ("WGS 84 / UTM zone 33N", "WGS 84", "WGS_1984"),
    32733: ("WGS 84 / UTM zone 33S", "WGS 84", "WGS_1984"),
    26918: ("NAD83 / UTM zone 18N", "NAD83", "North_American_Datum_1983"),
    3857: ("WGS 84 / Pseudo-Mercator", "WGS 84", "WGS_1984"),
}

# family -> (proj4 +proj name, WKT1 PROJECTION name,
#            ordered [(preset key | literal, proj4 key, wkt key)])
# A tuple ("=", value) in the key slot injects a constant (e.g. the
# +lat_0=90 of the polar AEQD aspect).
_FAMILIES = {
    "merc": ("merc", "Mercator_1SP",
             [("lon0", "lon_0", "central_meridian"),
              (("=", 1.0), "k", "scale_factor"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "lcc": ("lcc", "Lambert_Conformal_Conic_2SP",
            [("phi1", "lat_1", "standard_parallel_1"),
             ("phi2", "lat_2", "standard_parallel_2"),
             ("phi0", "lat_0", "latitude_of_origin"),
             ("lon0", "lon_0", "central_meridian"),
             ("fe", "x_0", "false_easting"),
             ("fn", "y_0", "false_northing")]),
    "albers": ("aea", "Albers_Conic_Equal_Area",
               [("phi1", "lat_1", "standard_parallel_1"),
                ("phi2", "lat_2", "standard_parallel_2"),
                ("phi0", "lat_0", "latitude_of_center"),
                ("lon0", "lon_0", "longitude_of_center"),
                ("fe", "x_0", "false_easting"),
                ("fn", "y_0", "false_northing")]),
    "ps_south": ("stere", "Polar_Stereographic",
                 [(("=", -90.0), "lat_0", None),
                  ("phi_f", "lat_ts", "latitude_of_origin"),
                  ("lon0", "lon_0", "central_meridian"),
                  (("=", 1.0), None, "scale_factor"),
                  ("fe", "x_0", "false_easting"),
                  ("fn", "y_0", "false_northing")]),
    "sterea": ("sterea", "Oblique_Stereographic",
               [("phi0", "lat_0", "latitude_of_origin"),
                ("lon0", "lon_0", "central_meridian"),
                ("k0", "k", "scale_factor"),
                ("fe", "x_0", "false_easting"),
                ("fn", "y_0", "false_northing")]),
    "eqdc": ("eqdc", "Equidistant_Conic",
             [("phi1", "lat_1", "standard_parallel_1"),
              ("phi2", "lat_2", "standard_parallel_2"),
              ("phi0", "lat_0", "latitude_of_center"),
              ("lon0", "lon_0", "longitude_of_center"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "aeqd_north": ("aeqd", "Azimuthal_Equidistant",
                   [(("=", 90.0), "lat_0", "latitude_of_center"),
                    ("lon0", "lon_0", "longitude_of_center"),
                    ("fe", "x_0", "false_easting"),
                    ("fn", "y_0", "false_northing")]),
    "krovak": ("krovak", "Krovak",
               [(("=", 49.5), "lat_0", "latitude_of_center"),
                (("=", 24.833333333333332), "lon_0",
                 "longitude_of_center"),
                (("=", 30.288139752777778), "alpha", "azimuth"),
                (("=", 78.5), None, "pseudo_standard_parallel_1"),
                (("=", 0.9999), "k", "scale_factor"),
                ("fe", "x_0", "false_easting"),
                ("fn", "y_0", "false_northing")]),
    "sinu": ("sinu", "Sinusoidal",
             [("lon0", "lon_0", "longitude_of_center"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "eqc": ("eqc", "Equirectangular",
            [("phi1", "lat_ts", "standard_parallel_1"),
             (("=", 0.0), "lat_0", "latitude_of_origin"),
             ("lon0", "lon_0", "central_meridian"),
             ("fe", "x_0", "false_easting"),
             ("fn", "y_0", "false_northing")]),
    "moll": ("moll", "Mollweide",
             [("lon0", "lon_0", "central_meridian"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "laea": ("laea", "Lambert_Azimuthal_Equal_Area",
             [("phi0", "lat_0", "latitude_of_center"),
              ("lon0", "lon_0", "longitude_of_center"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "cea": ("cea", "Cylindrical_Equal_Area",
            [("phi1", "lat_ts", "standard_parallel_1"),
             ("lon0", "lon_0", "central_meridian"),
             ("fe", "x_0", "false_easting"),
             ("fn", "y_0", "false_northing")]),
    "eqearth": ("eqearth", "Equal_Earth",
                [("lon0", "lon_0", "longitude_of_center"),
                 ("fe", "x_0", "false_easting"),
                 ("fn", "y_0", "false_northing")]),
    "hom": ("omerc", "Hotine_Oblique_Mercator_Azimuth_Center",
            [("phic", "lat_0", "latitude_of_center"),
             ("lonc", "lonc", "longitude_of_center"),
             ("alphac", "alpha", "azimuth"),
             ("gammac", "gamma", "rectified_grid_angle"),
             ("kc", "k", "scale_factor"),
             ("fe", "x_0", "false_easting"),
             ("fn", "y_0", "false_northing")]),
    "laborde": ("labrd", "Laborde_Oblique_Mercator",
                [("phic", "lat_0", "latitude_of_center"),
                 ("lonc", "lon_0", "longitude_of_center"),
                 ("alphac", "azi", "azimuth"),
                 ("kc", "k", "scale_factor"),
                 ("fe", "x_0", "false_easting"),
                 ("fn", "y_0", "false_northing")]),
    "tmerc": ("tmerc", "Transverse_Mercator",
              [(("=", 0.0), "lat_0", "latitude_of_origin"),
               ("lon0", "lon_0", "central_meridian"),
               ("k0", "k", "scale_factor"),
               ("fe", "x_0", "false_easting"),
               ("fn", "y_0", "false_northing")]),
    "cassini": ("cass", "Cassini_Soldner",
                [("phi0", "lat_0", "latitude_of_origin"),
                 ("lon0", "lon_0", "central_meridian"),
                 ("fe", "x_0", "false_easting"),
                 ("fn", "y_0", "false_northing")]),
    "poly": ("poly", "Polyconic",
             [("phi0", "lat_0", "latitude_of_origin"),
              ("lon0", "lon_0", "central_meridian"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "bonne": ("bonne", "Bonne",
              [("phi1", "lat_1", "standard_parallel_1"),
               ("lon0", "lon_0", "central_meridian"),
               ("fe", "x_0", "false_easting"),
               ("fn", "y_0", "false_northing")]),
    "ups_north": ("stere", "Polar_Stereographic",
                  [(("=", 90.0), "lat_0", "latitude_of_origin"),
                   ("lon0", "lon_0", "central_meridian"),
                   ("k0", "k", "scale_factor"),
                   ("fe", "x_0", "false_easting"),
                   ("fn", "y_0", "false_northing")]),
    "ups_south": ("stere", "Polar_Stereographic",
                  [(("=", -90.0), "lat_0", "latitude_of_origin"),
                   ("lon0", "lon_0", "central_meridian"),
                   ("k0", "k", "scale_factor"),
                   ("fe", "x_0", "false_easting"),
                   ("fn", "y_0", "false_northing")]),
    "ps_north": ("stere", "Polar_Stereographic",
                 [(("=", 90.0), "lat_0", None),
                  ("phi_f", "lat_ts", "latitude_of_origin"),
                  ("lon0", "lon_0", "central_meridian"),
                  (("=", 1.0), None, "scale_factor"),
                  ("fe", "x_0", "false_easting"),
                  ("fn", "y_0", "false_northing")]),
    "laea_north": ("laea", "Lambert_Azimuthal_Equal_Area",
                   [(("=", 90.0), "lat_0", "latitude_of_center"),
                    ("lon0", "lon_0", "longitude_of_center"),
                    ("fe", "x_0", "false_easting"),
                    ("fn", "y_0", "false_northing")]),
    "laea_south": ("laea", "Lambert_Azimuthal_Equal_Area",
                   [(("=", -90.0), "lat_0", "latitude_of_center"),
                    ("lon0", "lon_0", "longitude_of_center"),
                    ("fe", "x_0", "false_easting"),
                    ("fn", "y_0", "false_northing")]),
    "mill": ("mill", "Miller_Cylindrical",
             [("lon0", "lon_0", "central_meridian"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "gall": ("gall", "Gall_Stereographic",
             [("lon0", "lon_0", "central_meridian"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "robin": ("robin", "Robinson",
              [("lon0", "lon_0", "longitude_of_center"),
               ("fe", "x_0", "false_easting"),
               ("fn", "y_0", "false_northing")]),
    "eck4": ("eck4", "Eckert_IV",
             [("lon0", "lon_0", "central_meridian"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "eck6": ("eck6", "Eckert_VI",
             [("lon0", "lon_0", "central_meridian"),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
    "hammer": ("hammer", "Hammer_Aitoff",
               [("lon0", "lon_0", "central_meridian"),
                ("fe", "x_0", "false_easting"),
                ("fn", "y_0", "false_northing")]),
    "wintri": ("wintri", "Winkel_Tripel",
               [("phi1", "lat_1", "standard_parallel_1"),
                ("lon0", "lon_0", "central_meridian"),
                ("fe", "x_0", "false_easting"),
                ("fn", "y_0", "false_northing")]),
    # method 9808: the 9807 series with westing/southing axes — PROJ
    # spells the axis swap +axis=wsu
    "tmso": ("tmerc", "Transverse_Mercator_South_Orientated",
             [(("=", 0.0), "lat_0", "latitude_of_origin"),
              ("lon0", "lon_0", "central_meridian"),
              ("k0", "k", "scale_factor"),
              (("=", "wsu"), "axis", None),
              ("fe", "x_0", "false_easting"),
              ("fn", "y_0", "false_northing")]),
}

# per-code coordinate unit: (WKT unit name, WKT factor, proj4 fragment)
_UNITS_DEFAULT = ("metre", "1", "+units=m")
_UNITS = {
    30200: ("Clarke's link", "0.201166195164",
            "+to_meter=0.201166195164"),
}

# ESRI-namespace codes (no EPSG AUTHORITY node in WKT1)
ESRI_CODES = frozenset({54003, 54008, 54009, 54010, 54012, 54016,
                        54024, 54030, 54042, 54044, 102016, 102031})

# UTM fast-path codes rendered alongside the conic registry (one
# representative per ELLIPSOIDS-backed band; the full 326xx/327xx/269xx
# ranges resolve identically via crs.utm_params).
_UTM_CODES = {32633: ("WGS84", 33, False), 32733: ("WGS84", 33, True),
              26918: ("GRS80", 18, False)}


def registry_rows() -> list[dict]:
    """One dict per (code, parameter) with pre-formatted values, plus
    the per-code header fields.  ``ordinal`` preserves the reference's
    parameter emission order through the distributed re-assembly."""
    rows: list[dict] = []

    def _emit(code, kind, proj_name, wkt_proj, ellps_key, params):
        frag, sph_name, a, rf = _ellps_info(ellps_key)
        name, gcs, datum = _NAMES[code]
        # PROJ prints well-known datums as +datum=, not +ellps=
        # (exportToProj4 behavior for WGS84/NAD83-based CRS)
        if datum == "WGS_1984":
            frag = "+datum=WGS84"
        elif datum == "North_American_Datum_1983":
            frag = "+datum=NAD83"
        unit_name, unit_factor, p4_units = _UNITS.get(code, _UNITS_DEFAULT)
        for i, (p4k, wkk, val) in enumerate(params):
            rows.append(dict(
                epsg=code, kind=kind, name=name, geogcs=gcs, datum=datum,
                spheroid=sph_name, a=_fmt(a), rf=_fmt(rf),
                proj=proj_name, wkt_projection=wkt_proj, ellps_frag=frag,
                unit_name=unit_name, unit_factor=unit_factor,
                p4_units=p4_units,
                ordinal=i, proj4_key=p4k, wkt_key=wkk, value=_fmt(val),
            ))

    # negative codes are synthetic proj4-import registrations
    # (gdal_spark/proj4.py) — dispatchable but not part of the report
    for code, (kind, ellps_key, preset) in sorted(CONIC_PRESETS.items()):
        if code < 0:
            continue
        proj_name, wkt_proj, spec = _FAMILIES[kind]
        params = []
        for src, p4k, wkk in spec:
            val = src[1] if isinstance(src, tuple) else preset[src]
            params.append((p4k, wkk, val))
        _emit(code, kind, proj_name, wkt_proj, ellps_key, params)

    for code, (ellps_key, zone, south) in sorted(_UTM_CODES.items()):
        params = [
            (None, "latitude_of_origin", 0.0),
            (None, "central_meridian", zone * 6 - 183),
            (None, "scale_factor", 0.9996),
            ("zone", None, zone),                      # +zone=NN
            (None, "false_easting", 500000.0),
            (None, "false_northing", 10000000.0 if south else 0.0),
        ]
        if south:
            params.insert(4, ("south", None, 0.0))  # bare +south flag
        _emit(code, "utm", "utm", "Transverse_Mercator", ellps_key, params)

    # 3857 — GDAL's sphere-as-ellipsoid proj4 special case
    name, gcs, datum = _NAMES[3857]
    params = [("a", None, 6378137.0), ("b", None, 6378137.0),
              ("lat_ts", "latitude_of_origin", 0.0),
              ("lon_0", "central_meridian", 0.0),
              ("x_0", "false_easting", 0.0),
              ("y_0", "false_northing", 0.0),
              (None, "scale_factor", 1.0)]
    for i, (p4k, wkk, val) in enumerate(params):
        rows.append(dict(
            epsg=3857, kind="webmerc", name=name, geogcs=gcs, datum=datum,
            spheroid="WGS 84", a=_fmt(6378137.0),
            rf=_fmt(298.257223563), proj="merc",
            wkt_projection="Mercator_1SP", ellps_frag="",
            unit_name="metre", unit_factor="1", p4_units="+units=m",
            ordinal=i, proj4_key=p4k, wkt_key=wkk, value=_fmt(val),
        ))
    return rows


def proj4_strings() -> dict[int, str]:
    """exportToProj4 for every registered code, rendered driver-side
    from the same rows the engine explodes (shared by the proj4-import
    closure test and the proj4_import_parity contract query)."""
    by_code: dict = {}
    for r in registry_rows():
        by_code.setdefault(r["epsg"], []).append(r)
    out = {}
    for code, ps in by_code.items():
        ps = sorted(ps, key=lambda r: r["ordinal"])
        h = ps[0]
        items = []
        for r in ps:
            k = r["proj4_key"]
            if k == "south":
                items.append("+south")
            elif k is not None:
                items.append(f"+{k}={r['value']}")
        if h["kind"] == "webmerc":
            tail = (" +k=1 +units=m +nadgrids=@null"
                    " +wgs84=0,0,0,0,0,0,0 +no_defs")
        else:
            tail = f" {h['p4_units']} +no_defs"
        ellps = f" {h['ellps_frag']}" if h["ellps_frag"] else ""
        out[code] = ("+proj=" + h["proj"]
                     + (" " + " ".join(items) if items else "")
                     + ellps + tail)
    # the built-in no-EPSG-code presets (geostationary full discs,
    # uninterrupted Goode) export directly: they carry no WKT1 name
    # block, but their proj4 form — including the STRING +sweep token
    # WKT1 cannot express — must round-trip through the importer
    from . import crs as _crs

    for code in (_crs.CODE_GOODE, _crs.CODE_GEOS_MSG,
                 _crs.CODE_GEOS_GOES_EAST):
        kind, ell, p = _crs.CONIC_PRESETS[code]
        frag = {"WGS84": "+datum=WGS84", "GRS80": "+ellps=GRS80"}[ell]
        if kind == "goode":
            out[code] = (f"+proj=goode +lon_0={_fmt(p['lon0'])}"
                         f" +x_0={_fmt(p['fe'])} +y_0={_fmt(p['fn'])}"
                         f" {frag} +units=m +no_defs")
        else:
            sweep = "x" if p["sweep_x"] else "y"
            out[code] = (f"+proj=geos +h={_fmt(p['h'])}"
                         f" +lon_0={_fmt(p['lon0'])} +sweep={sweep}"
                         f" +x_0={_fmt(p['fe'])} +y_0={_fmt(p['fn'])}"
                         f" {frag} +units=m +no_defs")
    return out


def wkt_strings() -> dict[int, str]:
    """exportToWkt (WKT1-GDAL flavor) for every registered projected
    code, rendered driver-side from the same ``registry_rows()`` the
    ``srsinfo()`` DataFrame explodes — byte-identical to the JVM
    assembly (asserted in tests).  Shared by the WKT-import closure
    test and the ``wkt_import_parity`` contract query (reference:
    ``ogr/ogrspatialreference.cpp exportToWkt``)."""
    by_code: dict = {}
    for r in registry_rows():
        by_code.setdefault(r["epsg"], []).append(r)
    out = {}
    for code, ps in by_code.items():
        ps = sorted(ps, key=lambda r: r["ordinal"])
        h = ps[0]
        params = ",".join(
            f'PARAMETER["{r["wkt_key"]}",{r["value"]}]'
            for r in ps if r["wkt_key"] is not None)
        geogcs = (
            f'GEOGCS["{h["geogcs"]}",DATUM["{h["datum"]}",'
            f'SPHEROID["{h["spheroid"]}",{h["a"]},{h["rf"]}]],'
            f'PRIMEM["Greenwich",0],'
            f'UNIT["degree",0.0174532925199433]]')
        auth = ("" if code in ESRI_CODES
                else f',AUTHORITY["EPSG","{code}"]')
        out[code] = (
            f'PROJCS["{h["name"]}",{geogcs},'
            f'PROJECTION["{h["wkt_projection"]}"],{params},'
            f'UNIT["{h["unit_name"]}",{h["unit_factor"]}]{auth}]')
    return out


def params_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(registry_rows()).repartition(8, "epsg")


def srsinfo(spark: SparkSession) -> DataFrame:
    """The gdalsrsinfo report: (epsg, name, kind, proj4, wkt) — one
    row per registered code, strings assembled JVM-side.

    PROJ.4: ``+proj=<p> [+k=v ...] <ellps frag> +units=m +no_defs``
    (bare flags like ``+south`` render valueless; webmerc appends
    GDAL's ``+nadgrids=@null +wgs84=0,0,0,0,0,0,0``).
    WKT1: ``PROJCS[... GEOGCS[... DATUM[... SPHEROID]] PROJECTION
    PARAMETER* UNIT AUTHORITY]`` with parameters in reference order.
    """
    p = params_df(spark)
    q = F.lit('"')

    p4_item = F.when(
        F.col("proj4_key").isNull(), F.lit(None)
    ).when(
        F.col("proj4_key") == "south", F.lit("+south")
    ).otherwise(F.concat(F.lit("+"), "proj4_key", F.lit("="), "value"))

    wkt_item = F.when(F.col("wkt_key").isNull(), F.lit(None)).otherwise(
        F.concat(F.lit('PARAMETER['), q, "wkt_key", q, F.lit(","),
                 "value", F.lit("]")))

    parts = p.groupBy(
        "epsg", "kind", "name", "geogcs", "datum", "spheroid", "a", "rf",
        "proj", "wkt_projection", "ellps_frag",
        "unit_name", "unit_factor", "p4_units",
    ).agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.when(
                p4_item.isNotNull(),
                F.struct(F.col("ordinal"), p4_item.alias("t"))))),
            lambda s: s["t"]), " ").alias("p4_params"),
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.when(
                wkt_item.isNotNull(),
                F.struct(F.col("ordinal"), wkt_item.alias("t"))))),
            lambda s: s["t"]), ",").alias("wkt_params"),
    )

    tail = F.when(F.col("kind") == "webmerc",
                  F.lit(" +k=1 +units=m +nadgrids=@null"
                        " +wgs84=0,0,0,0,0,0,0 +no_defs")
                  ).otherwise(F.concat(F.lit(" "), "p4_units",
                                       F.lit(" +no_defs")))
    ellps = F.when(F.col("ellps_frag") == "", F.lit("")).otherwise(
        F.concat(F.lit(" "), "ellps_frag"))
    proj4 = F.concat(
        F.lit("+proj="), "proj",
        F.when(F.col("p4_params") == "", F.lit("")).otherwise(
            F.concat(F.lit(" "), "p4_params")),
        ellps, tail)

    geogcs = F.concat(
        F.lit('GEOGCS['), q, "geogcs", q,
        F.lit(',DATUM['), q, "datum", q,
        F.lit(',SPHEROID['), q, "spheroid", q, F.lit(","), "a",
        F.lit(","), "rf", F.lit("]]"),
        F.lit(',PRIMEM["Greenwich",0],UNIT["degree",'
              '0.0174532925199433]]'))
    wkt = F.concat(
        F.lit('PROJCS['), q, "name", q, F.lit(","), geogcs,
        F.lit(',PROJECTION['), q, "wkt_projection", q, F.lit("]"),
        F.lit(","), "wkt_params",
        F.concat(F.lit(',UNIT['), q, "unit_name", q, F.lit(","),
                 "unit_factor", F.lit("]")),
        F.when(~F.col("epsg").isin(*sorted(ESRI_CODES)),
               F.concat(F.lit(',AUTHORITY["EPSG","'),
                        F.col("epsg").cast("string"), F.lit('"]'))
               ).otherwise(F.lit("")),
        F.lit("]"))

    return parts.select(
        "epsg", "name", "kind",
        proj4.alias("proj4"), wkt.alias("wkt"),
    ).orderBy("epsg")
