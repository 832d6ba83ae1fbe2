"""Coordinate transforms beyond Web-Mercator: Transverse Mercator /
UTM, closed form (the reference delegates to PROJ via OGRCoordinate-
Transformation, ogr/ogrct.cpp:1822; the projection math itself is the
public Snyder series — Snyder 1987, "Map Projections: A Working
Manual", USGS PP 1395, eqs. 8-9..8-15 — accurate to ~1 mm).

The formula is written ONCE against an abstract expression backend
and instantiated twice: as pyspark Column expressions (pure JVM
whole-stage codegen — no UDF) and as an ANSI-SQL string with the
IDENTICAL association order, so the DuckDB oracle evaluates the same
floating-point expression tree (sin/cos ulp differences are absorbed
by mm-level rounding).

Datum note: this is the PROJECTION step only — no datum shift, i.e.
exact for same-datum transforms (EPSG:4326->326xx WGS84, 4269->269xx
NAD83) and the projection component of 267xx NAD27 (Clarke 1866
ellipsoid). PROJ's NAD27 grid-shift files are out of scope.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (semi-major a, flattening f)
ELLIPSOIDS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "clrk66": (6378206.4, 1.0 - 6356583.8 / 6378206.4),
}


class _ColBackend:
    lit = staticmethod(F.lit)
    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    tan = staticmethod(F.tan)
    sqrt = staticmethod(F.sqrt)
    radians = staticmethod(F.radians)


class _Sql(str):
    def _b(self, op, other):
        return _Sql(f"({self} {op} {_sqlify(other)})")

    def _rb(self, op, other):
        return _Sql(f"({_sqlify(other)} {op} {self})")

    def __add__(self, o):
        return self._b("+", o)

    def __radd__(self, o):
        return self._rb("+", o)

    def __sub__(self, o):
        return self._b("-", o)

    def __rsub__(self, o):
        return self._rb("-", o)

    def __mul__(self, o):
        return self._b("*", o)

    def __rmul__(self, o):
        return self._rb("*", o)

    def __truediv__(self, o):
        return self._b("/", o)

    def __rtruediv__(self, o):
        return self._rb("/", o)


def _sqlify(v):
    return v if isinstance(v, _Sql) else _Sql(repr(float(v)))


class _SqlBackend:
    lit = staticmethod(_sqlify)

    @staticmethod
    def sin(x):
        return _Sql(f"SIN({x})")

    @staticmethod
    def cos(x):
        return _Sql(f"COS({x})")

    @staticmethod
    def tan(x):
        return _Sql(f"TAN({x})")

    @staticmethod
    def sqrt(x):
        return _Sql(f"SQRT({x})")

    @staticmethod
    def radians(x):
        return _Sql(f"RADIANS({x})")


def _tm_forward(B, lon, lat, lon0, a: float, f: float,
                k0: float = 0.9996, false_e: float = 500000.0,
                false_n: float = 0.0):
    """Snyder 8-9..8-15 forward Transverse Mercator on backend B.
    lon/lat in degrees (backend values); lon0 the central meridian
    (float, or a backend value for per-row zones)."""
    e2 = f * (2.0 - f)
    e4 = e2 * e2
    e6 = e4 * e2
    ep2 = e2 / (1.0 - e2)

    if isinstance(lon0, (int, float)):
        lon0 = B.lit(float(lon0))
    phi = B.radians(lat)
    lam = B.radians(lon - lon0)
    sphi = B.sin(phi)
    cphi = B.cos(phi)
    tphi = B.tan(phi)

    N = B.lit(a) / B.sqrt(1.0 - B.lit(e2) * sphi * sphi)
    T = tphi * tphi
    C = B.lit(ep2) * cphi * cphi
    A = lam * cphi

    m0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    m2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    m4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    m6 = 35.0 * e6 / 3072.0
    M = B.lit(a) * (
        B.lit(m0) * phi
        - B.lit(m2) * B.sin(phi * 2.0)
        + B.lit(m4) * B.sin(phi * 4.0)
        - B.lit(m6) * B.sin(phi * 6.0)
    )

    A2 = A * A
    A3 = A2 * A
    A4 = A2 * A2
    A5 = A4 * A
    A6 = A4 * A2
    easting = B.lit(false_e) + B.lit(k0) * N * (
        A
        + (1.0 - T + C) * A3 / 6.0
        + (5.0 - 18.0 * T + T * T + 72.0 * C - B.lit(58.0 * ep2)) * A5 / 120.0
    )
    northing = B.lit(false_n) + B.lit(k0) * (
        M
        + N * tphi * (
            A2 / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C * C) * A4 / 24.0
            + (61.0 - 58.0 * T + T * T + 600.0 * C - B.lit(330.0 * ep2)) * A6 / 720.0
        )
    )
    return easting, northing


def utm_params(epsg: int) -> tuple[str, int, bool]:
    """EPSG UTM code -> (ellipsoid, zone, south). 326xx/327xx WGS84,
    269xx NAD83 (GRS80), 267xx NAD27 (Clarke 1866)."""
    if 32601 <= epsg <= 32660:
        return "WGS84", epsg - 32600, False
    if 32701 <= epsg <= 32760:
        return "WGS84", epsg - 32700, True
    if 26901 <= epsg <= 26923:
        return "GRS80", epsg - 26900, False
    if 26701 <= epsg <= 26722:
        return "clrk66", epsg - 26700, False
    raise ValueError(f"not a supported UTM EPSG code: {epsg}")


def utm_forward(lon: Column, lat: Column, zone: int, ellipsoid: str = "WGS84",
                south: bool = False) -> tuple[Column, Column]:
    """(easting, northing) Column expressions — pure JVM math."""
    a, f = ELLIPSOIDS[ellipsoid]
    lon0 = -183.0 + 6.0 * zone
    return _tm_forward(
        _ColBackend, lon, lat, lon0, a, f,
        false_n=10000000.0 if south else 0.0,
    )


def utm_forward_sql(lon_expr: str, lat_expr: str, zone: int,
                    ellipsoid: str = "WGS84", south: bool = False) -> tuple[str, str]:
    """The SAME expression as SQL text (identical association order)."""
    a, f = ELLIPSOIDS[ellipsoid]
    lon0 = -183.0 + 6.0 * zone
    e, n = _tm_forward(
        _SqlBackend, _Sql(lon_expr), _Sql(lat_expr), lon0, a, f,
        false_n=10000000.0 if south else 0.0,
    )
    return str(e), str(n)


def to_utm(df: DataFrame, epsg: int, lon_col: str = "lon",
           lat_col: str = "lat") -> DataFrame:
    """Project lon/lat columns to the given UTM EPSG — the warped-layer
    coordinate step (generic/ogrwarpedlayer.cpp:166) for UTM targets."""
    ellps, zone, south = utm_params(epsg)
    e, n = utm_forward(F.col(lon_col), F.col(lat_col), zone, ellps, south)
    return df.withColumn("easting", e).withColumn("northing", n)


def utm_zone_of(lon: Column) -> Column:
    """Native UTM zone of a longitude (1..60)."""
    return F.least(F.lit(60), F.greatest(F.lit(1), (F.floor((lon + 180.0) / 6.0) + 1).cast("int")))


def utm_forward_native(lon: Column, lat: Column,
                       ellipsoid: str = "WGS84") -> tuple[Column, Column, Column]:
    """(zone, easting, northing) with each row projected into its own
    native UTM zone — column-only central meridian."""
    a, f = ELLIPSOIDS[ellipsoid]
    zone = utm_zone_of(lon)
    lon0 = zone.cast("double") * 6.0 - 183.0
    e, n = _tm_forward(_ColBackend, lon, lat, lon0, a, f)
    return zone, e, n


def _tm_inverse(B, easting, northing, lon0, a: float, f: float,
                k0: float = 0.9996, false_e: float = 500000.0,
                false_n: float = 0.0):
    """Snyder 8-16..8-25 inverse Transverse Mercator on backend B
    (footpoint-latitude series), returning (lon_deg, lat_deg)."""
    e2 = f * (2.0 - f)
    e4 = e2 * e2
    e6 = e4 * e2
    ep2 = e2 / (1.0 - e2)
    if isinstance(lon0, (int, float)):
        lon0 = B.lit(float(lon0))

    x = easting - B.lit(false_e)
    y = northing - B.lit(false_n)
    m0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    M = y / B.lit(k0)
    mu = M / B.lit(a * m0)
    sq = math.sqrt(1.0 - e2)
    e1 = (1.0 - sq) / (1.0 + sq)
    j1 = 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0
    j2 = 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0
    j3 = 151.0 * e1 ** 3 / 96.0
    j4 = 1097.0 * e1 ** 4 / 512.0
    fp = (
        mu
        + B.lit(j1) * B.sin(mu * 2.0)
        + B.lit(j2) * B.sin(mu * 4.0)
        + B.lit(j3) * B.sin(mu * 6.0)
        + B.lit(j4) * B.sin(mu * 8.0)
    )
    sfp = B.sin(fp)
    cfp = B.cos(fp)
    tfp = B.tan(fp)
    C1 = B.lit(ep2) * cfp * cfp
    T1 = tfp * tfp
    # no pow in the backend: R1 = a(1-e2)/W^3, N1 = a/W, W = sqrt(1-e2 sin^2)
    W = B.sqrt(1.0 - B.lit(e2) * sfp * sfp)
    N1 = B.lit(a) / W
    R1 = B.lit(a * (1.0 - e2)) / (W * W * W)
    D = x / (N1 * B.lit(k0))
    D2 = D * D
    D3 = D2 * D
    D4 = D2 * D2
    D5 = D4 * D
    D6 = D4 * D2
    lat = fp - (N1 * tfp / R1) * (
        D2 / 2.0
        - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1 - B.lit(9.0 * ep2)) * D4 / 24.0
        + (61.0 + 90.0 * T1 + 298.0 * C1 + 45.0 * T1 * T1
           - B.lit(252.0 * ep2) - 3.0 * C1 * C1) * D6 / 720.0
    )
    lam = (
        D
        - (1.0 + 2.0 * T1 + C1) * D3 / 6.0
        + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1
           + B.lit(8.0 * ep2) + 24.0 * T1 * T1) * D5 / 120.0
    ) / cfp
    deg = 180.0 / math.pi
    return lon0 + lam * B.lit(deg), lat * B.lit(deg)


def utm_inverse(easting: Column, northing: Column, zone: int,
                ellipsoid: str = "WGS84", south: bool = False) -> tuple[Column, Column]:
    """(lon, lat) Column expressions from UTM easting/northing."""
    a, f = ELLIPSOIDS[ellipsoid]
    lon0 = -183.0 + 6.0 * zone
    return _tm_inverse(
        _ColBackend, easting, northing, lon0, a, f,
        false_n=10000000.0 if south else 0.0,
    )


def from_utm(df: DataFrame, epsg: int, e_col: str = "easting",
             n_col: str = "northing") -> DataFrame:
    ellps, zone, south = utm_params(epsg)
    lon, lat = utm_inverse(F.col(e_col), F.col(n_col), zone, ellps, south)
    return df.withColumn("lon", lon).withColumn("lat", lat)
