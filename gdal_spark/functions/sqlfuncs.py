"""SQL-callable function surface — the analog of the SQLite dialect's
registered functions (ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:
ST_* suite :1184-1232, ogr_deflate/ogr_inflate :1114-1182,
hstore_get_value): `register_sql_functions(spark)` exposes the
engine's geometry + codec functions to plain `spark.sql(...)` text,
the way the reference exposes them to any SQLite-dialect statement.

All geometry functions are the Arrow-batched pandas UDFs from
functions/geometry.py — registration adds a SQL name, not a new
execution path. ogr_deflate/ogr_inflate are zlib (the reference wraps
CPLZLibDeflate/Inflate, port/cpl_vsi_mem.cpp helpers) over string or
binary input, Arrow-batched.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geometry as SG


@F.pandas_udf(T.BinaryType())
def ogr_deflate(col: pd.Series) -> pd.Series:
    """ogr_deflate(blob_or_text) -> zlib-compressed bytes
    (ogrsqlitesqlfunctions.cpp OGR2SQLITE_ogr_deflate)."""
    return pd.Series(
        [
            zlib.compress(v if isinstance(v, (bytes, bytearray)) else
                          str(v).encode("utf-8"))
            if v is not None else None
            for v in col
        ]
    )


@F.pandas_udf(T.BinaryType())
def ogr_inflate(col: pd.Series) -> pd.Series:
    """ogr_inflate(blob) -> decompressed bytes
    (ogrsqlitesqlfunctions.cpp OGR2SQLITE_ogr_inflate)."""
    return pd.Series(
        [zlib.decompress(bytes(v)) if v is not None else None for v in col]
    )


_REGISTRY = {
    # name -> already-built pandas UDF (1- or 2-arg)
    "ST_Area": SG.st_area,
    "ST_Centroid_X": SG.st_centroid_x,
    "ST_Centroid_Y": SG.st_centroid_y,
    "ST_ConvexHull": SG.st_convex_hull,
    "ST_MakeValid": SG.st_make_valid,
    "ST_Normalize": SG.st_normalize,
    "ST_Boundary": SG.st_boundary,
    "ST_IsSimple": SG.st_is_simple,
    "ST_IsRing": SG.st_is_ring,
    "ST_AsBinary": SG.st_aswkb,
    "ST_AsText": SG.st_astext,
    "ST_Intersects": SG.st_intersects,
    "ST_Contains": SG.st_contains,
    "ST_Within": SG.st_within,
    "ST_Touches": SG.st_touches,
    "ST_Overlaps": SG.st_overlaps,
    "ST_Equals": SG.st_equals,
    "ST_Disjoint": SG.st_disjoint,
    "ST_Crosses": SG.st_crosses,
    "ST_Distance": SG.st_distance,
    "ST_Intersection": SG.st_intersection,
    "ST_Union": SG.st_union_geom,
    "ST_Difference": SG.st_difference,
    "ST_SymDifference": SG.st_symdifference,
    "ogr_deflate": ogr_deflate,
    "ogr_inflate": ogr_inflate,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the suite on a session; returns the registered names.
    After this, `spark.sql("SELECT ST_Area(wkt) FROM ...")` works like
    a SQLite-dialect statement in the reference."""
    for name, udf in _REGISTRY.items():
        spark.udf.register(name, udf)
    return sorted(_REGISTRY)
