"""OGR CSV driver — Spark-native scan with GDAL's layer semantics.

Reference: gdal/ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp —
  - type autodetection (AutodetectFieldTypes, :1050-1380): per-value
    classification via CPLGetValueType/OGRParseDate, then a promotion
    lattice (Integer -> Integer64 -> Real; Date+DateTime -> DateTime;
    any other mix -> String; all-boolean-strings -> Integer(Boolean))
  - geometry discovery (:608,743-845): a ".csvt" type of WKT, a header
    named "WKT"/"_WKT*", GEOM_POSSIBLE_NAMES, or X_/Y_POSSIBLE_NAMES
    point assembly; possible-name patterns support ci-exact, "pre*",
    "*suf" and "*mid*" (Matches, :281-320)
  - ".csvt" sidecar types (:516-543, gdal.org/drivers/vector/csv.html)
  - FIDs are 1-based sequential (ogr_csv.h nNextFID initialises to 1)

Spark-first mapping: the scan IS `spark.read.csv` (splittable,
predicate/projection handled by Catalyst; a 100 TB CSV directory scans
as ordinary file splits). GDAL reads the whole file once per layer to
autodetect; here autodetection is ONE distributed aggregation pass
emitting a bitmask of observed value classes per column (bit_or — a
single reduced row, driver state O(ncols)), then the promotion lattice
resolves driver-side and casts happen in whole-stage codegen. FID
assignment uses the partition-offset zip-with-index (zipindex.py) —
file order, no global sort.

The writer has two modes: `single_file=False` (default) writes a
directory of part CSVs through Spark's native writer — the scale path;
`single_file=True` streams `toLocalIterator()` through one handle for
byte-exact GDAL-style output (same single-writer contract as the
shapefile sink).
"""

from __future__ import annotations

import csv as _csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .zipindex import with_global_index

# value-class bitmask (one distributed bit_or per column)
_INT, _INT64, _REAL, _DATE, _TIME, _DATETIME, _STR, _BOOL = (
    1, 2, 4, 8, 16, 32, 64, 128)

_TRUE_SET = ("t", "true", "y", "yes", "on")    # OGRCSVIsTrue
_FALSE_SET = ("f", "false", "n", "no", "off")  # OGRCSVIsFalse
_BOOL_SET = _TRUE_SET + _FALSE_SET

_RE_INT = r"^[+-]?[0-9]+$"
_RE_REAL = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"
_RE_DATETIME = (r"^[0-9]{4}[-/][0-9]{1,2}[-/][0-9]{1,2}[T ]"
                r"[0-9]{1,2}:[0-9]{2}(:[0-9]{2}(\.[0-9]+)?)?$")
_RE_DATE = r"^[0-9]{4}[-/][0-9]{1,2}[-/][0-9]{1,2}$"
_RE_TIME = r"^[0-9]{1,2}:[0-9]{2}(:[0-9]{2}(\.[0-9]+)?)?$"


def _class_expr(c: str):
    """Per-value class bit, mirroring AutodetectFieldTypes' use of
    CPLGetValueType + OGRParseDate on each token."""
    v = F.col(c)
    return (
        F.when(v.isNull() | (v == ""), F.lit(0))
        .when(v.rlike(_RE_INT),
              F.when(F.abs(v.cast("decimal(38,0)")) <= 2147483647,
                     F.lit(_INT)).otherwise(F.lit(_INT64)))
        .when(v.rlike(_RE_REAL), F.lit(_REAL))
        .when(v.rlike(_RE_DATETIME), F.lit(_DATETIME))
        .when(v.rlike(_RE_DATE), F.lit(_DATE))
        .when(v.rlike(_RE_TIME), F.lit(_TIME))
        .when(F.lower(v).isin(*_BOOL_SET), F.lit(_BOOL))
        .otherwise(F.lit(_STR))
    )


def _resolve_type(mask: int) -> str:
    """Promotion lattice (ogrcsvlayer.cpp:1211-1280)."""
    if mask == 0:
        return "String"
    if mask & _STR:
        return "String"
    if mask == _BOOL:
        return "Integer(Boolean)"
    if mask & _BOOL:  # boolean strings mixed with anything typed
        return "String"
    numeric, datey = mask & (_INT | _INT64 | _REAL), mask & (_DATE | _TIME | _DATETIME)
    if numeric and datey:
        return "String"
    if numeric:
        if mask & _REAL:
            return "Real"
        return "Integer64" if mask & _INT64 else "Integer"
    if mask & _TIME:
        return "Time" if not (mask & (_DATE | _DATETIME)) else "String"
    return "DateTime" if mask & _DATETIME else "Date"


def autodetect_field_types(df: DataFrame,
                           cols: list[str] | None = None) -> dict[str, str]:
    """One aggregation pass over the raw-string frame -> GDAL type name
    per column. Distributed bit_or; the only driver state is one bitmask
    per column (AutodetectFieldTypes reads AUTODETECT_SIZE_LIMIT bytes
    serially; here the 'limit' is the whole table at scan parallelism)."""
    cols = cols or df.columns
    row = df.select(
        *[F.bit_or(_class_expr(c)).alias(c) for c in cols]
    ).collect()[0]
    return {c: _resolve_type(int(row[c] or 0)) for c in cols}


def _cast_col(c: str, gdal_type: str):
    v = F.col(c)
    t = gdal_type.split(" ")[0].split("(")[0]  # strip width annotations
    if gdal_type.startswith("Integer(Boolean)"):
        return F.when(v.isNull() | (v == ""), None).otherwise(
            F.lower(v).isin(*_TRUE_SET)).alias(c)
    if t == "Integer":
        return v.cast("int").alias(c)
    if t == "Integer64":
        return v.cast("long").alias(c)
    if t == "Real":
        return v.cast("double").alias(c)
    if t == "Date":
        return F.to_date(F.translate(v, "/", "-")).alias(c)
    if t == "DateTime":
        return F.to_timestamp(
            F.regexp_replace(F.translate(v, "/", "-"), "T", " ")).alias(c)
    # Time / String / WKT / JSon* stay strings (Spark has no time-of-day)
    return v.alias(c)


def _matches(name: str, patterns: list[str] | None) -> bool:
    """Case-insensitive exact / 'pre*' / '*suf' / '*mid*' match
    (ogrcsvlayer.cpp:281 Matches)."""
    if not patterns:
        return False
    n = name.lower()
    for p in patterns:
        p = p.lower()
        if "*" not in p:
            if n == p:
                return True
        elif p.startswith("*") and p.endswith("*") and len(p) >= 3:
            if p[1:-1] in n:
                return True
        elif p.startswith("*"):
            if n.endswith(p[1:]):
                return True
        elif p.endswith("*"):
            if n.startswith(p[:-1]):
                return True
    return False


def parse_csvt(text: str) -> list[str]:
    """Parse a .csvt sidecar line: comma-separated quoted-or-bare GDAL
    type names, e.g. 'Integer,Real,String(20),WKT'."""
    return [t.strip().strip('"').strip() for t in text.strip().split(",")]


def read_csv_layer(
    spark: SparkSession,
    path: str,
    *,
    delimiter: str = ",",
    autodetect_type: bool = False,
    field_types: list[str] | str | None = None,
    geom_possible_names: list[str] | None = None,
    x_possible_names: list[str] | None = None,
    y_possible_names: list[str] | None = None,
    z_possible_names: list[str] | None = None,
    keep_geom_columns: bool = True,
    with_fid: bool = True,
) -> DataFrame:
    """Open a CSV (file or directory of files) as an OGR-style layer
    DataFrame: (fid, geom_wkt?, <fields...>).

    field_types: explicit .csvt types (list, or the sidecar's text) —
    overrides autodetection, like the reference (:516 'Search a csvt
    file for types' runs before AutodetectFieldTypes).
    """
    raw = (spark.read.option("header", True).option("sep", delimiter)
           .option("inferSchema", False).csv(path))
    # GDAL trims whitespace around header names (:579-586)
    renames = {c: c.strip() for c in raw.columns if c != c.strip()}
    for old, new in renames.items():
        raw = raw.withColumnRenamed(old, new)
    cols = raw.columns

    if isinstance(field_types, str):
        field_types = parse_csvt(field_types)
    types: dict[str, str]
    if field_types is not None:
        if len(field_types) != len(cols):
            raise ValueError(
                f".csvt has {len(field_types)} types for {len(cols)} columns")
        types = dict(zip(cols, field_types))
    elif autodetect_type:
        types = autodetect_field_types(raw)
    else:
        types = {c: "String" for c in cols}

    # geometry discovery, reference precedence: csvt WKT > header named
    # WKT/_WKT* > GEOM_POSSIBLE_NAMES > X/Y point assembly (:608,743-845)
    geom_cols = [c for c in cols if types[c] == "WKT"]
    if not geom_cols:
        geom_cols = [c for c in cols
                     if c.lower() == "wkt" or c.lower().startswith("_wkt")]
    if not geom_cols:
        geom_cols = [c for c in cols if _matches(c, geom_possible_names)]
    xcol = ycol = zcol = None
    if not geom_cols:
        for c in cols:
            if xcol is None and _matches(c, x_possible_names):
                xcol = c
            elif ycol is None and _matches(c, y_possible_names):
                ycol = c
            elif zcol is None and _matches(c, z_possible_names):
                zcol = c

    out_cols = []
    for c in cols:
        if c in geom_cols and not keep_geom_columns:
            continue
        if c in (xcol, ycol, zcol) and c is not None:
            # X/Y columns become Real fields (:830,838 SetType(OFTReal))
            out_cols.append(F.col(c).cast("double").alias(c))
        else:
            out_cols.append(_cast_col(c, types[c]))

    # geom_wkt is computed from the RAW frame in the same select, so it
    # stays valid when the source geometry column itself is dropped
    if geom_cols:
        out_cols.append(F.col(geom_cols[0]).cast("string").alias("geom_wkt"))
    elif xcol and ycol:
        x, y = F.col(xcol).cast("double"), F.col(ycol).cast("double")
        pt = F.concat(F.lit("POINT ("), x.cast("string"),
                      F.lit(" "), y.cast("string"),
                      *([F.lit(" "), F.col(zcol).cast("double").cast("string")]
                        if zcol else []),
                      F.lit(")"))
        out_cols.append(
            F.when(x.isNotNull() & y.isNotNull(), pt).alias("geom_wkt"))
    df = raw.select(*out_cols)
    if with_fid:
        # 1-based sequential FID in file order (ogr_csv.h nNextFID = 1)
        df = with_global_index(df, "fid").withColumn(
            "fid", F.col("fid") + F.lit(1))
        front = ["fid"] + (["geom_wkt"] if "geom_wkt" in df.columns else [])
        df = df.select(*front, *[c for c in df.columns if c not in front])
    return df


def csvt_for_schema(df: DataFrame) -> str:
    """Emit the .csvt sidecar line for a layer frame (writer side of
    the CREATE_CSVT layer-creation option)."""
    import pyspark.sql.types as T
    out = []
    for f in df.schema.fields:
        if f.name in ("fid", "geom_wkt"):
            continue
        dt = f.dataType
        if isinstance(dt, T.IntegerType):
            out.append("Integer")
        elif isinstance(dt, T.LongType):
            out.append("Integer64")
        elif isinstance(dt, (T.DoubleType, T.FloatType)):
            out.append("Real")
        elif isinstance(dt, T.BooleanType):
            out.append("Integer(Boolean)")
        elif isinstance(dt, T.DateType):
            out.append("Date")
        elif isinstance(dt, T.TimestampType):
            out.append("DateTime")
        else:
            out.append("String")
    return ",".join(out)


def write_csv_layer(df: DataFrame, path: str, *,
                    geometry: str | None = "AS_WKT",
                    single_file: bool = False,
                    create_csvt: bool = False) -> None:
    """CSV sink. geometry='AS_WKT' renames geom_wkt to a WKT column
    (the GEOMETRY=AS_WKT layer creation option); None drops it.
    Directory mode (default) is Spark's parallel writer; single_file
    streams partitions through one handle (GDAL-parity byte layout,
    same single-writer contract as write_shapefile)."""
    out = df
    if "fid" in out.columns:
        out = out.drop("fid")
    if "geom_wkt" in out.columns:
        if geometry == "AS_WKT":
            # a kept source geometry column named WKT would collide with
            # the renamed geom_wkt (they carry the same values) — drop it
            dup = [c for c in out.columns
                   if c.lower() == "wkt" and c != "geom_wkt"]
            if dup:
                out = out.drop(*dup)
            out = out.withColumnRenamed("geom_wkt", "WKT")
            out = out.select("WKT", *[c for c in out.columns if c != "WKT"])
        else:
            out = out.drop("geom_wkt")
    if create_csvt:
        base = path[:-4] if path.endswith(".csv") else path
        os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
        with open(base + ".csvt", "w") as f:
            f.write(csvt_for_schema(df) + "\n")
    if single_file:
        cols = out.columns
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(cols)
            for row in out.toLocalIterator():
                w.writerow(["" if v is None else v for v in row])
    else:
        out.write.mode("overwrite").option("header", True).csv(path)
