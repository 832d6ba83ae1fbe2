"""PGDump vector sink: PostgreSQL/PostGIS SQL dump generation.

Reference: gdal/ogr/ogrsf_frmts/pgdump/ —
  - ogrpgdumpdatasource.cpp: write-only datasource emitting a SQL
    script (CREATE TABLE / COPY ... FROM STDIN / epilogue);
  - ogrpgdumplayer.cpp: COPY text rules — fields tab-separated, NULL
    as \\N, backslash/tab/newline/CR escaped
    (OGRPGDumpEscapeStringList), geometry as hex EWKB with the SRID
    flag (OGRGeometryToHexEWKB, GeometryToHex), spatial GiST index in
    the layer epilogue.

Spark lowering: the CPU cost of a dump is per-row formatting (escape +
hex EWKB) — a pure map. Each partition formats its rows into valid
COPY body lines; the sink has two modes like the CSV driver:

  - directory mode (scale path): `spark.write.text` emits the body as
    parallel part files; the driver writes `00_prologue.sql` (DDL +
    COPY head) and `zz_epilogue.sql` (`\\.` + indexes). Lexicographic
    concatenation of the directory IS the dump — `cat dir/* | psql`.
    Nothing bottlenecks at 100 TB; each part is independently valid
    COPY body.
  - single-file mode: the body streams through the driver one
    partition at a time (toLocalIterator) — the documented small-side
    export, same contract as write_shapefile.

`read_pgdump` parses a dump back (prologue DDL for the schema, body
distributed via spark.read.text) — the verification path proving the
writer loses nothing.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PG_TYPES = {
    T.LongType(): "bigint", T.IntegerType(): "integer",
    T.ShortType(): "smallint", T.DoubleType(): "double precision",
    T.FloatType(): "real", T.StringType(): "varchar",
    T.BooleanType(): "boolean", T.DateType(): "date",
    T.TimestampType(): "timestamp", T.BinaryType(): "bytea",
}
_FROM_PG = {"bigint": T.LongType(), "integer": T.IntegerType(),
            "smallint": T.ShortType(),
            "double precision": T.DoubleType(), "real": T.FloatType(),
            "varchar": T.StringType(), "boolean": T.BooleanType(),
            "date": T.DateType(), "timestamp": T.TimestampType(),
            "bytea": T.BinaryType(), "geometry": T.StringType()}


def _copy_escape(c: Column) -> Column:
    """COPY text escaping (ogrpgdumplayer.cpp
    OGRPGDumpEscapeStringList): backslash first, then the three
    control characters. Pure JVM regexp_replace chain."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\t", r"\\t")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    return c


def wkt_to_hexewkb(wkt_col: str | Column, srid: int = 4326) -> Column:
    """WKT -> hex EWKB with embedded SRID (ogrpgdumplayer.cpp
    OGRGeometryToHexEWKB: the top-level type word gains the
    0x20000000 SRID flag and the SRID follows it). Arrow-batched
    pandas UDF over the engine's own WKB codec."""
    from . import geometry as GG

    @F.pandas_udf(T.StringType())
    def conv(s: pd.Series) -> pd.Series:
        out = []
        for w in s:
            if w is None:
                out.append(None)
                continue
            wkb = GG.to_wkb(GG.parse_wkt(w))
            typ = struct.unpack_from("<I", wkb, 1)[0] | 0x20000000
            ewkb = wkb[:1] + struct.pack("<II", typ, srid) + wkb[5:]
            out.append(ewkb.hex().upper())
        return pd.Series(out, dtype=object)

    return conv(F.col(wkt_col) if isinstance(wkt_col, str) else wkt_col)


def hexewkb_to_wkt(hex_col: str | Column) -> Column:
    """Inverse of wkt_to_hexewkb (strip the SRID word, decode WKB)."""
    from . import geometry as GG

    @F.pandas_udf(T.StringType())
    def conv(s: pd.Series) -> pd.Series:
        out = []
        for h in s:
            if h is None:
                out.append(None)
                continue
            raw = bytes.fromhex(h)
            typ = struct.unpack_from("<I", raw, 1)[0]
            if typ & 0x20000000:
                raw = raw[:1] + struct.pack("<I", typ & ~0x20000000) \
                    + raw[9:]
            out.append(GG.to_wkt(GG.parse_wkb(raw)))
        return pd.Series(out, dtype=object)

    return conv(F.col(hex_col) if isinstance(hex_col, str) else hex_col)


def _body_lines(df: DataFrame, cols: list[str], geom_col: str | None,
                srid: int) -> DataFrame:
    parts = []
    for name in cols:
        f = df.schema[name]
        if name == geom_col:
            parts.append(F.coalesce(wkt_to_hexewkb(name, srid),
                                    F.lit(r"\N")))
        elif isinstance(f.dataType, T.StringType):
            parts.append(F.coalesce(_copy_escape(F.col(name)),
                                    F.lit(r"\N")))
        elif isinstance(f.dataType, T.BinaryType):
            parts.append(F.coalesce(
                F.concat(F.lit(r"\\x"), F.lower(F.hex(name))),
                F.lit(r"\N")))
        else:
            parts.append(F.coalesce(F.col(name).cast("string"),
                                    F.lit(r"\N")))
    return df.select(F.concat_ws("\t", *parts).alias("value"))


def _ddl(df: DataFrame, table: str, cols: list[str], geom_col: str | None,
         geom_type: str, srid: int) -> tuple[str, str]:
    decls = []
    for name in cols:
        if name == geom_col:
            continue
        pg = _PG_TYPES.get(df.schema[name].dataType)
        if pg is None:
            raise ValueError(
                f"no PGDump type mapping for column {name}: "
                f"{df.schema[name].dataType}")
        decls.append(f'"{name}" {pg}')
    pro = ["SET standard_conforming_strings = OFF;",
           f'DROP TABLE IF EXISTS "{table}" CASCADE;',
           f'CREATE TABLE "{table}" ({", ".join(decls)});']
    if geom_col:
        pro.append(
            f"SELECT AddGeometryColumn('','{table}','{geom_col}',"
            f"{srid},'{geom_type.upper()}',2);")
    collist = ", ".join(f'"{c}"' for c in cols)
    pro.append(f'COPY "{table}" ({collist}) FROM STDIN;')
    epi = ["\\."]
    if geom_col:
        epi.append(f'CREATE INDEX "{table}_{geom_col}_geom_idx" ON '
                   f'"{table}" USING GIST ("{geom_col}");')
    return "\n".join(pro) + "\n", "\n".join(epi) + "\n"


def write_pgdump(df: DataFrame, path: str, table: str, *,
                 geom_col: str | None = None, geom_type: str = "POINT",
                 srid: int = 4326, single_file: bool = False) -> None:
    """PGDump sink. Directory mode (default) is the scale path: body
    part files write in parallel and `00_prologue.sql` + part files +
    `zz_epilogue.sql` concatenate (sorted) into the dump. single_file
    streams partitions through the driver."""
    cols = list(df.columns)
    pro, epi = _ddl(df, table, cols, geom_col, geom_type, srid)
    body = _body_lines(df, cols, geom_col, srid)
    if single_file:
        with open(path, "w") as f:
            f.write(pro)
            for r in body.toLocalIterator():
                f.write(r.value + "\n")
            f.write(epi)
        return
    body.write.mode("overwrite").text(path)
    with open(os.path.join(path, "00_prologue.sql"), "w") as f:
        f.write(pro)
    with open(os.path.join(path, "zz_epilogue.sql"), "w") as f:
        f.write(epi)


def _unescape(c: Column) -> Column:
    # inverse of _copy_escape. Escapes must decode single-pass: in
    # "\\\\t" (a literal backslash then 't') the pair decodes first or
    # the tail would wrongly read as an escaped tab — park "\\\\" in a
    # NUL sentinel (COPY text can never carry NUL), decode the
    # controls, then restore.
    c = F.regexp_replace(c, r"\\\\", "\x00")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, "\x00", r"\\")
    return c


def read_pgdump(spark: SparkSession, path: str) -> DataFrame:
    """Parse a dump produced by write_pgdump back into a DataFrame —
    the writer's verification loop. Driver reads the prologue DDL for
    the schema; the COPY body parses distributed (spark.read.text ->
    split + unescape, all JVM). Geometry columns come back as hex
    EWKB strings (decode with hexewkb_to_wkt)."""
    pro_path = os.path.join(path, "00_prologue.sql") \
        if os.path.isdir(path) else path
    cols: list[tuple[str, str]] = []
    geom_col = None
    with open(pro_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("CREATE TABLE"):
                inner = line[line.index("(") + 1:line.rindex(")")]
                for d in inner.split(","):
                    name, _, typ = d.strip().partition(" ")
                    cols.append((name.strip('"'), typ.strip()))
            elif line.startswith("SELECT AddGeometryColumn"):
                geom_col = line.split(",")[2].strip("'\" ")
                cols.append((geom_col, "geometry"))
            elif line.startswith("COPY "):
                order = [c.strip(' "') for c in
                         line[line.index("(") + 1:line.rindex(")")]
                         .split(",")]
                by = dict(cols)
                cols = [(n, by[n]) for n in order]
                break
    if os.path.isdir(path):
        lines = spark.read.text(
            os.path.join(path, "part-*"))
    else:
        lines = spark.read.text(path).filter(
            ~F.col("value").rlike(r"^(SET |DROP |CREATE |SELECT |COPY |\\\.)"))
    lines = lines.filter(F.length("value") > 0)
    toks = lines.select(F.split("value", "\t").alias("t"))
    out = []
    for i, (name, typ) in enumerate(cols):
        c = F.when(F.col("t")[i] == r"\N", F.lit(None)) \
            .otherwise(F.col("t")[i])
        st = _FROM_PG.get(typ, T.StringType())
        if isinstance(st, T.StringType):
            c = _unescape(c)
        elif isinstance(st, T.BinaryType):
            c = F.unhex(F.regexp_replace(c, r"^\\\\x", ""))
        else:
            c = c.cast(st)
        out.append(c.alias(name))
    return toks.select(*out)
