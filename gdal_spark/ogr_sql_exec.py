"""Textual OGR SQL entry point: parse the OGR SQL dialect and execute
it as DataFrame operations WITH the dialect's deliberate semantics
applied automatically — the role of swq_parser.y + ogr_gensql.cpp for
a user who hands the engine a SQL string instead of DataFrame calls.

Grammar subset (ogr_sql_dialect.rst; swq_parser.y productions):

    SELECT [DISTINCT] select_list
    FROM layer
    [LEFT JOIN layer2 ON layer.f = layer2.g]...
    [WHERE predicate]
    [ORDER BY f [ASC|DESC], ...]
    [LIMIT n] [OFFSET m]

Dialect semantics applied (not plain Spark SQL):
  - string '=' is case-INsensitive (swq_op_general.cpp:739-810);
    <, <=, >, >=, <> stay case-sensitive
  - LEFT JOIN emits exactly ONE row per primary row — the first
    matching secondary row in FID order (ogr_gensql.cpp:1292-1323);
    the secondary's first column is used as the FID order surrogate
  - SELECT DISTINCT on one string column is case-insensitive keeping
    the first spelling (swq.cpp:342-386)
  - LIKE is case-sensitive, ILIKE insensitive (GDAL >= 3.1)
  - SUBSTR(s, start[, len]) is 1-based with negative start
  - functions: CONCAT, SUBSTR, UPPER, LOWER, LENGTH, CAST(x AS t),
    COUNT(*/col/DISTINCT col), MIN, MAX, AVG, SUM

Also supported: summary selects (aggregates without GROUP BY — OGR SQL
itself has no GROUP BY, generic/ogr_gensql.cpp:822),
`select UNION ALL select` (swq_parser.y:652-667), the DDL fast paths
(CREATE/DROP INDEX, DROP TABLE, ALTER TABLE — string-matched before
parsing, gdaldataset.cpp:6192-6255), the special fields FID /
OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA / OGR_STYLE
(ogr_sql_dialect.rst), and ExecuteSQL's spatial-filter argument
(rect-over-points runs as pure codegen column compares).

Out of scope for THIS dialect (GROUP BY, subqueries, window
functions): use `execute_sqlite_sql` below — the SQLite-dialect entry
point (gdaldataset.cpp:6176-6187) whose secondary engine here is
Spark SQL itself, with layers as temp views and the ST_* function
suite registered.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ogrsql as Q

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d+|\.\d+|\d+)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)?)"
    r"|(?P<op><>|<=|>=|=|<|>|\(|\)|,|\*|\+|-|/|%|\|\|))"
)

_KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "LEFT", "JOIN", "ON", "WHERE", "ORDER",
    "BY", "ASC", "DESC", "LIMIT", "OFFSET", "AND", "OR", "NOT", "IN",
    "BETWEEN", "LIKE", "ILIKE", "ESCAPE", "IS", "NULL", "AS", "CAST", "COUNT",
    "MIN", "MAX", "AVG", "SUM", "UNION", "ALL",
}

_AGGS = {"COUNT", "MIN", "MAX", "AVG", "SUM"}


def _tokenize(sql: str):
    out = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"OGR SQL: cannot tokenize at: {sql[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("id") is not None:
            t = m.group("id")
            out.append(
                ("kw", t.upper()) if t.upper() in _KEYWORDS else ("id", t)
            )
        else:
            out.append(("op", m.group("op")))
    out.append(("end", ""))
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, val=None):
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            self.i += 1
            return v
        return None

    def expect(self, kind, val=None):
        got = self.accept(kind, val)
        if got is None:
            raise ValueError(
                f"OGR SQL: expected {val or kind}, got {self.peek()!r}"
            )
        return got


def _col(name: str):
    return F.col(name.split(".")[-1]) if "." in name else F.col(name)


def _parse_primary(p: _P):
    k, v = p.peek()
    if p.accept("op", "("):
        e = _parse_expr(p)
        p.expect("op", ")")
        return e
    if p.accept("op", "-"):
        return -_parse_primary(p)
    if k == "num":
        p.next()
        return F.lit(float(v) if "." in v else int(v))
    if k == "str":
        p.next()
        return F.lit(v)
    if k == "kw" and v == "CAST":
        p.next()
        p.expect("op", "(")
        e = _parse_expr(p)
        p.expect("kw", "AS")
        ty = p.expect("id").lower()
        p.expect("op", ")")
        if ty == "geometry":
            # CAST(x AS geometry) (ogr_sql_dialect.rst:199-234): parse
            # the WKT and emit the engine's normalized geometry text
            from .functions import geometry as SG

            return SG.st_normalize(e.cast("string"))
        ty = {"integer": "long", "numeric": "double", "character": "string",
              "float": "double"}.get(ty, ty)
        return e.cast(ty)
    if k == "kw" and v in _AGGS:
        p.next()
        p.expect("op", "(")
        if v == "COUNT":
            if p.accept("op", "*"):
                p.expect("op", ")")
                return F.count(F.lit(1))
            if p.accept("kw", "DISTINCT"):
                e = _parse_expr(p)
                p.expect("op", ")")
                return F.count_distinct(e)
        e = _parse_expr(p)
        p.expect("op", ")")
        return {"COUNT": F.count, "MIN": F.min, "MAX": F.max,
                "AVG": F.avg, "SUM": F.sum}[v](e)
    if k == "id":
        p.next()
        if p.accept("op", "("):  # function call
            fname = v.upper()
            args = []
            if not p.accept("op", ")"):
                args.append(_parse_expr(p))
                while p.accept("op", ","):
                    args.append(_parse_expr(p))
                p.expect("op", ")")
            if fname == "CONCAT":
                return F.concat(*[a.cast("string") for a in args])
            if fname == "SUBSTR":
                # OGR SUBSTR: 1-based, negative start from the end —
                # Spark's substring has the same convention
                ln = args[2] if len(args) > 2 else F.lit(2147483647)
                return F.substring(args[0], args[1], ln)
            if fname == "UPPER":
                return F.upper(args[0])
            if fname == "LOWER":
                return F.lower(args[0])
            if fname == "LENGTH":
                return F.length(args[0])
            if fname == "HSTORE_GET_VALUE":
                # the key must be a string literal (the reference
                # evaluates it per row, but a literal is the only
                # form its docs show — ogr_sql_dialect.rst:170-175)
                k, v2 = p.toks[p.i - 2]
                if k != "str" or len(args) != 2:
                    raise ValueError(
                        "hstore_get_value needs a literal string key")
                return Q.hstore_get_value(args[0], v2)
            raise ValueError(f"OGR SQL: unknown function {fname}")
        return _col(v)
    raise ValueError(f"OGR SQL: unexpected token {p.peek()!r}")


def _parse_mul(p: _P):
    e = _parse_primary(p)
    while True:
        if p.accept("op", "*"):
            e = e * _parse_primary(p)
        elif p.accept("op", "/"):
            e = e / _parse_primary(p)
        elif p.accept("op", "%"):
            # SWQ '%' is fmod (swq_op_general.cpp:552-621); Spark's %
            # keeps the dividend's sign the same way
            e = e % _parse_primary(p)
        else:
            return e


def _parse_add(p: _P):
    e = _parse_mul(p)
    while True:
        if p.accept("op", "+"):
            e = e + _parse_mul(p)
        elif p.accept("op", "-"):
            e = e - _parse_mul(p)
        elif p.accept("op", "||"):
            e = F.concat(e.cast("string"), _parse_mul(p).cast("string"))
        else:
            return e


_parse_expr = _parse_add


def _is_string_literal(p: _P):
    return p.peek()[0] == "str"


def _parse_comparison(p: _P):
    e = _parse_expr(p)
    if p.accept("kw", "IS"):
        neg = p.accept("kw", "NOT") is not None
        p.expect("kw", "NULL")
        return e.isNotNull() if neg else e.isNull()
    neg = p.accept("kw", "NOT") is not None
    if p.accept("kw", "IN"):
        p.expect("op", "(")
        items = [_signed_lit(p)]
        while p.accept("op", ","):
            items.append(_signed_lit(p))
        p.expect("op", ")")
        c = e.isin(items)
        return ~c if neg else c
    if p.accept("kw", "BETWEEN"):
        lo = _parse_expr(p)
        p.expect("kw", "AND")
        hi = _parse_expr(p)
        c = (e >= lo) & (e <= hi)
        return ~c if neg else c
    if p.accept("kw", "LIKE"):
        pat = p.expect("str")
        esc = None
        if p.accept("kw", "ESCAPE"):
            esc = p.expect("str")
            if len(esc) != 1:
                raise ValueError("OGR SQL: ESCAPE needs a single char")
        c = Q.ogr_like(e, pat, esc)
        return ~c if neg else c
    if p.accept("kw", "ILIKE"):
        pat = p.expect("str")
        c = Q.ogr_ilike(e, pat)
        return ~c if neg else c
    if neg:
        raise ValueError("OGR SQL: dangling NOT")
    op = p.expect("op")
    # OGR semantics: '=' against a STRING literal is case-insensitive
    if op == "=" and _is_string_literal(p):
        rhs = F.lit(p.next()[1])
        return Q.ci_eq(e, rhs)
    rhs = _parse_expr(p)
    return {
        "=": e == rhs, "<>": e != rhs, "<": e < rhs, ">": e > rhs,
        "<=": e <= rhs, ">=": e >= rhs,
    }[op]


def _lit_value(v):
    try:
        return int(v)
    except (TypeError, ValueError):
        try:
            return float(v)
        except (TypeError, ValueError):
            return v


def _signed_lit(p: _P):
    """One IN-list item: an optional unary '-' followed by a num/str
    literal (the tokenizer emits '-' as its own op token)."""
    if p.accept("op", "-"):
        v = _lit_value(p.next()[1])
        if not isinstance(v, (int, float)):
            raise ValueError("OGR SQL: '-' before non-numeric IN item")
        return -v
    return _lit_value(p.next()[1])


def _parse_not(p: _P):
    if p.accept("kw", "NOT"):
        return ~_parse_not(p)
    if p.accept("op", "("):
        # could be a parenthesized predicate OR expression; try predicate
        save = p.i
        try:
            c = _parse_or(p)
            p.expect("op", ")")
            return c
        except Exception:
            p.i = save - 1
            return _parse_comparison(p)
    return _parse_comparison(p)


def _parse_and(p: _P):
    c = _parse_not(p)
    while p.accept("kw", "AND"):
        c = c & _parse_not(p)
    return c


def _parse_or(p: _P):
    c = _parse_and(p)
    while p.accept("kw", "OR"):
        c = c | _parse_and(p)
    return c


# Special fields (ogr_sql_dialect.rst "special fields"; swq resolves
# them ahead of layer columns). Resolved lazily onto the base frame
# only when the statement references them.
_SPECIAL_FIELDS = {"FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA",
                   "OGR_STYLE"}

# DDL statements are string-matched BEFORE the SELECT parser runs —
# the reference does exactly this (gdaldataset.cpp:6192-6255 dispatches
# CREATE INDEX :5418 / DROP INDEX :5506 / DROP TABLE :5608 /
# ALTER TABLE :5729-6004 on the raw statement text).
_DDL_RE = re.compile(
    r"^\s*(CREATE\s+INDEX|DROP\s+INDEX|DROP\s+TABLE|ALTER\s+TABLE)\b",
    re.IGNORECASE,
)

_ALTER_TYPES = {"integer": "long", "bigint": "long", "smallint": "int",
                "numeric": "double", "float": "double", "real": "double",
                "character": "string", "varchar": "string",
                "string": "string", "date": "date",
                "timestamp": "timestamp", "boolean": "boolean"}


def _exec_ddl(sql: str, layers: dict) -> None:
    """The reference's DDL fast paths. Index DDL is metadata-only here:
    GDAL's attribute index accelerates per-key FindFirst lookups
    (generic/ogr_miattrind.cpp:778-800); Spark's hash joins play that
    role implicitly, so CREATE/DROP INDEX maintain a registry (stored
    in the layers dict under '__indexes__') and change no data.
    ALTER TABLE / DROP TABLE mutate the layers dict like the reference
    mutates the datasource."""
    idx = layers.setdefault("__indexes__", set())
    m = re.match(r"\s*CREATE\s+INDEX\s+ON\s+(\w+)\s+USING\s+(\w+)\s*$",
                 sql, re.IGNORECASE)
    if m:
        if m.group(1) not in layers:
            raise ValueError(f"unknown layer {m.group(1)!r}")
        idx.add((m.group(1), m.group(2).lower()))
        return
    m = re.match(r"\s*DROP\s+INDEX\s+ON\s+(\w+)(?:\s+USING\s+(\w+))?\s*$",
                 sql, re.IGNORECASE)
    if m:
        if m.group(2):
            idx.discard((m.group(1), m.group(2).lower()))
        else:
            for k in [k for k in idx if k[0] == m.group(1)]:
                idx.discard(k)
        return
    m = re.match(r"\s*DROP\s+TABLE\s+(\w+)\s*$", sql, re.IGNORECASE)
    if m:
        if m.group(1) not in layers:
            raise ValueError(f"unknown layer {m.group(1)!r}")
        del layers[m.group(1)]
        return
    m = re.match(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+(?:COLUMN\s+)?(\w+)\s+TO\s+(\w+)\s*$",
        sql, re.IGNORECASE)
    if m:
        layers[m.group(1)] = layers[m.group(1)].withColumnRenamed(
            m.group(2), m.group(3))
        return
    m = re.match(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+(\w+)\s*(?:\(\s*\d+\s*\))?\s*$",
        sql, re.IGNORECASE)
    if m:
        ty = _ALTER_TYPES.get(m.group(3).lower(), m.group(3).lower())
        layers[m.group(1)] = layers[m.group(1)].withColumn(
            m.group(2), F.lit(None).cast(ty))
        return
    m = re.match(r"\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*$",
                 sql, re.IGNORECASE)
    if m:
        layers[m.group(1)] = layers[m.group(1)].drop(m.group(2))
        return
    raise ValueError(f"unsupported DDL: {sql.strip()[:60]}")


def _attach_special_fields(df: DataFrame, needed: set, geom_col: str):
    """Materialize referenced special fields as columns so WHERE /
    ORDER BY / SELECT see them uniformly.

    FID is the feature's 0-based sequence number in the layer's
    first-column order (our layers are frames without an engine FID;
    a deterministic total order is required for the dialect's FID to
    mean anything). The rank is computed with a parallel range-sort +
    partition-offset zip-with-index (zipindex.with_global_index) — no
    single-reducer global window, so `WHERE FID < 10` over a 10^9-row
    layer never total-sorts through one partition."""
    from .zipindex import with_global_index

    # a layer field with the same name wins over the special field —
    # the declared schema is authoritative for our frame-backed layers
    needed = {
        n for n in needed
        if n not in {c.upper() for c in df.columns}
    }
    out = df
    if "FID" in needed:
        out = with_global_index(df, "FID", order_by=[df.columns[0]])
    geom_needed = needed - {"FID", "OGR_STYLE"}
    if geom_needed and geom_col not in df.columns:
        raise ValueError(
            f"special field(s) {sorted(geom_needed)} need geometry column "
            f"{geom_col!r}")
    if "OGR_GEOMETRY" in needed:
        # the geometry type name, e.g. 'POLYGON' (ogr_sql_dialect.rst)
        out = out.withColumn(
            "OGR_GEOMETRY",
            F.upper(F.regexp_extract(F.col(geom_col), r"^\s*([A-Za-z]+)", 1)),
        )
    if "OGR_GEOM_WKT" in needed:
        out = out.withColumn("OGR_GEOM_WKT", F.col(geom_col))
    if "OGR_GEOM_AREA" in needed:
        from .functions import geometry as SG

        out = out.withColumn("OGR_GEOM_AREA", SG.st_area(geom_col))
    if "OGR_STYLE" in needed:
        # layers carrying a `_style` column expose it as OGR_STYLE
        # (the reference's style-string feature field,
        # ogr/ogr_featurestyle.h); without one the special field is
        # NULL, like a datasource without styles
        if "_style" in df.columns:
            out = out.withColumn("OGR_STYLE", F.col("_style"))
        else:
            out = out.withColumn("OGR_STYLE", F.lit(None).cast("string"))
    return out


def _rect_of(g) -> tuple | None:
    """(x0, y0, x1, y1) when g is an axis-aligned rectangle ring —
    the reference detects this to run a bbox-only filter
    (generic/ogrlayer.cpp:1307-1343)."""
    if g.kind != "polygon" or len(g.parts[0]) != 1:
        return None
    xs, ys = g.parts[0][0]
    if len(xs) != 4:
        return None
    x0, x1 = float(min(xs)), float(max(xs))
    y0, y1 = float(min(ys)), float(max(ys))
    ok = all((x in (x0, x1)) for x in xs) and all((y in (y0, y1)) for y in ys)
    return (x0, y0, x1, y1) if ok else None


def _envelope_cols(geom_col: str):
    """(xmin, ymin, xmax, ymax) Columns of a WKT geometry, computed
    entirely JVM-side: pull every coordinate token, split even/odd."""
    pairs = (
        f"transform(regexp_extract_all({geom_col}, "
        f"'-?[0-9]+\\\\.?[0-9]*(?:[eE][+-]?[0-9]+)?', 0), "
        f"v -> cast(v as double))"
    )
    idx = f"transform({pairs}, (v, i) -> struct(v as v, i as i))"
    xs = f"transform(filter({idx}, s -> s.i % 2 = 0), s -> s.v)"
    ys = f"transform(filter({idx}, s -> s.i % 2 = 1), s -> s.v)"
    return (F.expr(f"array_min({xs})"), F.expr(f"array_min({ys})"),
            F.expr(f"array_max({xs})"), F.expr(f"array_max({ys})"))


def _apply_spatial_filter(df: DataFrame, filter_wkt: str, geom_col: str):
    """ExecuteSQL's poSpatialFilter argument (gdaldataset.cpp:6170;
    filter semantics generic/ogrlayer.cpp:1357 FilterGeometry).

    Rectangle filters run as a pure-Catalyst envelope-overlap test —
    no Python in the plan. That matches the reference's rect fast path
    (envelope detect generic/ogrlayer.cpp:1307-1343; bbox reject
    :1377-1382), and the OGR spatial-filter contract explicitly allows
    envelope-level evaluation ("the filtering ... may be approximate",
    SetSpatialFilter docs); for POINT geometries it is exact.
    Non-rectangular filters keep the bbox prefilter and add the exact
    prepared-geometry intersects in an Arrow UDF — the reference's own
    3-stage structure."""
    from . import geometry as GM

    g = GM.parse_wkt(filter_wkt)
    fxs, fys = g.all_points()
    fx0, fy0 = float(fxs.min()), float(fys.min())
    fx1, fy1 = float(fxs.max()), float(fys.max())
    xmin, ymin, xmax, ymax = _envelope_cols(geom_col)
    bbox = (xmin <= fx1) & (xmax >= fx0) & (ymin <= fy1) & (ymax >= fy0)
    if _rect_of(g) is not None:
        return df.filter(bbox)
    from .functions import geometry as SG

    return df.filter(
        bbox & SG.st_intersects(F.col(geom_col), F.lit(filter_wkt))
    )


def execute_ogr_sql(spark: SparkSession, sql: str,
                    layers: dict[str, DataFrame],
                    spatial_filter: str | None = None,
                    geom_col: str = "geom") -> DataFrame | None:
    """Run an OGR SQL dialect string over named layers — the analog of
    GDALDataset::ExecuteSQL (gdaldataset.cpp:6170). Supports
    `select UNION ALL select ...` (swq_parser.y:652-667), combining
    by column name like OGRUnionLayer; DDL fast paths (CREATE/DROP
    INDEX, DROP TABLE, ALTER TABLE — return None, like the
    reference's nullptr result layer); special fields FID /
    OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA / OGR_STYLE; and an
    optional spatial_filter WKT applied to the base layer before the
    WHERE clause (InstallFilter semantics)."""
    if _DDL_RE.match(sql):
        _exec_ddl(sql, layers)
        return None
    p = _P(_tokenize(sql))
    df = _exec_select(p, spark, layers, spatial_filter, geom_col)
    while p.accept("kw", "UNION"):
        p.expect("kw", "ALL")
        df = df.unionByName(_exec_select(p, spark, layers,
                                         spatial_filter, geom_col))
    p.expect("end")
    return df


def execute_sqlite_sql(spark: SparkSession, sql: str,
                       layers: dict[str, DataFrame]) -> DataFrame:
    """The SQLite-dialect entry point (gdaldataset.cpp:6176-6187 hands
    the whole statement to SQLite with layers exposed as virtual
    tables — ogr/ogrsf_frmts/sqlite/ogrsqliteexecutesql.cpp; pushdown
    hooks ogrsqlitevirtualogr.cpp:756 BestIndex, :995 Filter). Here
    the full secondary engine is Spark SQL itself: layers register as
    temp views (Catalyst does the predicate/column pushdown those
    hooks exist for), and the ST_* / ogr_deflate suite is registered
    so SQLite-dialect statements — joins, GROUP BY, window functions,
    geometry SQL — run unchanged."""
    from .functions.sqlfuncs import register_sql_functions

    register_sql_functions(spark)
    for name, df in layers.items():
        if name != "__indexes__":
            df.createOrReplaceTempView(name)
    return spark.sql(sql)


def _exec_select(p: _P, spark: SparkSession,
                 layers: dict[str, DataFrame],
                 spatial_filter: str | None = None,
                 geom_col: str = "geom") -> DataFrame:
    p.expect("kw", "SELECT")
    distinct = p.accept("kw", "DISTINCT") is not None

    select_items: list[tuple] = []  # (expr|"*", alias|None, src_text)
    while True:
        if p.accept("op", "*"):
            select_items.append(("*", None))
        else:
            start_i = p.i
            e = _parse_expr(p)
            alias = None
            if p.accept("kw", "AS"):
                alias = p.expect("id")
            elif p.peek()[0] == "id" and p.toks[p.i + 1][1] in (",", "FROM"):
                alias = p.expect("id")
            if alias is None:
                # single bare column keeps its name
                k, v = p.toks[start_i]
                alias = v.split(".")[-1] if k == "id" and p.i == start_i + 1 else f"col{len(select_items)}"
            select_items.append((e, alias))
        if not p.accept("op", ","):
            break

    p.expect("kw", "FROM")
    base_name = p.expect("id")
    if base_name not in layers:
        raise ValueError(f"unknown layer {base_name!r}")
    df = layers[base_name]

    while p.accept("kw", "LEFT"):
        p.expect("kw", "JOIN")
        jname = p.expect("id")
        p.expect("kw", "ON")
        lf = p.expect("id").split(".")[-1]
        p.expect("op", "=")
        rf = p.expect("id").split(".")[-1]
        right = layers[jname]
        # OGR first-match join: ties resolve by secondary FID
        # (generic/ogr_gensql.cpp keeps the first secondary feature in
        # FID order). Our layers are FID-ordered frames without an
        # explicit FID column, so the surrogate is the first NON-KEY
        # column of the secondary (the key itself can't order rows
        # within a key group — every candidate shares its value).
        if lf in right.columns and rf in df.columns:
            lf, rf = rf, lf
        right = right.withColumnRenamed(rf, lf) if rf != lf else right
        ordcol = next((c for c in right.columns if c != lf), right.columns[0])
        df = Q.first_match_left_join(df, right, lf, right_order=ordcol)

    specials = {
        v.upper() for k, v in p.toks
        if k == "id" and v.upper() in _SPECIAL_FIELDS
    } - {c.upper() for c in df.columns}
    if specials:
        df = _attach_special_fields(df, specials, geom_col)
    if spatial_filter is not None:
        df = _apply_spatial_filter(df, spatial_filter, geom_col)

    if p.accept("kw", "WHERE"):
        df = df.filter(_parse_or(p))

    order = []
    if p.accept("kw", "ORDER"):
        p.expect("kw", "BY")
        while True:
            c = F.col(p.expect("id").split(".")[-1])
            if p.accept("kw", "DESC"):
                c = c.desc()
            else:
                p.accept("kw", "ASC")
                c = c.asc()
            order.append(c)
            if not p.accept("op", ","):
                break

    limit = offset = None
    if p.accept("kw", "LIMIT"):
        limit = int(p.expect("num"))
    if p.accept("kw", "OFFSET"):
        offset = int(p.expect("num"))

    star_only = len(select_items) == 1 and isinstance(
        select_items[0][0], str
    ) and select_items[0][0] == "*"
    if not star_only:
        cols = []
        for e, alias in select_items:
            if isinstance(e, str) and e == "*":
                cols.append(F.col("*"))
            else:
                cols.append(e.alias(alias))
        if distinct and len(select_items) == 1 and order == []:
            # OGR's DISTINCT_LIST returns values in FIRST-ENCOUNTER
            # (FID scan) order (ogr/swq.cpp:342-351) and is
            # case-insensitive for strings. When the layer carries a
            # fid column, reproduce that order exactly: group on the
            # value, order by min(fid) — the sort runs over DISTINCT
            # values only (bounded), never the full layer.
            name = select_items[0][1]
            if "fid" in df.columns:
                out = df.select(cols[0], F.col("fid"))
                if dict(out.dtypes)[name] == "string":
                    g = out.groupBy(F.lower(F.col(name)).alias("_k")).agg(
                        F.min_by(F.col(name), F.col("fid")).alias(name),
                        F.min("fid").alias("_ord"),
                    )
                else:
                    g = out.groupBy(name).agg(F.min("fid").alias("_ord"))
                df = g.orderBy("_ord").select(name)
            else:
                out = df.select(*cols)
                if dict(out.dtypes)[name] == "string":
                    df = Q.distinct_ci(out, name)
                else:
                    df = out.distinct()
        else:
            df = df.select(*cols)
            if distinct:
                df = df.distinct()
    elif distinct:
        df = df.distinct()
    if order:
        df = df.orderBy(*order)
    if offset is not None:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    if star_only and specials:
        # `SELECT *` never expands special fields (ogr_sql_dialect.rst)
        df = df.drop(*[c for c in df.columns if c.upper() in specials])
    return df
