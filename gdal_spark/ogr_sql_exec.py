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
itself has no GROUP BY, generic/ogr_gensql.cpp:822) and
`select UNION ALL select` (swq_parser.y:652-667).

Out of scope (use spark.sql for the full-SQL passthrough, the analog
of the SQLite dialect): GROUP BY, subqueries.
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
    "BETWEEN", "LIKE", "ILIKE", "IS", "NULL", "AS", "CAST", "COUNT",
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
                raise ValueError("hstore_get_value needs a literal key")
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
        c = Q.ogr_like(e, pat)
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


def execute_ogr_sql(spark: SparkSession, sql: str,
                    layers: dict[str, DataFrame]) -> DataFrame:
    """Run an OGR SQL dialect string over named layers. Supports
    `select UNION ALL select ...` (swq_parser.y:652-667), combining
    by column name like OGRUnionLayer."""
    p = _P(_tokenize(sql))
    df = _exec_select(p, spark, layers)
    while p.accept("kw", "UNION"):
        p.expect("kw", "ALL")
        df = df.unionByName(_exec_select(p, spark, layers))
    p.expect("end")
    return df


def _exec_select(p: _P, spark: SparkSession,
                 layers: dict[str, DataFrame]) -> DataFrame:
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
            # OGR case-insensitive DISTINCT applies to single string cols;
            # fall back to plain distinct for non-strings
            out = df.select(*cols)
            name = select_items[0][1]
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
    return df
