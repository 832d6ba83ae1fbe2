"""OGR feature styles — the style-string mini-language of
ogr/ogr_featurestyle.h / ogrfeaturestyle.cpp (OGRStyleMgr /
OGRStyleTool): a feature's OGR_STYLE is a ';'-separated list of tool
calls `PEN(...)`, `BRUSH(...)`, `SYMBOL(...)`, `LABEL(...)`, each with
`key:value` params (values optionally double-quoted, with unit
suffixes like `2px` / `12pt` on size params).

Two surfaces, matching the engine's split everywhere else:

  style_param(col, tool, key)   pure regexp column math (JVM codegen)
                                for the overwhelmingly common case —
                                unquoted values, first tool instance.
  parse_style / ogr_style_parse full-fidelity parser (quoted values,
                                escaped quotes, repeated tools) as a
                                row-local kernel -> JSON, Arrow-batched.

The textual SQL dialect resolves the OGR_STYLE special field from a
layer's `_style` column when one exists (drivers that carry styles),
else NULL (a datasource without styles) — ogr_sql_exec.py.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

STYLE_TOOLS = ("PEN", "BRUSH", "SYMBOL", "LABEL")


def style_param(col, tool: str, key: str) -> Column:
    """Extract one unquoted `key:value` from the first `tool(...)`
    instance of a style string — whole-stage-codegen regexp, no UDF.
    Returns '' when the tool or key is absent (OGR's GetParam NULL)."""
    tool = tool.upper()
    if tool not in STYLE_TOOLS:
        raise ValueError(f"unknown style tool {tool!r}")
    body = F.regexp_extract(col, tool + r"\(([^)]*)\)", 1)
    return F.regexp_extract(body, r"(?:^|,)" + re.escape(key) + r":([^,]*)", 1)


def style_param_sql(expr: str, tool: str, key: str) -> str:
    """The identical extraction as ANSI SQL (DuckDB regexp_extract has
    the same (string, pattern, group) signature)."""
    tool = tool.upper()
    body = f"regexp_extract({expr}, '{tool}\\(([^)]*)\\)', 1)"
    return f"regexp_extract({body}, '(?:^|,){key}:([^,]*)', 1)"


_NUM_UNIT = re.compile(r"^([+-]?\d+(?:\.\d+)?)(px|pt|mm|cm|in|g)?$")


def style_size(value: str) -> tuple[float, str] | None:
    """Split a size param into (number, unit) — OGRStyleTool::
    GetParamDbl's unit handling ('g' = ground units)."""
    m = _NUM_UNIT.match(value.strip())
    if not m:
        return None
    return float(m.group(1)), m.group(2) or "px"


def parse_style(s: str | None) -> list[dict]:
    """Full parse -> [{"tool": ..., "params": {...}}, ...]. Handles
    double-quoted values with embedded commas/semicolons and escaped
    quotes, and repeated tool instances (OGRStyleMgr iterates parts
    the same way)."""
    if not s:
        return []
    out = []
    i, n = 0, len(s)
    while i < n:
        m = re.match(r"\s*([A-Za-z]+)\s*\(", s[i:])
        if not m:
            break
        tool = m.group(1).upper()
        j = i + m.end()
        depth, in_q = 1, False
        body_start = j
        while j < n and depth:
            ch = s[j]
            if in_q:
                if ch == "\\" and j + 1 < n:
                    j += 1
                elif ch == '"':
                    in_q = False
            elif ch == '"':
                in_q = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            j += 1
        body = s[body_start : j - 1]
        params: dict[str, str] = {}
        k = 0
        while k < len(body):
            m2 = re.match(r"\s*([A-Za-z]+)\s*:", body[k:])
            if not m2:
                break
            key = m2.group(1)
            k += m2.end()
            if k < len(body) and body[k] == '"':
                k += 1
                val = []
                while k < len(body):
                    if body[k] == "\\" and k + 1 < len(body):
                        val.append(body[k + 1])
                        k += 2
                        continue
                    if body[k] == '"':
                        k += 1
                        break
                    val.append(body[k])
                    k += 1
                params[key] = "".join(val)
                if k < len(body) and body[k] == ",":
                    k += 1
            else:
                end = body.find(",", k)
                if end == -1:
                    end = len(body)
                params[key] = body[k:end].strip()
                k = end + 1
        out.append({"tool": tool, "params": params})
        i = j
        while i < n and s[i] in "; \t":
            i += 1
    return out


@F.pandas_udf(T.StringType())
def ogr_style_parse(col: pd.Series) -> pd.Series:
    """Style string -> canonical JSON (sorted param keys) — the
    full-fidelity surface for quoted/repeated-tool styles."""
    return pd.Series(
        [
            json.dumps(
                [
                    {"tool": t["tool"],
                     "params": dict(sorted(t["params"].items()))}
                    for t in parse_style(v)
                ],
                separators=(",", ":"),
            )
            if v is not None else None
            for v in col
        ]
    )
